"""TPU-native text-to-video finetuning framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
ExponentialML/Text-To-Video-Finetuning (ModelScope text-to-video finetuning):
the spatio-temporal 3D UNet, VAE, CLIP text encoder, DDPM/DPMSolver schedulers,
two LoRA flavors, the 4-way video dataset pipeline, the two-pass hybrid train
loop, and windowed round-robin long-video inference -- designed TPU-first
(SPMD over a jax.sharding.Mesh, Pallas flash-attention kernels, XLA convs,
functional parameter-overlay LoRA).
"""

__version__ = "0.1.0"
