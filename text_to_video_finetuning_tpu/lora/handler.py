"""LoraHandler: version-dispatch facade over the functional LoRA subsystem.

Behavioral spec: reference utils/lora_handler.py -- inject/load/save dispatch
between the two flavors, per-model LoRA file resolution (`_unet` /
`_text_encoder` filename match, reference utils/lora_handler.py:125-148),
and the webui save path.  Being functional, "injection" here means creating
(or loading) a LoRA pytree + site list; the model itself never changes.
"""

from __future__ import annotations

import os
import uuid
import warnings
from typing import Dict, List, Optional, Sequence, Tuple

import jax

from ..models.clip_text import CLIPTextConfig
from ..models.unet3d import UNet3DConfig
from ..utils.convert_compvis import (convert_text_enc_state_dict_v20,
                                     convert_unet_state_dict)
from . import formats
from .overlay import LORA_VERSIONS, init_lora_params
from .sites import (LoraSite, enumerate_text_encoder_sites,
                    enumerate_unet_sites, select_sites)

FILE_BASENAMES = ["unet", "text_encoder"]
LORA_FILE_TYPES = [".pt", ".safetensors"]

CLONEOFSIMO_SEARCH = ("linear", "conv2d", "conv3d")
STABLE_SEARCH = ("linear", "conv2d", "conv3d", "embedding")


class LoraHandler:
    def __init__(self,
                 version: str = "cloneofsimo",
                 use_unet_lora: bool = False,
                 use_text_lora: bool = False,
                 save_for_webui: bool = False,
                 only_for_webui: bool = False,
                 lora_bias: str = "none",
                 unet_replace_modules: Sequence[str] = (
                     "UNet3DConditionModel",),
                 text_encoder_replace_modules: Sequence[str] = (
                     "CLIPEncoderLayer",)):
        assert version in LORA_VERSIONS, f"unknown LoRA version {version}"
        self.version = version
        self.lora_bias = lora_bias
        self.use_unet_lora = use_unet_lora
        self.use_text_lora = use_text_lora
        self.save_for_webui = save_for_webui
        self.only_for_webui = only_for_webui
        self.unet_replace_modules = list(unet_replace_modules or [])
        self.text_encoder_replace_modules = list(
            text_encoder_replace_modules or [])
        self.use_lora = any([use_text_lora, use_unet_lora])
        if self.use_lora:
            print(f"Using LoRA Version: {self.version}")

    def is_cloneofsimo_lora(self):
        return self.version == "cloneofsimo"

    def is_stable_lora(self):
        return self.version == "stable_lora"

    @property
    def search_classes(self):
        return (CLONEOFSIMO_SEARCH if self.is_cloneofsimo_lora()
                else STABLE_SEARCH)

    # -- site resolution ---------------------------------------------------
    def unet_sites(self, unet_config: UNet3DConfig) -> List[LoraSite]:
        return select_sites(enumerate_unet_sites(unet_config),
                            self.unet_replace_modules, self.search_classes)

    def text_encoder_sites(self, clip_config: CLIPTextConfig
                           ) -> List[LoraSite]:
        return select_sites(enumerate_text_encoder_sites(clip_config),
                            self.text_encoder_replace_modules,
                            self.search_classes)

    # -- file resolution (reference utils/lora_handler.py:125-148) ---------
    @staticmethod
    def get_lora_file_path(lora_path: str, model_kind: str) -> Optional[str]:
        if not lora_path or not os.path.exists(lora_path):
            return None
        if os.path.isfile(lora_path):
            return lora_path if lora_path.endswith(
                tuple(LORA_FILE_TYPES)) else None
        base_name = FILE_BASENAMES[0 if model_kind == "unet" else 1]
        for fn in sorted(os.listdir(lora_path)):
            if fn.endswith(tuple(LORA_FILE_TYPES)) and base_name in fn:
                return os.path.join(lora_path, fn)
        return None

    # -- inject / load -----------------------------------------------------
    def add_lora_to_model(self, use_lora: bool, model_kind: str,
                          model_config, dropout: float = 0.0,
                          lora_path: str = "", r: int = 16,
                          rng: Optional[jax.Array] = None
                          ) -> Tuple[Optional[Dict], List[LoraSite],
                                     List[str]]:
        """Equivalent of reference add_lora_to_model
        (utils/lora_handler.py:239-268): returns (lora_params | None, sites,
        negation child-names)."""
        if not use_lora:
            return None, [], []
        sites = (self.unet_sites(model_config) if model_kind == "unet"
                 else self.text_encoder_sites(model_config))
        lora_file = self.get_lora_file_path(lora_path, model_kind)
        if lora_file is not None:
            lora_params = self.load_lora_file(lora_file, sites)
            print(f"Successfully loaded LoRA from: {lora_file}")
        else:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            lora_params = init_lora_params(rng, sites, r, self.version)
        negation = sorted({s.torch_name.split(".")[-1] for s in sites})
        return lora_params, sites, negation

    def load_lora_file(self, lora_file: str, sites: Sequence[LoraSite]):
        if lora_file.endswith(".pt"):
            return formats.load_lora_pt(lora_file, sites)
        if self.is_stable_lora():
            return formats.load_stable_lora(lora_file, sites)
        loaded = formats.load_safeloras_into(
            lora_file, {"unet": sites, "text_encoder": sites})
        return next(iter(loaded.values())) if loaded else None

    # -- save ---------------------------------------------------------------
    def save_lora_weights(self, save_path: str, step,
                          unet_lora=None, unet_sites=(),
                          text_lora=None, text_sites=()):
        """Reference save layout: `{save_path}/lora/...`
        (utils/lora_handler.py:335-351)."""
        save_path = os.path.join(save_path, "lora")
        os.makedirs(save_path, exist_ok=True)

        if self.is_cloneofsimo_lora():
            if self.save_for_webui or self.only_for_webui:
                warnings.warn(
                    "save_for_webui requires the stable_lora flavor; "
                    "cloneofsimo LoRA cannot be exported to webui format.")
            if self.use_unet_lora and unet_lora is not None:
                formats.save_lora_pt(unet_lora, unet_sites,
                                     f"{save_path}/{step}_unet.pt")
            if self.use_text_lora and text_lora is not None:
                formats.save_lora_pt(text_lora, text_sites,
                                     f"{save_path}/{step}_text_encoder.pt")
            return

        name = "lora_text_to_video"
        metadata = {
            "stable_lora_text_to_video": "v1",
            "lora_name": name + "_" + uuid.uuid4().hex.lower()[:5],
        }
        formats.save_stable_lora(
            unet_lora, unet_sites, text_lora, text_sites,
            output_dir=save_path, lora_filename=f"{step}_{name}",
            save_text_weights=self.use_text_lora,
            save_for_webui=self.save_for_webui,
            only_webui=self.only_for_webui, metadata=metadata,
            unet_dict_converter=convert_unet_state_dict,
            text_dict_converter=convert_text_enc_state_dict_v20)
