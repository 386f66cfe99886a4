from .ddpm import DDPMScheduler, SchedulerConfig, enforce_zero_terminal_snr
from .dpmsolver import DPMSolverMultistepScheduler, DPMSolverState

__all__ = [
    "DDPMScheduler", "SchedulerConfig", "enforce_zero_terminal_snr",
    "DPMSolverMultistepScheduler", "DPMSolverState",
]
