from siss_tpu.diffusion.schedule import (
    NoiseSchedule,
    make_beta_schedule,
    spaced_timesteps,
)
from siss_tpu.diffusion.sde import VPSDE, SubVPSDE, VESDE

__all__ = [
    "NoiseSchedule",
    "make_beta_schedule",
    "spaced_timesteps",
    "VPSDE",
    "SubVPSDE",
    "VESDE",
]
