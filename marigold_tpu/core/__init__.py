from marigold_tpu.core.scheduler import (
    DiffusionSchedule,
    make_betas,
    rescale_zero_terminal_snr,
    trailing_timesteps,
    leading_timesteps,
    linspace_timesteps,
)

__all__ = [
    "DiffusionSchedule",
    "make_betas",
    "rescale_zero_terminal_snr",
    "trailing_timesteps",
    "leading_timesteps",
    "linspace_timesteps",
]
