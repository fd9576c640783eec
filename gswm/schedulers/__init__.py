"""Diffusion schedulers as pure, jit-compiled functions.

The reference reaches its schedulers through diffusers
(DDIMInverseScheduler / DPMSolverMultistepInverseScheduler, extract.py:49-54)
and through the hosts' samplers.  Here each scheduler is a *plan* — stacked
per-step coefficient arrays precomputed on host — plus a pure ``step`` update,
so a whole denoise or inversion run is one ``lax.scan`` with static shapes
(no data-dependent control flow under jit).
"""

from gswm.schedulers.schedule import NoiseSchedule, sd_schedule  # noqa: F401
from gswm.schedulers.ddim import (  # noqa: F401
    ddim_plan,
    ddim_inverse_plan,
    ddim_step,
)
from gswm.schedulers.dpm import (  # noqa: F401
    dpm_plan,
    dpm_inverse_plan,
    dpm_step,
)

SCHEDULERS = {
    "DDIM": (ddim_plan, ddim_inverse_plan),
    "DPMs": (dpm_plan, dpm_inverse_plan),
}
