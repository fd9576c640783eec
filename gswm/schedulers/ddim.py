"""DDIM and exact DDIM inversion (eta = 0).

The closed-form update is symmetric in (alpha_from, alpha_to) — the recovered
reference pyc literally defines ``forward_ddim`` as "same as backward_ddim"
with swapped alphas (SURVEY.md §2.3, inverse_stable_diffusion_gs).  One pure
``ddim_step`` therefore serves generation and inversion; only the per-step
coefficient *plan* differs.

Generation step (x_t -> x_prev, model eval at t):
    x0   = (x_t - sqrt(1-a_t) * eps) / sqrt(a_t)
    x_to = sqrt(a_prev) * x0 + sqrt(1-a_prev) * eps

Inversion replays the generation pairs in reverse with alphas swapped.  The
model is evaluated at the *target* (higher) timestep of each undone step —
the same convention as diffusers' DDIMInverseScheduler, and measurably the
right one: with an analytic score oracle the roundtrip multiplier is 0.995
at 20 steps vs 0.878 for source-eval (each inverse step is then the
formula-inverse of the matching generation step, so errors cancel to second
order).  ``alpha_eval`` rides in the plan because v-prediction outputs must
be converted to epsilon at the alpha the model was *evaluated* at, not the
alpha the state lives at.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from gswm.schedulers.schedule import NoiseSchedule


@dataclasses.dataclass(frozen=True)
class ScanPlan:
    """Per-step arrays consumed by lax.scan.

    t_model/alpha_eval: where the UNet is evaluated.
    alpha_from/alpha_to: the state transition.
    extras: scheduler-specific per-step coefficients (DPM order flags).
    """

    t_model: jnp.ndarray  # (N,) int32
    alpha_eval: jnp.ndarray  # (N,) float32
    alpha_from: jnp.ndarray  # (N,) float32
    alpha_to: jnp.ndarray  # (N,) float32
    extras: dict = dataclasses.field(default_factory=dict)

    def __len__(self):
        return self.t_model.shape[0]


def to_eps(x, model_out, alpha_eval, prediction_type: str = "epsilon"):
    """Convert a model output to an epsilon prediction.

    For v-prediction (SD 2.1-768): eps = sqrt(a) v + sqrt(1-a) x, with a at
    the model-eval timestep (the model interprets x as x_{t_eval}).
    """
    if prediction_type == "epsilon":
        return model_out
    if prediction_type == "v_prediction":
        sa = jnp.sqrt(alpha_eval)
        sb = jnp.sqrt(1.0 - alpha_eval)
        return sa * model_out + sb * x
    raise ValueError(prediction_type)


def pred_x0(x, eps, alpha):
    return (x - jnp.sqrt(1.0 - alpha) * eps) / jnp.sqrt(alpha)


def ddim_step(x, eps, alpha_from, alpha_to):
    """One DDIM transition alpha_from -> alpha_to (either direction)."""
    x0 = pred_x0(x, eps, alpha_from)
    return jnp.sqrt(alpha_to) * x0 + jnp.sqrt(1.0 - alpha_to) * eps


def ddim_plan(schedule: NoiseSchedule, num_steps: int) -> ScanPlan:
    """Generation: descending timesteps; model eval at the source timestep."""
    ts = schedule.timesteps(num_steps)  # descending
    ratio = schedule.num_train_timesteps // num_steps
    prev = ts - ratio
    a_from = schedule.alpha_at(ts)
    return ScanPlan(
        t_model=jnp.asarray(ts, jnp.int32),
        alpha_eval=jnp.asarray(a_from, jnp.float32),
        alpha_from=jnp.asarray(a_from, jnp.float32),
        alpha_to=jnp.asarray(schedule.alpha_at(prev), jnp.float32),
    )


def ddim_inverse_plan(schedule: NoiseSchedule, num_steps: int) -> ScanPlan:
    """Inversion: mirrored pairs, ascending, model eval at the target."""
    ts = schedule.timesteps(num_steps)  # descending
    ratio = schedule.num_train_timesteps // num_steps
    prev = ts - ratio
    ts_asc = ts[::-1]
    prev_asc = prev[::-1]
    a_to = schedule.alpha_at(ts_asc)
    return ScanPlan(
        t_model=jnp.asarray(ts_asc, jnp.int32),
        alpha_eval=jnp.asarray(a_to, jnp.float32),
        alpha_from=jnp.asarray(schedule.alpha_at(prev_asc), jnp.float32),
        alpha_to=jnp.asarray(a_to, jnp.float32),
    )
