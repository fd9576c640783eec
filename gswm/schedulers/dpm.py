"""DPM-Solver++ 2M (multistep) and its inverse, scan-friendly.

The reference's alternate extraction path is diffusers'
DPMSolverMultistepInverseScheduler (extract.py:49-50).  Here the solver is a
pure second-order update in log-SNR space whose formulas are direction
agnostic — generation runs the plan descending, inversion ascending — so the
same ``dpm_step`` serves both.

Update (data-prediction / "dpmsolver++", transition s0 -> t):
    lam(a)  = 0.5 * log(a / (1-a))             # log-SNR from cumulative alpha
    h       = lam_t - lam_s0
    first:  x_t = (sig_t/sig_s0) x - alp_t (exp(-h)-1) m0
    second: D1  = (m0 - m1) / r0,  r0 = (lam_s0 - lam_s1) / h
            x_t = (sig_t/sig_s0) x - alp_t (exp(-h)-1) (m0 + 0.5 D1)
with alp = sqrt(a), sig = sqrt(1-a), and m0/m1 the current/previous predicted
x0.  The scan carry holds (prev_x0, prev_lambda); the first step and the final
step (lower-order-final, the diffusers default that stabilizes small step
counts) drop to first order via a per-step flag.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gswm.schedulers.ddim import ScanPlan, pred_x0
from gswm.schedulers.schedule import NoiseSchedule


def _lam(alpha):
    return 0.5 * jnp.log(alpha / (1.0 - alpha))


def dpm_step(
    x,
    eps,
    alpha_from,
    alpha_to,
    carry,
    first_order: jnp.ndarray,
):
    """One DPM++ 2M transition.  ``carry`` = (prev_x0, prev_lambda, have_prev).

    ``eps`` is an epsilon prediction (convert v outputs with
    schedulers.ddim.to_eps first).  ``first_order`` is a traced bool forcing
    the first-order update (step 0 and the final step).
    Returns (x_next, new_carry).
    """
    prev_x0, prev_lam, have_prev = carry
    x0 = pred_x0(x, eps, alpha_from)

    lam_s = _lam(alpha_from)
    lam_t = _lam(alpha_to)
    h = lam_t - lam_s

    alp_t = jnp.sqrt(alpha_to)
    sig_t = jnp.sqrt(1.0 - alpha_to)
    sig_s = jnp.sqrt(1.0 - alpha_from)
    ratio = sig_t / sig_s
    phi = jnp.expm1(-h)

    x1 = ratio * x - alp_t * phi * x0  # first order

    r0 = (lam_s - prev_lam) / h
    d1 = (x0 - prev_x0) / jnp.where(r0 == 0, 1.0, r0)
    x2 = ratio * x - alp_t * phi * (x0 + 0.5 * d1)

    use_first = jnp.logical_or(first_order, jnp.logical_not(have_prev))
    x_next = jnp.where(use_first, x1, x2)
    new_carry = (x0, lam_s, jnp.array(True))
    return x_next, new_carry


def dpm_init_carry(shape, dtype=jnp.float32):
    return (jnp.zeros(shape, dtype), jnp.float32(0.0), jnp.array(False))


def _first_order_flags(n: int, lower_order_final: bool) -> np.ndarray:
    flags = np.zeros(n, dtype=bool)
    flags[0] = True  # no previous model output yet (lower_order_nums < 1)
    if lower_order_final and n > 1:
        flags[-1] = True
    return flags


def dpm_plan(schedule: NoiseSchedule, num_steps: int) -> ScanPlan:
    """Generation plan — exact diffusers DPMSolverMultistepScheduler
    semantics (the scheduler family extract.py:49-54 swaps in):

      * 'linspace' timestep spacing: ``linspace(0, T-1, N+1).round()``
        descending with the trailing 0 dropped (NOT the DDIM 'leading'
        spacing);
      * ``final_sigmas_type='zero'``: the last transition targets sigma = 0
        (alpha_to = 1), which both makes the final update return the
        predicted x0 and forces the final step to first order;
      * model eval at the source timestep.

    Pinned against a NumPy re-derivation of the diffusers algorithm in
    tests/test_dpm_diffusers_parity.py.
    """
    T = schedule.num_train_timesteps
    ts = np.linspace(0, T - 1, num_steps + 1).round().astype(np.int64)
    ts = ts[::-1][:-1].copy()  # descending, N values
    a_src = schedule.alpha_at(ts)
    a_tgt = np.concatenate([schedule.alpha_at(ts[1:]), [1.0]])
    a_from = jnp.asarray(a_src, jnp.float32)
    return ScanPlan(
        t_model=jnp.asarray(ts, jnp.int32),
        alpha_eval=a_from,
        alpha_from=a_from,
        alpha_to=jnp.asarray(a_tgt, jnp.float32),
        extras={
            "first_order": jnp.asarray(
                _first_order_flags(num_steps, lower_order_final=True)
            ),
        },
    )


def dpm_inverse_plan(schedule: NoiseSchedule, num_steps: int) -> ScanPlan:
    """Inversion plan — exact diffusers DPMSolverMultistepInverseScheduler
    semantics (extract.py:49-50):

      * ascending 'linspace' timesteps ``linspace(0, T-1, N+1).round()[:-1]``
        with the final transition targeting the noisiest timestep T-1
        (sigma_max);
      * model eval at the SOURCE timestep of each transition, exactly like
        the diffusers denoise-loop drive of the inverse scheduler (NOT the
        target-eval convention our DDIM inverse uses);
      * ``lower_order_final`` only applies below 15 steps (the inverse
        scheduler has no final_sigmas_type='zero' clause — its final sigma
        is sigma_max, not zero).
    """
    T = schedule.num_train_timesteps
    ts = np.linspace(0, T - 1, num_steps + 1).round().astype(np.int64)
    ts_asc = ts[:-1].copy()  # ascending, N values; final target is T-1
    a_src = schedule.alpha_at(ts_asc)
    a_tgt = schedule.alpha_at(ts[1:])
    a_from = jnp.asarray(a_src, jnp.float32)
    return ScanPlan(
        t_model=jnp.asarray(ts_asc, jnp.int32),
        alpha_eval=a_from,
        alpha_from=a_from,
        alpha_to=jnp.asarray(a_tgt, jnp.float32),
        extras={
            "first_order": jnp.asarray(
                _first_order_flags(num_steps,
                                   lower_order_final=num_steps < 15)
            ),
        },
    )
