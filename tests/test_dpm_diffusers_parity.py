"""DPM++ 2M parity vs an independent NumPy re-derivation of diffusers'
DPMSolverMultistepScheduler / DPMSolverMultistepInverseScheduler (the exact
schedulers the reference swaps into the pipeline, extract.py:49-54;
diffusers==0.26.0 per the reference requirements.txt).

The re-derivation below is written from the diffusers algorithm definition —
sigma parametrization, 'linspace' timestep spacing, convert_model_output,
first/second-order midpoint updates, lower_order_final placement and the
final_sigmas_type='zero' clause — with no reference to gswm's own scheduler
code, so any drift in gswm.schedulers.dpm (off-by-one spacing, flag
placement, wrong eval timestep) fails these tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.schedulers import sd_schedule
from gswm.schedulers.ddim import to_eps
from gswm.schedulers.dpm import (
    dpm_init_carry,
    dpm_inverse_plan,
    dpm_plan,
    dpm_step,
)


# --------------------------------------------------------------------------
# NumPy re-derivation of diffusers DPMSolverMultistep(Inverse)Scheduler
# (algorithm_type='dpmsolver++', solver_order=2, solver_type='midpoint',
#  thresholding=False, epsilon prediction, use_karras_sigmas=False)
# --------------------------------------------------------------------------


class NumpyDPMSolverMultistep:
    def __init__(self, alphas_cumprod, inverse=False,
                 lower_order_final=True, euler_at_final=False,
                 final_sigmas_type="zero"):
        self.alphas_cumprod = np.asarray(alphas_cumprod, np.float64)
        self.T = len(self.alphas_cumprod)
        self.inverse = inverse
        self.lower_order_final = lower_order_final
        self.euler_at_final = euler_at_final
        self.final_sigmas_type = final_sigmas_type

    # -- set_timesteps ('linspace' spacing, the scheduler default) ----------
    def set_timesteps(self, n):
        full_sigmas = ((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5
        if self.inverse:
            # DPMSolverMultistepInverseScheduler: ascending, final target is
            # the noisiest timestep (sigma_max), appended after the interp
            ts = np.linspace(0, self.T - 1, n + 1).round()[:-1].astype(np.int64)
            sigmas = np.interp(ts, np.arange(self.T), full_sigmas)
            sigma_last = full_sigmas[self.T - 1]
        else:
            ts = np.linspace(0, self.T - 1, n + 1).round()[::-1][:-1].astype(
                np.int64
            )
            sigmas = np.interp(ts, np.arange(self.T), full_sigmas)
            assert self.final_sigmas_type == "zero"
            sigma_last = 0.0
        self.timesteps = ts
        self.sigmas = np.concatenate([sigmas, [sigma_last]])
        self.model_outputs = [None, None]
        self.lower_order_nums = 0
        self.step_index = 0

    # -- helpers -------------------------------------------------------------
    @staticmethod
    def _alpha_sigma(sigma):
        alpha_t = 1.0 / (1.0 + sigma**2) ** 0.5
        return alpha_t, sigma * alpha_t

    def _convert_model_output(self, eps, sample):
        sigma = self.sigmas[self.step_index]
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        return (sample - sigma_t * eps) / alpha_t  # dpmsolver++: x0 pred

    def _first_order_update(self, m0, sample):
        sigma_t, sigma_s = (
            self.sigmas[self.step_index + 1],
            self.sigmas[self.step_index],
        )
        alpha_t, sigma_t = self._alpha_sigma(sigma_t)
        alpha_s, sigma_s = self._alpha_sigma(sigma_s)
        with np.errstate(divide="ignore"):
            lambda_t = np.log(alpha_t) - np.log(sigma_t)
            lambda_s = np.log(alpha_s) - np.log(sigma_s)
        h = lambda_t - lambda_s
        return (sigma_t / sigma_s) * sample - alpha_t * np.expm1(-h) * m0

    def _second_order_update(self, sample):
        m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
        sigma_t = self.sigmas[self.step_index + 1]
        sigma_s0 = self.sigmas[self.step_index]
        sigma_s1 = self.sigmas[self.step_index - 1]
        alpha_t, sigma_t = self._alpha_sigma(sigma_t)
        alpha_s0, sigma_s0 = self._alpha_sigma(sigma_s0)
        alpha_s1, sigma_s1 = self._alpha_sigma(sigma_s1)
        with np.errstate(divide="ignore"):
            lambda_t = np.log(alpha_t) - np.log(sigma_t)
            lambda_s0 = np.log(alpha_s0) - np.log(sigma_s0)
            lambda_s1 = np.log(alpha_s1) - np.log(sigma_s1)
        h = lambda_t - lambda_s0
        h_0 = lambda_s0 - lambda_s1
        r0 = h_0 / h
        D0 = m0
        D1 = (1.0 / r0) * (m0 - m1)
        # midpoint, dpmsolver++
        return (
            (sigma_t / sigma_s0) * sample
            - alpha_t * np.expm1(-h) * D0
            - 0.5 * alpha_t * np.expm1(-h) * D1
        )

    def step(self, eps, sample):
        n = len(self.timesteps)
        if self.inverse:
            lower_order_final = (self.step_index == n - 1) and (
                self.euler_at_final or (self.lower_order_final and n < 15)
            )
        else:
            lower_order_final = (self.step_index == n - 1) and (
                self.euler_at_final
                or (self.lower_order_final and n < 15)
                or self.final_sigmas_type == "zero"
            )
        m = self._convert_model_output(eps, sample)
        self.model_outputs[0] = self.model_outputs[1]
        self.model_outputs[1] = m
        if self.lower_order_nums < 1 or lower_order_final:
            out = self._first_order_update(m, sample)
        else:
            out = self._second_order_update(sample)
        if self.lower_order_nums < 2:
            self.lower_order_nums += 1
        self.step_index += 1
        return out


# --------------------------------------------------------------------------
# Drive both implementations with the same deterministic linear "model":
# eps(x, t) = A * x + b(t) — no UNet needed, exercises every formula branch.
# --------------------------------------------------------------------------

SHAPE = (2, 4, 8, 8)


def _fake_eps_np(x, t):
    rng = np.random.default_rng(7)
    A = rng.normal(0.0, 0.1, SHAPE)
    b = rng.normal(0.0, 1.0, SHAPE)
    return A * x + b * np.cos(t / 1000.0)


def _run_numpy(sched, n, x, inverse):
    solver = NumpyDPMSolverMultistep(sched.alphas_cumprod, inverse=inverse)
    solver.set_timesteps(n)
    x = np.asarray(x, np.float64)
    for t in solver.timesteps:
        x = solver.step(_fake_eps_np(x, float(t)), x)
    return x


def _run_gswm(sched, n, x, inverse):
    plan = (dpm_inverse_plan if inverse else dpm_plan)(sched, n)
    pred_type = sched.prediction_type

    def body(carry, per_step):
        xc, dc = carry
        t, a_eval, a_from, a_to, first = per_step
        model_out = jnp.asarray(
            _fake_eps_np(np.asarray(xc, np.float64), float(t)), jnp.float32
        )
        eps = to_eps(xc, model_out, a_eval, pred_type)
        xn, dc = dpm_step(xc, eps, a_from, a_to, dc, first)
        return (xn, dc), None

    xs = (plan.t_model, plan.alpha_eval, plan.alpha_from, plan.alpha_to,
          plan.extras["first_order"])
    carry = (jnp.asarray(x, jnp.float32), dpm_init_carry(SHAPE))
    # plain python loop (the fake model closes over host values)
    for i in range(n):
        carry, _ = body(carry, tuple(v[i] for v in xs))
    return np.asarray(carry[0])


@pytest.mark.parametrize("n", [2, 3, 4, 10])
def test_forward_matches_diffusers_rederivation(n):
    sched = sd_schedule()
    x = np.random.default_rng(3).normal(size=SHAPE)
    want = _run_numpy(sched, n, x, inverse=False)
    got = _run_gswm(sched, n, x, inverse=False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("n", [2, 3, 4, 10, 16])
def test_inverse_matches_diffusers_rederivation(n):
    # n=16 crosses the lower_order_final < 15 boundary: the final inverse
    # step must be SECOND order there, unlike the forward scheduler
    sched = sd_schedule()
    x = np.random.default_rng(4).normal(size=SHAPE)
    want = _run_numpy(sched, n, x, inverse=True)
    got = _run_gswm(sched, n, x, inverse=True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_final_step_returns_x0_pred():
    # final_sigmas_type='zero': the last transition must output exactly the
    # predicted x0 (sigma_t = 0 -> alpha_t = 1, ratio = 0, expm1(-inf) = -1)
    sched = sd_schedule()
    plan = dpm_plan(sched, 5)
    assert float(plan.alpha_to[-1]) == 1.0
    x = jnp.asarray(np.random.default_rng(5).normal(size=SHAPE), jnp.float32)
    eps = jnp.zeros(SHAPE, jnp.float32)
    carry = dpm_init_carry(SHAPE)
    a_from = plan.alpha_from[-1]
    x0_expect = x / jnp.sqrt(a_from)  # pred_x0 with eps = 0
    out, _ = dpm_step(x, eps, a_from, plan.alpha_to[-1], carry,
                      jnp.array(True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0_expect),
                               rtol=1e-6)


def test_timestep_spacing_is_linspace():
    sched = sd_schedule()
    plan = dpm_plan(sched, 4)
    np.testing.assert_array_equal(
        np.asarray(plan.t_model), [999, 749, 500, 250]
    )
    inv = dpm_inverse_plan(sched, 4)
    np.testing.assert_array_equal(np.asarray(inv.t_model), [0, 250, 500, 749])
    # inverse final target is the noisiest timestep's alpha
    np.testing.assert_allclose(
        float(inv.alpha_to[-1]), float(sched.alphas_cumprod[999]), rtol=1e-6
    )
