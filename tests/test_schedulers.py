"""Scheduler math on a toy analytic score model (SURVEY.md §7.2 step 3).

For a diffusion whose data distribution is N(mu, s^2 I), the ideal noise
prediction at evaluation alpha a is

    eps*(x, a) = (x - sqrt(a) * mu) * sqrt(1-a) / (a s^2 + 1 - a)

(what a perfectly trained UNet would return for input (x, t_eval)).  With
this oracle, generate -> invert roundtrips must return the start point up to
solver order, and DPM++ 2M must beat first-order DDIM at few steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gswm.schedulers import (
    ddim_inverse_plan,
    ddim_plan,
    ddim_step,
    dpm_inverse_plan,
    dpm_plan,
    dpm_step,
    sd_schedule,
)
from gswm.schedulers.ddim import to_eps
from gswm.schedulers.dpm import dpm_init_carry


def gaussian_eps(x, alpha, mu=0.0, s=1.0):
    var = alpha * s**2 + (1.0 - alpha)
    return (x - jnp.sqrt(alpha) * mu) * jnp.sqrt(1.0 - alpha) / var


def run_plan_ddim(x, plan, mu=0.0, s=1.0):
    def body(carry, per_step):
        t, a_eval, a_from, a_to = per_step
        eps = gaussian_eps(carry, a_eval, mu, s)
        return ddim_step(carry, eps, a_from, a_to), None

    xs = (plan.t_model, plan.alpha_eval, plan.alpha_from, plan.alpha_to)
    out, _ = jax.lax.scan(body, x, xs)
    return out


def run_plan_dpm(x, plan, mu=0.0, s=1.0):
    def body(carry, per_step):
        xc, dc = carry
        t, a_eval, a_from, a_to, fo = per_step
        eps = gaussian_eps(xc, a_eval, mu, s)
        xn, dn = dpm_step(xc, eps, a_from, a_to, dc, fo)
        return (xn, dn), None

    xs = (plan.t_model, plan.alpha_eval, plan.alpha_from, plan.alpha_to,
          plan.extras["first_order"])
    (out, _), _ = jax.lax.scan(body, (x, dpm_init_carry(x.shape)), xs)
    return out


def test_timestep_spacing_leading():
    sched = sd_schedule()
    ts = sched.timesteps(50)
    assert ts[0] == 981 and ts[-1] == 1  # diffusers leading + offset 1
    assert len(ts) == 50 and np.all(np.diff(ts) == -20)


def test_ddim_roundtrip_standard_normal():
    """Data ~ N(0, I): invert(generate(x)) ~= x.  With target-eval inversion
    each inverse step is the formula-inverse of its generation step, so the
    roundtrip multiplier is 0.995 at 20 steps (vs 0.878 for source-eval —
    the convention bug this test guards against)."""
    sched = sd_schedule()
    x = jax.random.normal(jax.random.key(0), (4, 8, 8))
    x0 = run_plan_ddim(x, ddim_plan(sched, 20))
    back = run_plan_ddim(x0, ddim_inverse_plan(sched, 20))
    err = float(jnp.max(jnp.abs(back - x)))
    assert err < 0.03, err


def test_ddim_roundtrip_shifted_gaussian_converges():
    """Strongly curved ODE (mu=2, s=0.5): DDIM inversion is a first-order
    method — roundtrip error must scale ~1/steps, and sign survival (the
    quantity the watermark decode depends on) must be high already at the
    reference's recommended 50 steps (README.md:265-266)."""
    sched = sd_schedule()
    x = jax.random.normal(jax.random.key(1), (4, 16, 16))
    errs = {}
    for steps in (10, 50):
        x0 = run_plan_ddim(x, ddim_plan(sched, steps), mu=2.0, s=0.5)
        back = run_plan_ddim(x0, ddim_inverse_plan(sched, steps), mu=2.0, s=0.5)
        errs[steps] = float(jnp.mean(jnp.abs(back - x)))
        if steps == 50:
            sign_acc = float(jnp.mean((back > 0) == (x > 0)))
    assert errs[10] / errs[50] > 3.0, errs  # ~first-order: expect ~5x
    assert errs[50] < 0.2, errs
    assert sign_acc > 0.93, sign_acc


def test_ddim_generation_converges_to_data():
    """From pure noise, the exact-score ODE should land near the data
    manifold: x0 distribution ~ N(mu, s^2)."""
    sched = sd_schedule()
    x = jax.random.normal(jax.random.key(2), (4, 32, 32))
    x0 = run_plan_ddim(x, ddim_plan(sched, 50), mu=3.0, s=0.1)
    assert abs(float(x0.mean()) - 3.0) < 0.05
    assert float(x0.std()) < 0.2


def test_dpm_matches_ddim_direction():
    """DPM++ 2M and DDIM integrate the same ODE — results must agree to
    solver tolerance at moderate step counts."""
    sched = sd_schedule()
    x = jax.random.normal(jax.random.key(3), (4, 8, 8))
    a = run_plan_ddim(x, ddim_plan(sched, 30), mu=1.0, s=0.5)
    b = run_plan_dpm(x, dpm_plan(sched, 30), mu=1.0, s=0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.25)
    assert float(jnp.mean(jnp.abs(a - b))) < 0.08


def test_dpm_roundtrip():
    sched = sd_schedule()
    x = jax.random.normal(jax.random.key(4), (4, 8, 8))
    x0 = run_plan_dpm(x, dpm_plan(sched, 50), mu=1.0, s=0.5)
    back = run_plan_dpm(x0, dpm_inverse_plan(sched, 50), mu=1.0, s=0.5)
    err = float(jnp.mean(jnp.abs(back - x)))
    sign_acc = float(jnp.mean((back > 0) == (x > 0)))
    assert err < 0.2, err
    assert sign_acc > 0.93, sign_acc


def test_dpm_second_order_beats_first_order():
    """2M's multistep correction must reduce ODE error vs pure first-order
    on the SAME timestep grid and endpoints (few steps, where the difference
    is visible).  First-order dpmsolver++ on a grid equals DDIM there, so
    forcing the first_order flags gives the fair baseline."""
    import dataclasses

    sched = sd_schedule()
    x = jax.random.normal(jax.random.key(5), (4, 8, 8))
    # near-exact reference on the same (linspace, final-sigma-zero) grid
    ref = run_plan_dpm(x, dpm_plan(sched, 400), mu=2.0, s=0.5)

    plan = dpm_plan(sched, 8)
    plan1 = dataclasses.replace(
        plan, extras={"first_order": jnp.ones(8, bool)}
    )
    out2 = run_plan_dpm(x, plan, mu=2.0, s=0.5)
    out1 = run_plan_dpm(x, plan1, mu=2.0, s=0.5)
    e2 = float(jnp.mean(jnp.abs(out2 - ref)))
    e1 = float(jnp.mean(jnp.abs(out1 - ref)))
    assert e2 < e1, (e2, e1)


def test_v_prediction_equivalence():
    """to_eps on a v output must recover the epsilon that generated it."""
    a = jnp.float32(0.7)
    x = jax.random.normal(jax.random.key(6), (4, 4))
    eps = jax.random.normal(jax.random.key(7), (4, 4))
    x0 = (x - jnp.sqrt(1 - a) * eps) / jnp.sqrt(a)
    v = jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * x0
    got = to_eps(x, v, a, "v_prediction")
    np.testing.assert_allclose(np.asarray(got), np.asarray(eps), atol=1e-5)
