"""Fused GroupNorm kernel parity (gswm.ops.groupnorm).

The kernel is a measured dead end for the model path (it loses to XLA's
fused gn+silu e2e — see the module docstring) and is NOT wired into
GroupNorm32; these tests keep its two layouts (resident / twopass) honest
against the fp32 flax reference in interpret mode so the recorded
experiment stays reproducible.  Reference semantics: diffusers/torch
GroupNorm (fp32 stats, fast-variance), the normalization the real SD
checkpoints were trained with (/root/reference/extract.py:39-43 VAE
encode; nodes.py latent path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from gswm.ops.groupnorm import fused_group_norm


def _ref(x, scale, bias, groups, eps, act=None):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale + bias
    if act == "silu":
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


@pytest.mark.parametrize("mode", ["resident", "twopass"])
@pytest.mark.parametrize("act", [None, "silu"])
def test_kernel_matches_reference(mode, act):
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 64)) * 2 + 0.5
    scale = jax.random.normal(jax.random.key(1), (64,)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.key(2), (64,)) * 0.2
    got = fused_group_norm(x, scale, bias, groups=32, eps=1e-5, act=act,
                           force_mode=mode, interpret=True)
    want = _ref(x, scale, bias, 32, 1e-5, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("mode", ["resident", "twopass"])
def test_kernel_bf16_and_eps(mode):
    x = (jax.random.normal(jax.random.key(3), (2, 4, 8, 64))
         .astype(jnp.bfloat16))
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    got = fused_group_norm(x, scale, bias, groups=32, eps=1e-6,
                           force_mode=mode, interpret=True)
    want = _ref(x, scale, bias, 32, 1e-6)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05)


def test_kernel_vs_module_xla_path():
    """Kernel output matches the shipped GroupNorm32 XLA path bit-for-bit in
    fp32 (same fast-variance fp32-stats contract), with checkpoint-style
    non-trivial scale/bias."""
    from gswm.models.layers import GroupNorm32

    x = jax.random.normal(jax.random.key(6), (1, 4, 4, 64))
    scale = jnp.linspace(0.5, 1.5, 64)
    bias = jnp.linspace(-0.3, 0.3, 64)
    params = {"params": {"scale": scale, "bias": bias}}
    want = GroupNorm32(32, epsilon=1e-5).apply(params, x)
    got = fused_group_norm(x, scale, bias, groups=32, eps=1e-5,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
