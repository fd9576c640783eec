"""Calibrate + A/B the GroupNorm bottleneck found by tools/profile_ops.py.

The op trace shows XLA's GroupNorm stats reduce on NHWC bf16 running ~50x
over the HBM floor (25 ms for a 420 MB read at b160 lvl0) and even the
normalize-apply elementwise ~5x over.  This experiment measures, at the
lvl0 shape (160,64,64,320):

  1. raw HBM calibration: bf16 copy-scale (read+write) via XLA;
  2. XLA GroupNorm(+silu) as the model currently runs it (fp32 stats);
  3. Pallas fused one-pass GroupNorm+silu (whole image resident);
  4. Pallas two-kernel GroupNorm+silu (partial-stats grid + apply grid),
     the variant that scales to any (H, W, C).

    python tools/exp_groupnorm.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gswm.ops.groupnorm import fused_group_norm  # noqa: E402


def chain_time(f, x, n1=5, n2=25):
    """Per-iteration device time of y=f(y) chained n times inside ONE
    dispatch (fori_loop), differenced at two trip counts — the only honest
    method for ops smaller than the ~30 ms tunnel RPC constant."""

    @jax.jit
    def chain(x0, n):
        return jax.lax.fori_loop(0, n, lambda i, t: f(t), x0)

    def run(n):
        t0 = time.perf_counter()
        np.asarray(chain(x, n).ravel()[0])
        return time.perf_counter() - t0

    run(2)  # warm/compile
    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1)


def xla_group_norm_silu(x, scale, bias, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale + bias
    return jax.nn.silu(y).astype(x.dtype)


def main():
    shapes = [(160, 64, 64, 320), (160, 64, 64, 960), (160, 32, 32, 640),
              (160, 16, 16, 1280)]
    for shp in shapes:
        b, h, w, c = shp
        x = jax.random.normal(jax.random.key(0), shp, jnp.bfloat16)
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        gb = x.size * 2 / 1e9

        t = chain_time(lambda t: t * jnp.bfloat16(1.0001), x)
        print(f"{shp}: copy-scale {t*1e3:6.2f} ms "
              f"({2*gb/t:6.0f} GB/s eff)", flush=True)

        t_xla = chain_time(lambda t: xla_group_norm_silu(t, scale, bias), x)
        print(f"         xla gn+silu     {t_xla*1e3:6.2f} ms "
              f"({3*gb/t_xla:6.0f} GB/s eff)", flush=True)

        ref = jax.jit(xla_group_norm_silu)(x, scale, bias)
        for mode in ("resident", "twopass"):
            try:
                f = functools.partial(
                    fused_group_norm, scale=scale, bias=bias, groups=32,
                    eps=1e-5, act="silu", force_mode=mode)
                got = jax.jit(f)(x)
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - ref.astype(jnp.float32))))
                t_p = chain_time(f, x)
                tr = (2 if mode == "resident" else 3) * gb
                print(f"         pallas {mode:8s} {t_p*1e3:6.2f} ms "
                      f"({tr/t_p:6.0f} GB/s eff, maxerr {err:.1e})",
                      flush=True)
            except Exception as e:
                print(f"         pallas {mode} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
