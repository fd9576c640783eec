"""In-context GroupNorm stats formulation A/B (round 3).

The op-level trace (tools/profile_ops.py) showed XLA's GroupNorm stats
reduce running ~50x under HBM *inside* the UNet scan while the identical
isolated norm runs at 544 GB/s, and the Pallas-kernel replacement LOSES
e2e because every pallas_call is a layout boundary (docs/BENCH.md).  So
the fix must be a reformulation XLA itself fuses well in the conv-chosen
activation layout.  This experiment reproduces the in-context pattern —
conv3x3 -> GroupNorm+silu -> conv3x3 inside a lax.scan, bf16 activations,
the model's exact shapes — and A/Bs stat formulations:

  ident       no norm (conv-only floor; the delta vs this is the norm cost)
  current     GroupNorm32 semantics: fp32 cast, (B,HW,G,C/G) mean/meansq
              reduce over (HW, C/G) — the shipped path.  C/G = 10 or 20
              channels/group does NOT align to the 128-lane tile, so the
              group reduce crosses lanes at unaligned segment boundaries.
  chanfirst   reduce over spatial dims ONLY (keeps (B, C): lane-aligned,
              no cross-lane segments), then combine channels->groups and
              broadcast back with tiny (C,G) one-hot matmuls.
  matvec      spatial reduction as an MXU matvec: (B*C, HW) x (HW, 8) ones
              columns with fp32 accumulation (bf16 terms), group combine
              via one-hot matmul.  Reads x in its native layout, stats
              never touch the VPU reduce path.
  transpose   copy to NCHW at HBM speed first, reduce there, copy back —
              the "pay two copies, dodge the layout" control.

    python tools/exp_gn_formulations.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gswm-jax-cache")

GROUPS = 32
EPS = 1e-5


def _onehot(c: int, groups: int, dtype=jnp.float32):
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == g).astype(dtype)


def f_ident(h, scale, bias):
    return jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)


def f_current(h, scale, bias):
    b, H, W, c = h.shape
    hf = h.astype(jnp.float32)
    xg = hf.reshape(b, H * W, GROUPS, c // GROUPS)
    mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(xg * xg, axis=(1, 3), keepdims=True) - mu * mu
    y = (xg - mu) * jax.lax.rsqrt(var + EPS)
    y = y.reshape(b, H, W, c) * scale + bias
    return jax.nn.silu(y).astype(h.dtype)


def _normalize(h, mu_g, var_g, scale, bias):
    """Common tail: per-group stats (B,G) -> normalized+silu in input dtype."""
    c = h.shape[-1]
    oh = _onehot(c, GROUPS)
    mu_c = mu_g @ oh.T                       # (B, C)
    inv_c = jax.lax.rsqrt(var_g + EPS) @ oh.T
    hf = h.astype(jnp.float32)
    y = (hf - mu_c[:, None, None, :]) * inv_c[:, None, None, :]
    y = y * scale + bias
    return jax.nn.silu(y).astype(h.dtype)


def f_chanfirst(h, scale, bias):
    b, H, W, c = h.shape
    hf = h.astype(jnp.float32)
    s1 = jnp.sum(hf, axis=(1, 2))            # (B, C), lane-aligned
    s2 = jnp.sum(hf * hf, axis=(1, 2))
    oh = _onehot(c, GROUPS)
    n = H * W * (c // GROUPS)
    mu_g = (s1 @ oh) / n
    var_g = (s2 @ oh) / n - mu_g * mu_g
    return _normalize(h, mu_g, var_g, scale, bias)


def f_matvec(h, scale, bias):
    b, H, W, c = h.shape
    xr = h.reshape(b, H * W, c)
    ones = jnp.ones((H * W, 8), h.dtype)
    dn = (((1,), (0,)), ((), ()))
    s1 = jax.lax.dot_general(xr, ones, dn,
                             preferred_element_type=jnp.float32)[:, :, 0]
    s2 = jax.lax.dot_general(xr * xr, ones, dn,
                             preferred_element_type=jnp.float32)[:, :, 0]
    oh = _onehot(c, GROUPS)
    n = H * W * (c // GROUPS)
    mu_g = (s1 @ oh) / n
    var_g = (s2 @ oh) / n - mu_g * mu_g
    return _normalize(h, mu_g, var_g, scale, bias)


def f_transpose(h, scale, bias):
    b, H, W, c = h.shape
    ht = jnp.transpose(h, (0, 3, 1, 2)).astype(jnp.float32)  # (B, C, H, W)
    xg = ht.reshape(b, GROUPS, -1)                           # (B, G, Cg*H*W)
    mu = jnp.mean(xg, axis=2, keepdims=True)
    var = jnp.mean(xg * xg, axis=2, keepdims=True) - mu * mu
    y = (xg - mu) * jax.lax.rsqrt(var + EPS)
    y = y.reshape(b, c, H, W) * scale[:, None, None] + bias[:, None, None]
    y = jax.nn.silu(y)
    return jnp.transpose(y, (0, 2, 3, 1)).astype(h.dtype)


FORMS = {
    "ident": f_ident,
    "current": f_current,
    "chanfirst": f_chanfirst,
    "matvec": f_matvec,
    "transpose": f_transpose,
}


def make_fn(form, shape):
    b, H, W, c = shape
    f = FORMS[form]

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    fan = 9 * c
    w1 = (jax.random.normal(k1, (3, 3, c, c))
          / np.sqrt(fan)).astype(jnp.bfloat16)
    w2 = (jax.random.normal(k2, (3, 3, c, c))
          / np.sqrt(fan)).astype(jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    x0 = jax.device_put(jax.random.normal(k3, shape).astype(jnp.bfloat16))

    @jax.jit
    def run(x0, w1, w2, scale, bias):
        def step(x, _):
            # conv -> norm -> conv (a resnet half); residual keeps magnitudes
            h = jax.lax.conv_general_dilated(
                x, w1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = f(h, scale, bias)
            h = jax.lax.conv_general_dilated(
                h, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (x + 0.1 * h).astype(x.dtype), ()

        y, _ = jax.lax.scan(step, x0, None, length=4)
        return jnp.sum(y.astype(jnp.float32))

    return lambda: run(x0, w1, w2, scale, bias)


def delta_time(fn, n1=3, n2=9):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(out)
        return time.perf_counter() - t0

    run(2)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    shapes = [(160, 64, 64, 320), (160, 32, 32, 640), (160, 16, 16, 1280)]
    forms = sys.argv[1:] or list(FORMS)
    for shape in shapes:
        gb = np.prod(shape) * 2 / 1e9  # bf16 activation bytes
        base = None
        print(f"{shape} ({gb*1000:.0f} MB/pass activation):", flush=True)
        for form in forms:
            try:
                fn = make_fn(form, shape)
                t = delta_time(fn) / 4  # per step: 2 convs + 1 norm site
                msg = f"  {form:10s} {t*1e3:8.2f} ms/step"
                if form == "ident":
                    base = t
                elif base is not None:
                    ex = (t - base) * 1e3
                    msg += (f"  (+{ex:6.2f} ms norm cost, "
                            f"{2*gb/max(t-base,1e-9)/1.0:7.0f} GB/s eff)")
                print(msg, flush=True)
            except Exception as e:
                print(f"  {form:10s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
