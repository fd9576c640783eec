"""Fused GroupNorm(+silu) Pallas kernels.

Why this exists: the op-level trace of the extraction pass
(tools/profile_ops.py, round 3) showed XLA's NHWC GroupNorm running ~50x
over the HBM floor on the v5e — the per-(batch,channel) stats reduce over
the strided spatial dims costs 25 ms/step for ONE lvl0 norm (a 420 MB read
that should take ~0.5 ms), putting norm statistics at 31% of total device
time for the whole 30-step inversion.  The reference never sees this cost
class (torch GroupNorm on CUDA is a tuned cub reduction); the TPU-native
answer is a Pallas kernel that walks the (H*W, C) rows once in VMEM tiles,
accumulates fp32 per-channel partial sums vectorized across lanes, combines
them per group with tiny one-hot matmuls, and normalizes (+ optional fused
silu) on a second VMEM pass.

Two layouts, chosen by per-image VMEM demand:

  * resident — grid (B,); the whole (H*W, C) image stays in VMEM across the
    stats and apply passes: ONE HBM read + one write.
  * twopass — grid (B, row-tiles); a stats kernel accumulates (2, C) partial
    sums into a revisited output block, the group combine runs on XLA at
    (B, 2, C) size (trivial), and an apply kernel normalizes tile-by-tile:
    two HBM reads + one write, any (H, W, C).

Numerics: statistics and the normalize arithmetic are fp32 regardless of
input dtype (same contract as gswm.models.layers.GroupNorm32, which the
model path keeps for CPU/fp32); E[x^2]-E[x]^2 fast-variance form matches
flax's use_fast_variance default.  Output dtype == input dtype.

No reference counterpart (the reference outsources normalization to torch,
SURVEY.md §2.4); this is framework-native perf work.

MEASURED OUTCOME (round 3, v5e): **dead end as a model-path replacement —
not wired in.**  In isolation both layouts LOSE to XLA's fused gn+silu
(lvl0 2.31 ms XLA vs 3.23/3.79 ms pallas; the 960-ch resident variant
fails the Mosaic compiler), and wired into the UNet the end-to-end bench
regressed 4.58 -> 3.98 imgs/sec/chip: every pallas_call is a layout
boundary, so XLA re-lays-out the conv activations around each of the ~13
norm sites and the transposes cost more than the slow reduce they replace.
The 25 ms/step in-context stats cost is real but is a *layout interaction*
(the isolated XLA norm runs at 544 GB/s) — the fix has to stay inside
XLA's fusion domain (see GroupNorm32 in gswm/models/layers.py), not punch
a kernel hole in it.  Kept for the record and for the interpret-mode CI
parity tests (tests/test_groupnorm_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Whole-image-resident ceiling: input and output blocks are double-buffered
# by Pallas, so VMEM cost ~= 4x the bf16 image bytes plus fp32 row-tile
# temporaries; 3.5 MB keeps the total under the ~16 MB scoped-vmem limit.
_RESIDENT_BYTES = 3_500_000
# Row-tile target for the streaming paths (~1-2 MB per tile).
_ROW_TILE_BYTES = 1 << 20


def _row_tile(hw: int, c: int, itemsize: int) -> int:
    rt = max(1, _ROW_TILE_BYTES // (c * itemsize))
    rt = min(hw, 1 << (rt.bit_length() - 1))
    # rt must DIVIDE hw or the stats/apply loops drop the tail rows (hw is
    # a pow2 only for pow2-sided images; 768x768's latent hw=9216 is not).
    while hw % rt:
        rt //= 2
    return rt


def _onehot(c: int, groups: int):
    """(C, G) fp32 group-membership matrix, built from iota (constant)."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == g).astype(jnp.float32)


def _affine_from_stats(s, ss, scale, bias, *, hw, c, groups, eps):
    """Per-channel a, b such that y = x * a + b.  s/ss: (1, C) fp32 sums."""
    onehot = _onehot(c, groups)
    cnt = float(hw * (c // groups))
    # HIGHEST precision: these (1,C)x(C,G) dots are tiny, but the default
    # MXU bf16 rounding of the channel sums costs ~4e-3 relative error in
    # the resulting statistics (measured in interpret mode) — far above the
    # fp32 contract of this kernel.
    hp = jax.lax.Precision.HIGHEST
    gs = jnp.dot(s, onehot, preferred_element_type=jnp.float32,
                 precision=hp) / cnt
    gss = jnp.dot(ss, onehot, preferred_element_type=jnp.float32,
                  precision=hp) / cnt
    gvar = jnp.maximum(gss - gs * gs, 0.0)
    ginv = jax.lax.rsqrt(gvar + eps)
    mu_c = jnp.dot(gs, onehot.T, preferred_element_type=jnp.float32,
                   precision=hp)
    inv_c = jnp.dot(ginv, onehot.T, preferred_element_type=jnp.float32,
                    precision=hp)
    a = inv_c * scale
    b = bias - mu_c * a
    return a, b


def _apply_act(y, act):
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    if act is not None:
        raise ValueError(f"unsupported act {act!r}")
    return y


def _resident_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps, act,
                     row_tile):
    hw, c = x_ref.shape[1], x_ref.shape[2]
    n = hw // row_tile

    def stats(i, carry):
        s, ss = carry
        t = x_ref[0, pl.ds(i * row_tile, row_tile), :].astype(jnp.float32)
        return (s + jnp.sum(t, 0, keepdims=True),
                ss + jnp.sum(t * t, 0, keepdims=True))

    s, ss = jax.lax.fori_loop(
        0, n, stats,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)))
    a, b = _affine_from_stats(s, ss, scale_ref[...], bias_ref[...],
                              hw=hw, c=c, groups=groups, eps=eps)

    def apply(i, _):
        t = x_ref[0, pl.ds(i * row_tile, row_tile), :].astype(jnp.float32)
        y = _apply_act(t * a + b, act)
        o_ref[0, pl.ds(i * row_tile, row_tile), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n, apply, 0)


def _stats_kernel(x_ref, o_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    t = x_ref[0].astype(jnp.float32)
    o_ref[0, 0:1, :] += jnp.sum(t, 0, keepdims=True)
    o_ref[0, 1:2, :] += jnp.sum(t * t, 0, keepdims=True)


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, act):
    t = x_ref[0].astype(jnp.float32)
    y = _apply_act(t * a_ref[0] + b_ref[0], act)
    o_ref[0] = y.astype(o_ref.dtype)


def fused_group_norm_sharded(x, scale, bias, **kw):
    """fused_group_norm partitioned over a 'dp' mesh batch axis.

    GroupNorm is per-image independent, so under a data-parallel mesh the
    pallas_call runs inside shard_map on each device's local batch with no
    collectives.  Mirrors flash_attention_sharded: GSPMD cannot partition an
    opaque pallas_call, so without this a dp mesh would replicate the norm.
    Falls back to the plain call when no mesh / dp=1 / indivisible batch.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        names = getattr(mesh, "axis_names", ()) or ()
    except Exception:
        return fused_group_norm(x, scale, bias, **kw)
    if "dp" not in names or mesh.shape["dp"] == 1 \
            or x.shape[0] % mesh.shape["dp"] != 0:
        return fused_group_norm(x, scale, bias, **kw)
    spec = jax.sharding.PartitionSpec("dp", None, None, None)
    rep = jax.sharding.PartitionSpec(None)
    fn = jax.shard_map(
        functools.partial(fused_group_norm, **kw),
        mesh=mesh,
        in_specs=(spec, rep, rep),
        out_specs=spec,
        check_vma=False,
    )
    return fn(x, scale, bias)


def fused_group_norm(x, scale, bias, *, groups: int = 32, eps: float = 1e-5,
                     act: str | None = None, force_mode: str | None = None,
                     interpret: bool | None = None):
    """GroupNorm (+ optional fused silu) over NHWC ``x``.

    scale/bias: (C,) affine parameters (any float dtype; promoted to fp32).
    Returns the normalized tensor in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b_, h, w, c = x.shape
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    hw = h * w
    itemsize = jnp.dtype(x.dtype).itemsize
    xr = x.reshape(b_, hw, c)
    scale = scale.astype(jnp.float32).reshape(1, c)
    bias = bias.astype(jnp.float32).reshape(1, c)
    rt = _row_tile(hw, c, itemsize)
    mode = force_mode or (
        "resident" if hw * c * itemsize <= _RESIDENT_BYTES else "twopass")

    if mode == "resident":
        kernel = functools.partial(_resident_kernel, groups=groups, eps=eps,
                                   act=act, row_tile=rt)
        out = pl.pallas_call(
            kernel,
            grid=(b_,),
            in_specs=[
                pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b_, hw, c), x.dtype),
            interpret=interpret,
        )(xr, scale, bias)
        return out.reshape(b_, h, w, c)

    n_rt = hw // rt
    stats = pl.pallas_call(
        _stats_kernel,
        grid=(b_, n_rt),
        in_specs=[pl.BlockSpec((1, rt, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, 2, c), jnp.float32),
        interpret=interpret,
    )(xr)
    a, b = jax.vmap(
        lambda st: _affine_from_stats(st[0:1], st[1:2], scale, bias,
                                      hw=hw, c=c, groups=groups, eps=eps)
    )(stats)  # (B, 1, C) each
    out = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(b_, n_rt),
        in_specs=[
            pl.BlockSpec((1, rt, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rt, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, hw, c), x.dtype),
        interpret=interpret,
    )(xr, a, b)
    return out.reshape(b_, h, w, c)
