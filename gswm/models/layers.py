"""Shared building blocks for the UNet and VAE (Flax linen, NHWC).

Design notes (TPU):
  * Convs are NHWC/HWIO — XLA's native TPU layout, no transposes inside the
    network.
  * GroupNorm in fp32 regardless of compute dtype (normalization statistics
    are precision-sensitive; everything else can ride bf16 into the MXU).
  * Attention uses one fused qkv einsum per projection and
    ``dot_general``-friendly shapes (batch, seq, heads, head_dim); optional
    logical sharding constraints let pjit shard heads across a 'tp' mesh axis
    (gswm.sharding.axis_rules).
"""

from __future__ import annotations

from typing import Optional

import os

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

# Profiling aid: GSWM_ABLATE="attn"|"norm"|"ff" skips that component (wrong
# numerics, same shapes) so bench deltas attribute scan time per component.
_ABLATE = set(os.environ.get("GSWM_ABLATE", "").split(","))


def with_sharding(x, axes):
    """Sharding hint that degrades to a no-op outside a mesh context.

    ``axes`` names mesh axes per dimension ('dp' batch, 'tp' heads/ffn); axes
    not present in the active mesh are dropped, so the same model code runs
    single-chip, DP-only, or DP x TP without edits.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        names = getattr(mesh, "axis_names", ()) or ()
        if not names:
            return x
        spec = P(*[a if a in names else None for a in axes])
        return jax.lax.with_sharding_constraint(x, spec)
    except Exception:
        return x


class GroupNorm32(nn.GroupNorm):
    """GroupNorm computed in fp32, cast back to the input dtype.

    Subclasses nn.GroupNorm (rather than wrapping it) so scale/bias live at
    this module's own path — flat names, matching diffusers checkpoints
    (``norm1.weight`` -> ``norm1.scale``, no intermediate scope).

    NHWC inputs take a transposed-stats path: copy to NCHW, reduce each
    group over its now-contiguous (C/G, H, W) block, normalize there, copy
    back.  C/G = 10 or 20 channels/group does not align to the 128-lane
    tile, so reducing in NHWC makes XLA emit cross-lane segment reductions
    that run ~50x under HBM inside the UNet scan (tools/profile_ops.py);
    the two NCHW copies fuse at HBM speed instead (measured 2276 GB/s eff
    vs 346 GB/s, tools/exp_gn_formulations.py on-chip: +0.37 ms vs
    +2.42 ms per site at 160x64x64x320).  Same math as nn.GroupNorm's
    fast-variance path (mean / mean-of-squares in fp32), different
    reduction order only."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        if "norm" in _ABLATE:
            return x
        dtype = x.dtype
        c = x.shape[-1]
        assert c % self.num_groups == 0, (c, self.num_groups)
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
        # GSWM_GN_STATS=nhwc restores the direct NHWC reduction (the
        # pre-round-3 formulation) purely for end-to-end A/B runs — the
        # explicit validation row VERDICT r3 asked for.
        if os.environ.get("GSWM_GN_STATS") == "nhwc":
            xf = x.astype(jnp.float32)
            red = tuple(range(1, x.ndim - 1))
            xg = xf.reshape(x.shape[:-1] + (self.num_groups, -1))
            mu = jnp.mean(xg, axis=red + (x.ndim,), keepdims=True)
            var = jnp.mean(xg * xg, axis=red + (x.ndim,), keepdims=True) \
                - mu * mu
            y = (xg - mu) * jax.lax.rsqrt(var + self.epsilon)
            y = y.reshape(xf.shape)
            y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            return y.astype(dtype)
        xt = jnp.moveaxis(x, -1, 1).astype(jnp.float32)  # (B, C, *spatial)
        shape_t = xt.shape
        xg = xt.reshape(x.shape[0], self.num_groups, -1)
        mu = jnp.mean(xg, axis=2, keepdims=True)
        var = jnp.mean(xg * xg, axis=2, keepdims=True) - mu * mu
        y = (xg - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y.reshape(shape_t)
        cdims = (slice(None),) + (None,) * (x.ndim - 2)
        y = y * scale.astype(jnp.float32)[cdims] \
            + bias.astype(jnp.float32)[cdims]
        return jnp.moveaxis(y, 1, -1).astype(dtype)


def timestep_embedding(
    t: jax.Array, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0
) -> jax.Array:
    """Sinusoidal timestep features (diffusers get_timestep_embedding
    semantics, needed for weight parity)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(10000.0)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate(
        [sin, cos], axis=-1
    )
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimeEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    use_time_emb: bool = True
    # diffusers: UNet resnets norm_eps=1e-5, VAE resnets 1e-6 — must match or
    # real-checkpoint VAE encodes drift from the reference pipeline.
    norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, temb: Optional[jax.Array] = None):
        h = GroupNorm32(self.norm_groups, epsilon=self.norm_eps,
                        name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm32(self.norm_groups, epsilon=self.norm_eps,
                        name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class ProjWeights(nn.Module):
    """Projection parameters with nn.Dense's exact tree layout
    (``<name>/kernel`` [+ ``bias``]) but returned as raw arrays, so callers
    can CONCATENATE several projections into one matmul.  XLA does not merge
    separate matmuls on the same input; fusing q/k/v into a (C, 3*inner)
    weight turns three narrow MXU ops (N=320 pads to 3 tiles, 17% waste)
    into one wide one — while checkpoints keep loading by rename only."""

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (in_dim, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


def fused_projection(x, weights, dtype):
    """One matmul through horizontally-concatenated projection weights;
    returns the per-projection outputs (split on the feature axis)."""
    kernels = [k for k, _ in weights]
    w = jnp.concatenate(kernels, axis=1).astype(dtype)
    out = jnp.dot(x.astype(dtype), w)
    if any(b is not None for _, b in weights):
        b = jnp.concatenate(
            [jnp.zeros((k.shape[1],), w.dtype) if b is None else b.astype(dtype)
             for k, b in weights]
        )
        out = out + b
    splits, acc = [], 0
    for k in kernels[:-1]:
        acc += k.shape[1]
        splits.append(acc)
    return jnp.split(out, splits, axis=-1)


class Attention(nn.Module):
    """Multi-head attention (self when context is None, cross otherwise).

    Two compute paths: plain fused-einsum attention at SD latent sizes (XLA's
    softmax pipeline is already HBM-optimal there) and the Pallas flash
    kernel (gswm.ops.attention) once the query sequence reaches
    ``flash_min_seq`` — at SDXL-scale (16k tokens) the O(S^2) logits tensor
    must never materialize.

    Projections are fused: self-attention computes q/k/v in ONE matmul,
    cross-attention fuses k/v (weights are scan constants, so XLA hoists the
    concatenation out of the denoise loop)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    # 1024 measured best end-to-end (4.12 vs 3.88 imgs/sec at 4096): XLA's
    # einsum attention materializes 5.4GB of fp32 logits per level-1 layer
    # call at batch 128.  GSWM_FLASH_MIN_SEQ overrides for A/B experiments
    # and mesh dryruns (read at CALL time so it works however late the env
    # is set relative to module import).
    flash_min_seq: int = 1024

    def _flash_min_seq(self) -> int:
        return int(os.environ.get("GSWM_FLASH_MIN_SEQ", self.flash_min_seq))

    def _use_fused_qkv(self, x) -> bool:
        """Route self-attention to the fused-qkv kernel (projections inside
        the pallas kernel)?  Measured on v5e in context (lax.scan +
        projection producer/consumer, tools/exp_attn_context.py): at
        1024 tokens the fused kernel cuts in-context attention cost 14.2 ->
        6.5 ms/step (the matmul->split->to_bhsd relayout copies around the
        split-projection path dominate there); at 4096 tokens it LOSES
        (54.5 vs 52.8 — the head-resident tier's full-row logits beat the
        copy savings, and the fused kernel's q/k/v scratch forces smaller
        tiles).  Default routing window reflects those measurements;
        GSWM_FUSED_QKV=0 disables, GSWM_FUSED_QKV_MAX_SEQ moves the upper
        edge for A/B runs."""
        if os.environ.get("GSWM_FUSED_QKV") == "0":
            return False
        s = x.shape[1]
        hi = int(os.environ.get("GSWM_FUSED_QKV_MAX_SEQ", "2304"))
        if not (256 <= s <= hi):
            return False
        try:
            mesh = jax.sharding.get_abstract_mesh()
            names = getattr(mesh, "axis_names", ()) or ()
            for ax in ("tp", "sp"):
                if ax in names and mesh.shape[ax] > 1:
                    return False  # head/seq sharding needs the split path
        except Exception:
            pass
        from gswm.ops.attention import fused_qkv_attention_fits

        return fused_qkv_attention_fits(
            s, x.shape[-1], self.heads * self.head_dim, self.dtype)

    def _use_xf(self, x) -> bool:
        """Route self-attention to the plain-XLA flash formulation
        (gswm.ops.attention.xla_flash_attention)?  Same window as cres
        (above fused-qkv, lvl0's 4096+ tokens) — but no Pallas at all: the
        round-5 attribution showed XLA's own fusion emitter schedules the
        qkT+exp+PV chain 17% faster than the Mosaic kernel (37.30 vs
        43.57 ms at b160 lvl0, tools/exp_xla_flash.py, docs/BENCH.md) and
        it needs no k/v channel padding (saves the 320->384 k/v projection
        overhead) and no VMEM-fit gate.  GSWM_XF_ATTN=0 restores the
        Pallas tiers."""
        if os.environ.get("GSWM_XF_ATTN", "1") != "1":
            return False
        s = x.shape[1]
        lo = int(os.environ.get("GSWM_XF_ATTN_MIN_SEQ", "2305"))
        if s < lo:
            return False  # fused-qkv window; below that, einsum
        try:
            mesh = jax.sharding.get_abstract_mesh()
            names = getattr(mesh, "axis_names", ()) or ()
            for ax in ("tp", "sp"):
                if ax in names and mesh.shape[ax] > 1:
                    return False  # head/seq sharding needs the split path
        except Exception:
            pass
        return True

    def _use_cres(self, x) -> bool:
        """Route self-attention to the channel-resident kernel
        (gswm.ops.attention.flash_attention_cres)?  Covers the shapes ABOVE
        the fused-qkv window (lvl0's 4096 tokens) where the split path pays
        the (B,S,H,64)->(BH,S,64) relayout copies: three separate projection
        matmuls feed the kernel in their NATIVE (B,S,C) layout (K/V weight
        columns zero-padded to the 128-lane DMA boundary), heads unroll
        in-kernel on static lane slices, and to_out consumes the (B,S,H*D)
        output in place.  DEFAULT ON since the chip e2e A/B: 5.0656 vs
        5.0376 imgs/sec/chip at 512²/b160/30-step per-pass-sync (runbook
        r4b2 bench512_cres, real Mosaic, 2026-08-19); parity pinned incl.
        ragged shapes in tests/test_cres_attention.py.  GSWM_CRES_ATTN=0
        restores the split path."""
        if os.environ.get("GSWM_CRES_ATTN", "1") != "1":
            return False
        s = x.shape[1]
        lo = int(os.environ.get("GSWM_CRES_ATTN_MIN_SEQ", "2305"))
        if s < lo:
            return False  # fused-qkv window; below that, einsum
        try:
            mesh = jax.sharding.get_abstract_mesh()
            names = getattr(mesh, "axis_names", ()) or ()
            for ax in ("tp", "sp"):
                if ax in names and mesh.shape[ax] > 1:
                    return False  # head/seq sharding needs the split path
        except Exception:
            pass
        from gswm.ops.attention import cres_attention_fits

        return cres_attention_fits(s, self.heads * self.head_dim,
                                   self.dtype, self.head_dim)

    def _use_packed(self, x) -> bool:
        """Route self-attention to the pair-packed kernel (two d=64 heads
        per 128-lane block, one qkv matmul, zero relayouts — see
        ops.attention.flash_attention_packed)?  Covers the shapes ABOVE the
        fused-qkv window (lvl0's 4096 tokens) where the whole-x-in-VMEM
        fused kernel loses but the split path pays ~13 ms/step of
        {1,2,0}->{2,1,0} copies.  GSWM_PACKED_ATTN=1 enables; stays opt-in
        until the kernel is validated through the real Mosaic compiler (it
        was built against a downed tunnel with interpret-mode CI only — an
        unvalidated default could crash the driver's end-of-round bench)."""
        if os.environ.get("GSWM_PACKED_ATTN", "0") != "1":
            return False
        if self.head_dim != 64:
            return False
        s = x.shape[1]
        lo = int(os.environ.get("GSWM_PACKED_ATTN_MIN_SEQ", "2305"))
        if s < lo:
            return False  # fused-qkv window; below that, einsum
        try:
            mesh = jax.sharding.get_abstract_mesh()
            names = getattr(mesh, "axis_names", ()) or ()
            for ax in ("tp", "sp"):
                if ax in names and mesh.shape[ax] > 1:
                    return False  # head/seq sharding needs the split path
        except Exception:
            pass
        # GSWM_PACKED_ATTN_MAX_SEQ=N additionally admits sequences up to N
        # through the pair streaming-K tier (any length; SDXL's 16384) —
        # separate opt-in until that tier is A/B'd against the split path.
        hi = int(os.environ.get("GSWM_PACKED_ATTN_MAX_SEQ", "0"))
        if hi and s <= hi:
            return True
        from gswm.ops.attention import packed_attention_fits

        return packed_attention_fits(s, self.dtype)

    def _use_transposed(self, x) -> bool:
        """Route self-attention to the transposed-operand streaming kernel
        (gswm.ops.attention.flash_attention_transposed)?  Covers the shapes
        ABOVE the fused-qkv window (lvl0's 4096/9216 tokens) where the split
        path pays relayout copies: the ('nc,bsc->nbs') projection output
        feeds the kernel with no split/transpose, and to_out consumes the
        transposed output in place.  GSWM_TRANSPOSED_ATTN=1 enables; stays
        opt-in until the in-context A/B confirms the e2e win."""
        if os.environ.get("GSWM_TRANSPOSED_ATTN", "0") != "1":
            return False
        if self.head_dim % 8:
            return False
        s = x.shape[1]
        lo = int(os.environ.get("GSWM_TRANSPOSED_ATTN_MIN_SEQ", "2305"))
        if s < lo:
            return False  # fused-qkv window; below that, einsum
        try:
            mesh = jax.sharding.get_abstract_mesh()
            names = getattr(mesh, "axis_names", ()) or ()
            for ax in ("tp", "sp"):
                if ax in names and mesh.shape[ax] > 1:
                    return False  # head/seq sharding needs the split path
        except Exception:
            pass
        from gswm.ops.attention import transposed_attention_fits

        return transposed_attention_fits(s, x.shape[0], self.head_dim,
                                         self.dtype)

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        inner = self.heads * self.head_dim
        wq = ProjWeights(inner, name="to_q")(x.shape[-1])
        wk = ProjWeights(inner, name="to_k")(ctx.shape[-1])
        wv = ProjWeights(inner, name="to_v")(ctx.shape[-1])
        # GSWM_FORCE_FLASH=1 forces the kernel paths off-TPU (interpret
        # mode) so kernel numerics are testable on the virtual CPU mesh.
        on_device = (jax.default_backend() == "tpu"
                     or os.environ.get("GSWM_FORCE_FLASH") == "1")
        if (context is None and on_device
                and wq[1] is None and wk[1] is None and wv[1] is None
                and self._use_xf(x)):
            from gswm.ops.attention import xla_flash_attention

            # Three SEPARATE matmuls, each output born in the (B,S,C)
            # layout the chain consumes — and UNPADDED: unlike the Pallas
            # tiers there is no 128-lane DMA boundary, so k/v projections
            # stay at H*D columns (cres pays 320->384, +20% k/v matmul).
            xd = x.astype(self.dtype)
            q = jnp.dot(xd, wq[0].astype(self.dtype))
            k = jnp.dot(xd, wk[0].astype(self.dtype))
            v = jnp.dot(xd, wv[0].astype(self.dtype))
            out = xla_flash_attention(q, k, v, self.heads, self.head_dim)
            wo, bo = ProjWeights(inner, use_bias=True, name="to_out")(inner)
            return jnp.dot(out, wo.astype(self.dtype)) + bo.astype(self.dtype)
        if (context is None and on_device
                and wq[1] is None and wk[1] is None and wv[1] is None
                and self._use_cres(x)):
            from gswm.ops.attention import flash_attention_cres

            pad = (-inner) % 128

            def padw(w):
                w = w.astype(self.dtype)
                return w if pad == 0 else jnp.pad(w, ((0, 0), (0, pad)))

            # Three SEPARATE matmuls: each output is born in the (B,S,C)
            # layout the kernel consumes — no qkv split, no head reshape,
            # no transpose anywhere.  K/V weight columns are zero-padded to
            # the 128-lane DMA boundary (loop-invariant, hoisted).
            xd = x.astype(self.dtype)
            q = jnp.dot(xd, wq[0].astype(self.dtype))
            k = jnp.dot(xd, padw(wk[0]))
            v = jnp.dot(xd, padw(wv[0]))
            out = flash_attention_cres(q, k, v, self.heads, self.head_dim)
            wo, bo = ProjWeights(inner, use_bias=True, name="to_out")(inner)
            return jnp.dot(out, wo.astype(self.dtype)) + bo.astype(self.dtype)
        if (context is None and on_device
                and wq[1] is None and wk[1] is None and wv[1] is None
                and self._use_packed(x)):
            from gswm.ops.attention import flash_attention_packed

            pairs = -(-self.heads // 2)
            cpk = pairs * 128

            def padw(w):
                w = w.astype(self.dtype)
                if cpk == inner:
                    return w
                return jnp.pad(w, ((0, 0), (0, cpk - inner)))

            # One qkv matmul into the pair-packed lane layout; the weight
            # pad/concat is loop-invariant so XLA hoists it out of the scan.
            wqkv = jnp.concatenate([padw(wq[0]), padw(wk[0]), padw(wv[0])],
                                   axis=1)
            out = flash_attention_packed(
                jnp.dot(x.astype(self.dtype), wqkv), self.head_dim)
            # to_out with ROW-padded weights (zero rows under the pad head)
            # instead of slicing the activation back to ``inner`` — the
            # slice would be one more 419MB-class copy per lvl0 site.
            wo, bo = ProjWeights(inner, use_bias=True, name="to_out")(inner)
            wo = wo.astype(self.dtype)
            if cpk != inner:
                wo = jnp.pad(wo, ((0, cpk - inner), (0, 0)))
            return jnp.dot(out, wo) + bo.astype(self.dtype)
        if (context is None and on_device
                and wq[1] is None and wk[1] is None and wv[1] is None
                and self._use_transposed(x)):
            from gswm.ops.attention import flash_attention_transposed

            # One ('nc,bsc->nbs') qkv matmul: (3*inner, B, S) is this dot's
            # NATIVE output layout, and the kernel reads q/k/v as row bands
            # of it — no split, no (B,S,H,D) relayout anywhere.  The weight
            # transpose is loop-invariant (hoisted out of the scan).
            wqkvT = jnp.concatenate(
                [wq[0], wk[0], wv[0]], axis=1).T.astype(self.dtype)
            qkvT = jax.lax.dot_general(
                wqkvT, x.astype(self.dtype), (((1,), (2,)), ((), ())))
            oT = flash_attention_transposed(qkvT, self.heads, self.head_dim)
            wo, bo = ProjWeights(inner, use_bias=True, name="to_out")(inner)
            out = jax.lax.dot_general(
                oT, wo.astype(self.dtype), (((0,), (0,)), ((), ())))
            return out + bo.astype(self.dtype)
        if (context is None and on_device
                and wq[1] is None and wk[1] is None and wv[1] is None
                and self._use_fused_qkv(x)):
            from gswm.ops.attention import flash_attention_fused_qkv

            out = flash_attention_fused_qkv(
                x.astype(self.dtype), wq[0].astype(self.dtype),
                wk[0].astype(self.dtype), wv[0].astype(self.dtype),
                self.heads, self.head_dim)
            return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)

        if context is None:
            # In-context A/B (tools/exp_attn_context.py, v5e, b160 lvl0):
            # three SEPARATE projection matmuls beat the fused qkv matmul +
            # split by ~2.2 ms/site at 4096 tokens — the split's 320-offset
            # feature slices materialize copies that separate matmuls avoid
            # (each output is born in the layout the kernel wants).  Below
            # the flash threshold the einsum path consumes q/k/v unsliced,
            # so the fused matmul stays.  GSWM_SELF_PROJ=separate opts in
            # (default flips once the e2e A/B confirms the in-context win).
            separate = (os.environ.get("GSWM_SELF_PROJ", "fused")
                        == "separate"
                        and x.shape[1] >= self._flash_min_seq()
                        and on_device)
            if separate:
                (q,) = fused_projection(x, (wq,), self.dtype)
                (k,) = fused_projection(x, (wk,), self.dtype)
                (v,) = fused_projection(x, (wv,), self.dtype)
            else:
                q, k, v = fused_projection(x, (wq, wk, wv), self.dtype)
        else:
            (q,) = fused_projection(x, (wq,), self.dtype)
            k, v = fused_projection(ctx, (wk, wv), self.dtype)

        def split(t):
            t = t.reshape(t.shape[0], t.shape[1], self.heads, self.head_dim)
            return with_sharding(t, ("dp", None, "tp", None))

        q, k, v = split(q), split(k), split(v)
        use_flash = q.shape[1] >= self._flash_min_seq() and on_device
        if use_flash:
            from gswm.ops.attention import flash_attention_sharded

            out = flash_attention_sharded(q, k, v)
        else:
            scale = self.head_dim**-0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(out.shape[0], out.shape[1], inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU applies torch.nn.functional.gelu — the EXACT erf
        # gelu (caught by tests/test_block_diffusers_parity.py; flax's
        # default tanh approximation drifts ~1e-3).  Precision-aware choice:
        # fp32 computes the exact erf form; bf16 uses the tanh approximation
        # because its ~1e-3 error is ~8x BELOW bf16's own quantization step
        # (2^-8 at |x|~2) while XLA's erf costs 1.7x the tanh form on the
        # v5e VPU (12.7 vs 7.5 ms at the lvl0 gate, tools/exp_gelu.py).
        exact = jnp.dtype(self.dtype) == jnp.float32
        return h * nn.gelu(gate, approximate=not exact)


class FeedForward(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * 4, dtype=self.dtype, name="net_0")(x)
        h = with_sharding(h, ("dp", None, "tp"))
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        if "sattn" not in _ABLATE:
            x = x + Attention(self.heads, self.head_dim, self.dtype,
                              name="attn1")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            )
        if "xattn" not in _ABLATE:
            x = x + Attention(self.heads, self.head_dim, self.dtype,
                              name="attn2")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context
            )
        if "ff" not in _ABLATE:
            x = x + FeedForward(self.dtype, name="ff")(
                nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
            )
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: norm -> proj_in -> blocks over (H*W) tokens ->
    proj_out, residual.  ``use_linear_projection`` matches SD2.x."""

    heads: int
    head_dim: int
    depth: int = 1
    use_linear_projection: bool = False
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        if "attn" in _ABLATE:
            return x
        b, h, w, c = x.shape
        residual = x
        # diffusers Transformer2DModel hardcodes GroupNorm eps=1e-6
        x = GroupNorm32(self.norm_groups, epsilon=1e-6, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.head_dim, self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    # diffusers' VAE *encoder* downsample pads asymmetrically — F.pad
    # (0,1,0,1) then a VALID stride-2 conv; the UNet downsample is symmetric
    # pad=1.  Getting this wrong shifts every VAE-encoded latent by one pixel
    # of receptive field and breaks extraction parity on real checkpoints.
    asymmetric_pad: bool = False

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding="VALID", dtype=self.dtype, name="conv")(x)
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # nearest x2 as reshape+broadcast: pure layout ops, cheaper than a
        # general gather-based resize
        b, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, h * 2, w * 2, c)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


# Measured crossover on v5e (chunk 8, d=512): einsum 28 ms vs flash 40 ms at
# 4096 tokens; beyond that the quadratic fp32 logits tensor dominates.
_VAE_FLASH_MIN_TOKENS = 4096


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in VAE mid blocks."""

    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        # diffusers VAE mid-block attention group_norm eps=1e-6
        x = GroupNorm32(self.norm_groups, epsilon=1e-6, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        wq = ProjWeights(c, use_bias=True, name="to_q")(c)
        wk = ProjWeights(c, use_bias=True, name="to_k")(c)
        wv = ProjWeights(c, use_bias=True, name="to_v")(c)
        q, k, v = fused_projection(x, (wq, wk, wv), self.dtype)
        # VAE mid-block attention: einsum wins at 512x512's 4096 tokens
        # (28 ms vs 40 ms flash at chunk 8 — the single-head d=512 layout
        # amortizes XLA's softmax pipeline fine); above that the quadratic
        # fp32 logits tensor (2.7GB per chunk at 768x768) forces the
        # blockwise kernel.
        use_flash = h * w > _VAE_FLASH_MIN_TOKENS and (
            jax.default_backend() == "tpu"
            or os.environ.get("GSWM_FORCE_FLASH") == "1"
        )
        # GSWM_VAE_ATTN=chunked: exact attention computed per query chunk
        # under lax.map — O(S*chunk) logits memory AND differentiable.  The
        # pallas flash kernel has no working autodiff rule (its JVP path
        # asserts), which broke jax.value_and_grad through the decoder the
        # first time a VAE fit stage crossed the flash threshold (96x96
        # latents = 9216 tokens, tools/fit_sd21_vae.py round 4).  Fitting
        # sets this mode (gswm.utils.fitting); generation/extraction keep
        # the fast kernel.
        if os.environ.get("GSWM_VAE_ATTN") == "chunked" and h * w > 1024:
            scale = c**-0.5
            chunk = 512
            sq = q.shape[1]
            pad = (-sq) % chunk
            qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0))) if pad else q
            qc = qp.reshape(b, -1, chunk, c).transpose(1, 0, 2, 3)

            def one_chunk(qt):
                logits = jnp.einsum("bqc,bkc->bqk", qt, k) * scale
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32), -1).astype(self.dtype)
                return jnp.einsum("bqk,bkc->bqc", probs, v)

            out = jax.lax.map(one_chunk, qc)
            out = out.transpose(1, 0, 2, 3).reshape(b, -1, c)[:, :sq]
        elif use_flash:
            from gswm.ops.attention import flash_attention

            out = flash_attention(
                q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
            )[:, :, 0, :]
        else:
            logits = jnp.einsum("bqc,bkc->bqk", q, k) * (c**-0.5)
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(
                self.dtype
            )
            out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + residual
