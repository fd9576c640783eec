"""Blockwise (flash) attention for latent self-attention sequences.

The model path (gswm.models.layers.Attention) routes query sequences
>= 1024 tokens here — XLA's einsum attention materializes the O(S^2) fp32
logits tensor in HBM (5.4GB per SD lvl1 layer call at batch 128; simply
impossible at SDXL's 16k tokens), while this kernel keeps everything at
(block_q, block_k) tiles.  Split-layout tiers, chosen by VMEM demand:

  1. head-resident — whole Q/K/V per head in VMEM (SD 512x512, 4096 tok);
  2. KV-resident / Q-streamed — K/V once per head, query tiles pipelined
     through the grid (768x768's 9216 tok);
  3. streaming-K — (q-tile, k-tile) grid with fp32 scratch accumulators,
     any length (SDXL 16k: 68 ms, 80 TFLOP/s measured).

Natural-layout tiers that avoid the split path's relayout copies:

  * **plain-XLA flash (xla_flash_attention, DEFAULT at >= 2305 tokens)** —
    no kernel code at all: one qkT -> clamp/exp -> PV dot_general chain
    with the softmax row-sum riding the PV dot as a ones-column in V, so
    the whole chain is a single XLA kOutput fusion and the O(S^2) logits
    tensor never touches HBM.  The round-5 attribution showed XLA's own
    fusion emitter schedules this chain 17-28% faster than any Mosaic
    tier (92.1 TF/s at 4096 tok vs cres 78.9; 105.9 at 9216 vs split
    kvres; 106.5 at 16k vs streaming-K — docs/BENCH.md round 5).
    GSWM_XF_ATTN=0 restores the Pallas routing below;
  * channel-resident (flash_attention_cres, formerly default at
    2305..4096 tokens) — q/k/v consumed in their native (B,S,C)
    projection layout, K/V DMA'd once per image into single-buffered
    scratch, heads unrolled on static lane slices; measured 48.57 vs
    52.96 ms/step in context at lvl0 512²;
  * fused-qkv (projections in-kernel, DEFAULT in the 256..2304 window);
  * pair-packed and transposed-operand — measured losses, opt-in recorded
    experiments (docs/BENCH.md rounds 3-4).

Softmax: fp32 exp always (Mosaic's bf16 exp measured ~4x slower); on the
bf16 model path the running row-max and its rescale chain are dropped
entirely — logits clamped at 60 cannot overflow the fp32 accumulator, and
the max-reduce passes over the logits matrix were the measured cost.  fp32
inputs keep the exact recurrence (parity oracle / tests).  Below 512 keys
(cross-attention's 77 CLIP tokens) einsum stays: blockwise kernels measured
10-30x SLOWER there (per-grid-step overhead vs tiny per-step work).

Layout: (BH, S, D) with D padded to lane width.  fp32 accumulation
throughout (softmax statistics are precision-critical near the watermark
sign boundary).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on v5e at SD lvl0 shapes (128x4096x5x64), fp32-exp kernel:
# (512,2048) 82.7 ms > (512,1024) 86.1 > (256,4096) 84.6 > (1024,1024) 88.1;
# (1024,2048) crashes the compiler.  Bigger K tiles amortize the softmax
# rescales until VMEM pressure bites.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 2048
# Empirical: the scoped-vmem compiler limit is 16MB and the resident layout
# additionally needs softmax scratch; 8MB of Q/K/V/O (double-buffered) is the
# largest that reliably compiles.  Tests shrink this to force the fallback
# tiers (kv-resident, then streaming-K).
_RESIDENT_VMEM_BUDGET = 8 * 1024 * 1024
# The KV-resident tier's VMEM demand is estimated explicitly (Mosaic buffers
# K/V ~3x even when their block index is constant, and the fori_loop's fp32
# logits/exp temporaries count against scoped vmem — measured 16.5MB at 16k
# tokens against the 16MB ceiling); stay under 14MB to leave slack.
_KVRES_VMEM_BUDGET = 14 * 1024 * 1024

# Softmax exp precision: ALWAYS fp32, never the model dtype.  Measured on
# v5e (A/B, docs/BENCH.md): Mosaic's bf16 exp is the slow path — fp32 exp
# runs SD lvl0 (b128, 4096 tokens) at 83 ms vs 92 ms for bf16 exp, and
# SDXL 16k streaming at 116 ms vs 353 ms.  A cubic exp2 polynomial on
# mul/add lanes (err 1.4e-4) was also tried and measured SLOWER than the
# hardware transcendental (107/117/159 ms vs 83/90/116 ms) — the VPU exp
# unit is not this kernel's bottleneck once inputs are fp32.


# No-max softmax clamp: exp(60) = 1.1e26; a 16k-key row sums to <2e30 and
# the fp32 accumulator tops out around 3.4e38, so overflow is impossible.
# Trained SD attention logits stay well under this (|s| < ~30 post-scale);
# any row that DID exceed the clamp would flatten among its clamped entries.
_NOMAX_CLAMP = 60.0

_LOG2E = 1.4426950408889634


def _base2() -> bool:
    """GSWM_ATTN_EXP2=1: run the online softmax in base 2 — callers fold
    log2(e) into the Q scale (``_softmax_scale``) so the kernels can
    exponentiate with the native ``exp2``, dropping the per-logit ln2
    multiply that ``exp`` performs internally (the logits matrix has
    block_k/d = 32x more entries than the Q tile the scale touches).
    Read at TRACE time: set before the first attention call in a process —
    the module-level jit caches do not key on it (same contract as
    GSWM_ATTN_USE_MAX)."""
    return os.environ.get("GSWM_ATTN_EXP2", "0") == "1"


def _softmax_scale(head_dim: int) -> float:
    """Per-query softmax scale; folds log2(e) in under GSWM_ATTN_EXP2."""
    return head_dim**-0.5 * (_LOG2E if _base2() else 1.0)


def _exp_clamp():
    """(exp_fn, no-max clamp) in the active softmax base."""
    if _base2():
        return jnp.exp2, _NOMAX_CLAMP * _LOG2E
    return jnp.exp, _NOMAX_CLAMP


def _pv_chunks(block_k: int) -> int:
    """GSWM_ATTN_PV_CHUNKS=n: split the no-max body's exp+PV tail into n
    column chunks so the VPU exp of chunk j can overlap the MXU PV matmul
    of chunk j-1 (the QK^T matmul stays full-width for MXU efficiency).
    1 (default) = the monolithic body.  Read at trace time."""
    n = int(os.environ.get("GSWM_ATTN_PV_CHUNKS", "1"))
    if n < 1 or block_k % n:
        return 1
    return n


def _attend_kv_loop(q, k_ref, v_ref, *, block_k: int, valid_k: int,
                    use_max: bool, seq_k: int | None = None):
    """Shared online-softmax recurrence: one (scaled) query tile against
    every key block of k_ref/v_ref (whole head resident in VMEM).  Returns
    the normalized (block_q, d) output tile.  ``k_ref``/``v_ref`` are either
    (1, S, d) block refs or accessor callables ``kb -> (block_k, d)`` (the
    fused-qkv kernel reads lane slices of a packed VMEM scratch).

    ``use_max=False`` (the bf16 model path) drops the running row-max and
    its rescale chain entirely: exp runs on clamped raw logits and the fp32
    accumulator absorbs the dynamic range.  Measured 34.9 ms vs 54.2 ms at
    SD lvl0 (b128, 4096 tokens) — the max-reduce + alpha-rescale passes over
    the logits matrix, not exp itself, were the cost.  fp32 inputs keep the
    exact running max (parity oracle / tests).

    Matmul inputs stay in the model dtype (bf16): the MXU runs native
    low-precision with fp32 accumulation; casting inputs to fp32 would
    silently fall back to multi-pass fp32 matmuls (~4x slower)."""
    block_q, d = q.shape
    if callable(k_ref):
        k_get, v_get = k_ref, v_ref
        assert seq_k is not None
    else:
        seq_k = k_ref.shape[1]

        def k_get(kb):
            return k_ref[0, pl.ds(kb * block_k, block_k), :]

        def v_get(kb):
            return v_ref[0, pl.ds(kb * block_k, block_k), :]

    p_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def masked(s, kb):
        if valid_k != seq_k:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(col < valid_k, s, -1e30)
        return s

    exp, clamp = _exp_clamp()
    n_pv = _pv_chunks(block_k)
    ck = block_k // n_pv

    def body_nomax(kb, carry):
        _, l, acc = carry
        k = k_get(kb)
        v = v_get(kb)
        s = masked(jnp.dot(q, k.T, preferred_element_type=jnp.float32), kb)
        for j in range(n_pv):
            sj = s[:, j * ck:(j + 1) * ck] if n_pv > 1 else s
            vj = v[j * ck:(j + 1) * ck] if n_pv > 1 else v
            p = exp(jnp.minimum(sj, clamp))
            l = l + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jnp.dot(p.astype(v.dtype), vj,
                                preferred_element_type=jnp.float32)
        return m0, l, acc

    def body_max(kb, carry):
        m, l, acc = carry
        k = k_get(kb)
        v = v_get(kb)
        s = masked(jnp.dot(q, k.T, preferred_element_type=jnp.float32), kb)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # s - m_new <= 0 so exp lands in [0,1]; bf16 weights cost <0.4%.
        p = exp(s - m_new).astype(p_dtype)
        alpha = exp(m - m_new)
        l_new = l * alpha + jnp.sum(p.astype(jnp.float32), axis=-1,
                                    keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    body = body_max if use_max else body_nomax
    _, l, acc = jax.lax.fori_loop(0, seq_k // block_k, body, (m0, l0, acc0))
    return acc / l


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q: int, block_k: int,
                  scale: float, valid_k: int, use_max: bool):
    """One whole head per grid step: Q/K/V sit in VMEM once (no per-q-tile
    K/V refetch from HBM — at 4096 tokens the old per-tile layout moved 16x
    the necessary K/V bytes) and the online-softmax loop runs over VMEM.
    ``valid_k`` (static) masks the zero-padded tail of the key sequence."""
    seq_q = q_ref.shape[1]

    def q_tile(qi, _):
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
        out = _attend_kv_loop(q, k_ref, v_ref, block_k=block_k,
                              valid_k=valid_k, use_max=use_max)
        o_ref[0, pl.ds(qi * block_q, block_q), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, seq_q // block_q, q_tile, 0)


def _flash_kernel_kvres(q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                        scale: float, valid_k: int, use_max: bool):
    """KV-resident / Q-streamed tier: grid (bh, n_q_tiles) with K/V block
    index constant along the q dimension, so Pallas fetches each head's K/V
    from HBM once and pipelines query tiles through it.  Fills the gap
    between the whole-head-resident layout (needs Q+K+V in VMEM — too big at
    768x768's 9216 tokens) and streaming-K (refetch-free but pays scratch
    rescales per (q,k) grid step): HBM traffic stays optimal while VMEM only
    holds K, V and one q/o tile."""
    q = q_ref[0]
    q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
    out = _attend_kv_loop(q, k_ref, v_ref, block_k=block_k, valid_k=valid_k,
                          use_max=use_max)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "valid_k", "interpret")
)
def _flash_bhsd(q, k, v, block_q: int, block_k: int, valid_k: int,
                interpret: bool = False):
    bh, s, d = q.shape
    sk = k.shape[1]
    scale = _softmax_scale(d)
    itemsize = jnp.dtype(q.dtype).itemsize
    # bf16 model path drops the running max (see _attend_kv_loop); fp32
    # inputs keep the exact recurrence for the parity oracle.
    # GSWM_ATTN_USE_MAX=1 forces the exact running-max path for bf16 too —
    # the escape hatch for non-SD weights whose logits might exceed the
    # no-max clamp (trained SD stays |s| < ~30; the clamp is 60).
    use_max = (q.dtype != jnp.bfloat16
               or os.environ.get("GSWM_ATTN_USE_MAX") == "1")

    # VMEM budget: Pallas double-buffers every grid input, so the
    # head-resident layout costs ~2*(Q+K+V+O) bytes.  Above the budget fall
    # back to the KV-resident tier (K/V once per head, q tiles streamed —
    # covers 768x768's 9216 tokens and SDXL's 16k), then to streaming K/V.
    # GSWM_FLASH_TIER forces a tier (resident|kvres|streamk) for A/B
    # experiments; unset = the VMEM-driven policy below.
    force_tier = os.environ.get("GSWM_FLASH_TIER")
    resident_bytes = 2 * (2 * s + 2 * sk) * d * itemsize
    if (resident_bytes <= _RESIDENT_VMEM_BUDGET
            if force_tier is None else force_tier == "resident"):
        grid = (bh,)
        kernel = functools.partial(_flash_kernel, block_q=block_q,
                                   block_k=block_k, scale=scale,
                                   valid_k=valid_k, use_max=use_max)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, s, d), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, s, d), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(q, k, v)

    kvres_bytes = (
        3 * 2 * sk * d * itemsize          # K + V, ~triple-buffered
        + 2 * 2 * block_q * d * itemsize   # q/o tiles, double-buffered
        + 2 * block_q * block_k * 4        # fp32 logits + exp temporaries
        + block_q * d * 4                  # fp32 accumulator
    )
    if ((kvres_bytes <= _KVRES_VMEM_BUDGET
         if force_tier is None else force_tier == "kvres")
            and s % block_q == 0):
        kernel = functools.partial(_flash_kernel_kvres, block_k=block_k,
                                   scale=scale, valid_k=valid_k,
                                   use_max=use_max)
        return pl.pallas_call(
            kernel,
            grid=(bh, s // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                # constant along i: fetched once per head, stays resident
                pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(q, k, v)

    # Long-sequence path: stream K/V block-by-block through a third
    # (sequential, innermost) grid dimension with fp32 scratch accumulators —
    # VMEM holds only one (block_q, d) query tile and one (block_k, d) K/V
    # tile at a time, so this scales to any sequence length.
    kernel = functools.partial(_flash_kernel_streamk, scale=scale,
                               valid_k=valid_k, block_k=block_k,
                               use_max=use_max)
    return pl.pallas_call(
        kernel,
        grid=(bh, s // block_q, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, kb: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, kb: (b, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, kb: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _flash_kernel_streamk(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                          *, scale: float, valid_k: int, block_k: int,
                          use_max: bool):
    """Streaming-K flash step: one (q-tile, k-tile) pair per grid step; the
    innermost grid dim walks k-tiles sequentially, so scratch persists.
    ``use_max=False`` (bf16) skips the running max + rescale chain like
    _attend_kv_loop does."""
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)
    block_q = q_ref.shape[1]

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    if valid_k % block_k:
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < valid_k, s, -1e30)
    p_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    exp, clamp = _exp_clamp()
    if use_max:
        m = m_ref[:]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = exp(s - m_new).astype(p_dtype)
        alpha = exp(m - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p.astype(jnp.float32), axis=-1,
                                              keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_ref[:] = m_new
    else:
        p = exp(jnp.minimum(s, clamp))
        l_ref[:] = l_ref[:] + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


def flash_attention(
    q, k, v,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
):
    """(B, S, H, D) q/k/v -> (B, S, H, D) attention output.

    Pallas on TPU; interpreter mode elsewhere (tests).  Sequences are padded
    to the block size; padded key positions are masked inside the kernel
    (valid_k is static), padded query rows are sliced off the output.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # None defaults (vs =DEFAULT_*) so an explicit block_k equal to the
    # default is distinguishable from "no preference" — only the latter
    # gets the full-row K-block override below (ADVICE r2).
    explicit_block_k = block_k is not None
    block_q = DEFAULT_BLOCK_Q if block_q is None else block_q
    block_k = DEFAULT_BLOCK_K if block_k is None else block_k
    b, sq, h, d = q.shape
    sk = k.shape[1]

    # Small key sets (cross-attention: 77 CLIP tokens) stay on XLA's einsum.
    # Measured on v5e (SD lvl0, b128): einsum 33-52 ms; a dedicated
    # single-pass pallas kernel was tried in BOTH layouts — q-tiled grid
    # (590 ms) and whole-Q-per-head grid (977 ms) — the per-grid-step
    # pipeline overhead swamps the tiny per-step work, so blockwise
    # machinery LOSES when the logits tensor is this small.
    if sk < 512:
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)

    bq = min(block_q, max(128, 1 << (sq - 1).bit_length()))
    bq = min(bq, block_q)
    bk = min(block_k, max(128, 1 << (sk - 1).bit_length()))
    bk = min(bk, block_k)
    if not explicit_block_k:
        # When the whole head fits VMEM (resident tier), full-row K blocks
        # collapse the online loop to one iteration: 43.0 ms vs 45.7 at SD
        # lvl0 (b128, 4096 tokens).  Capped at 4096 so the fp32 logits tile
        # stays inside scoped VMEM; explicit block_k overrides win.
        itemsize = jnp.dtype(q.dtype).itemsize
        sk_pad = max(128, 1 << (sk - 1).bit_length())
        sq_pad = -(-sq // bq) * bq
        if 2 * (2 * sq_pad + 2 * sk_pad) * d * itemsize <= _RESIDENT_VMEM_BUDGET:
            bk = min(4096, sk_pad)
        elif sk <= 12288:
            # KV-resident regime (768-class shapes): bk=1024 measured best
            # at 9216 tokens — 49.8 ms vs 51.7 at bk=2048 (69.8 TF/s,
            # tools/exp_attn_tiers.py); larger K tiles only help when the
            # whole row collapses to one iteration.
            bk = 1024

    def to_bhsd(t):
        return jnp.transpose(t, (0, 2, 1, 3)).reshape(b * h, t.shape[1], d)

    qb = to_bhsd(q)
    kb = to_bhsd(k)
    vb = to_bhsd(v)

    qb, sq0 = _pad_to(qb, 1, bq)
    kb, sk0 = _pad_to(kb, 1, bk)
    vb, _ = _pad_to(vb, 1, bk)

    out = _flash_bhsd(qb, kb, vb, bq, bk, valid_k=sk0, interpret=interpret)
    out = out[:, :sq0, :]
    return jnp.transpose(out.reshape(b, h, sq0, d), (0, 2, 1, 3))


def _fused_qkv_kernel(x_hbm, wq_ref, wk_ref, wv_ref, o_ref,
                      x_vmem, q_vmem, k_vmem, v_vmem, sem, *, block_q: int,
                      block_k: int, heads: int, head_dim: int, scale: float,
                      valid_k: int, use_max: bool):
    """Self-attention with the q/k/v projections fused into the kernel.

    Round-3 trace finding (docs/BENCH.md): the matmul->split->to_bhsd
    relayouts around the flash kernel cost ~2.5 s of a 35 s extraction pass
    — XLA materializes {1,2,0}->{2,1,0} copies on every 419 MB q/k/v tensor
    because the projection's natural output layout never matches the
    (BH, S, D) custom-call operand layout.  Head-dim 64 also makes every
    per-head lane slice 64-offset (misaligned to the 128-lane tile), so the
    split can't be a bitcast either.  Fusing the projections sidesteps the
    whole problem: x streams in ONCE in its native (B, S, C) layout via a
    manual DMA, K/V are computed once per image into VMEM scratch, q tiles
    are projected on the fly, and heads are unrolled in-kernel with STATIC
    lane slices (measured free — the round-2 transpose-free A/B tied).
    Output lands as (B, S, H*D), which feeds to_out with no relayout.

    Grid (B, n_q_tiles); i==0 does the x DMA + K/V projection for image b.
    """
    i = pl.program_id(1)
    b = pl.program_id(0)
    dtype = o_ref.dtype
    chunk = x_vmem.shape[0]
    s_pad = k_vmem.shape[0]
    # chunk must tile the padded sequence exactly, else the tail K/V rows
    # inside valid_k are never projected (garbage keys — the s_pad=2304
    # bug caught by interpret-mode NaN scratch, round 3)
    assert s_pad % chunk == 0, (s_pad, chunk)

    @pl.when(i == 0)
    def _():
        # Stream x through a small chunk buffer (whole-x scratch would blow
        # the 16MB scoped-vmem budget at 4096 tokens) and project q/k/v
        # rows incrementally.
        def load(ci, _):
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(ci * chunk, chunk), :], x_vmem, sem)
            cp.start()
            cp.wait()
            xc = x_vmem[:]
            rows = pl.ds(ci * chunk, chunk)
            q_vmem[rows] = jnp.dot(
                xc, wq_ref[:], preferred_element_type=jnp.float32
            ).astype(dtype)
            k_vmem[rows] = jnp.dot(
                xc, wk_ref[:], preferred_element_type=jnp.float32
            ).astype(dtype)
            v_vmem[rows] = jnp.dot(
                xc, wv_ref[:], preferred_element_type=jnp.float32
            ).astype(dtype)
            return 0

        jax.lax.fori_loop(0, s_pad // chunk, load, 0)

    q_tile = q_vmem[pl.ds(i * block_q, block_q), :]
    seq_k = s_pad
    for h in range(heads):
        lo = h * head_dim
        q = q_tile[:, lo:lo + head_dim]
        q = (q.astype(jnp.float32) * scale).astype(dtype)

        def k_get(kb, lo=lo):
            return k_vmem[pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        def v_get(kb, lo=lo):
            return v_vmem[pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        out = _attend_kv_loop(q, k_get, v_get, block_k=block_k,
                              valid_k=valid_k, use_max=use_max, seq_k=seq_k)
        o_ref[0, :, lo:lo + head_dim] = out.astype(dtype)


def _fused_qkv_kernel_seqhead(x_hbm, wq_ref, wk_ref, wv_ref, o_ref,
                              x_vmem, k_vmem, v_vmem, sem, *, block_q: int,
                              block_k: int, heads: int, head_dim: int,
                              scale: float, valid_k: int, use_max: bool):
    """Sequential-head fused-qkv layout for sequences whose all-heads q/k/v
    scratch would not fit VMEM (lvl0's 4096 tokens).  Grid (B,): x is DMA'd
    once per image into persistent scratch, then a STATIC python loop walks
    heads — each head projects only its own (S, d) k/v slice into small
    scratch (total projection FLOPs unchanged vs the split path) and q
    tiles on the fly.  All lane offsets are static (Mosaic rejects
    program_id-indexed lane slices), and the output block stays (1, S, H*D)
    so to_out consumes it with no relayout."""
    b = pl.program_id(0)
    dtype = o_ref.dtype
    s_pad = k_vmem.shape[0]
    cp = pltpu.make_async_copy(x_hbm.at[b], x_vmem, sem)
    cp.start()
    cp.wait()
    for h in range(heads):
        lo = h * head_dim
        x = x_vmem[:]
        k_vmem[:] = jnp.dot(x, wk_ref[:, lo:lo + head_dim],
                            preferred_element_type=jnp.float32).astype(dtype)
        v_vmem[:] = jnp.dot(x, wv_ref[:, lo:lo + head_dim],
                            preferred_element_type=jnp.float32).astype(dtype)

        def q_tile(qi, _, lo=lo):
            xt = x_vmem[pl.ds(qi * block_q, block_q), :]
            q = jnp.dot(xt, wq_ref[:, lo:lo + head_dim],
                        preferred_element_type=jnp.float32)
            q = (q * scale).astype(dtype)

            def k_get(kb):
                return k_vmem[pl.ds(kb * block_k, block_k), :]

            def v_get(kb):
                return v_vmem[pl.ds(kb * block_k, block_k), :]

            out = _attend_kv_loop(q, k_get, v_get, block_k=block_k,
                                  valid_k=valid_k, use_max=use_max,
                                  seq_k=s_pad)
            o_ref[0, pl.ds(qi * block_q, block_q),
                  lo:lo + head_dim] = out.astype(dtype)
            return 0

        jax.lax.fori_loop(0, s_pad // block_q, q_tile, 0)


# The fused kernel holds Q + K + V scratch (+ logits temporaries) in VMEM
# at once; this budget gates which (block_q, block_k) fit — and whether the
# shape routes here at all (512-class lvl0/lvl1 fit, a 9216-token 768-class
# lvl0 or SDXL 16k does not and falls back to the split-projection tiers).
# Calibrated against real Mosaic outcomes: lvl1 (S=1024, c=640) at blocks
# (512,1024) estimates 13.7MB and compiles+runs; lvl0 (S=4096, c=320) at
# (512,1024) estimates 14.5MB and hits the 16MB scoped-vmem ceiling at
# 17.29MB (Mosaic adds ~2.8MB of its own buffering over this estimate).
_FUSED_QKV_VMEM_BUDGET = int(13.8 * 1024 * 1024)
_FUSED_QKV_BLOCKS = ((512, 1024), (512, 512), (256, 512), (256, 256),
                     (128, 256), (128, 128))


def _fused_qkv_need(s_pad, c_pad, inner, bq, bk, itemsize):
    return (
        min(512, s_pad) * c_pad * itemsize   # x chunk buffer
        + 3 * s_pad * inner * itemsize       # Q + K + V scratch
        + 3 * c_pad * inner * itemsize       # weight blocks (const index)
        + 2 * bq * inner * itemsize          # o block (double-buffered)
        + 2 * bq * bk * 4                    # fp32 logits + exp temporaries
        + bq * inner * 4                     # fp32 accumulator slices
    )


def _fused_qkv_blocks(s_pad, c_pad, inner, itemsize):
    """Largest (block_q, block_k) whose VMEM estimate fits, or None."""
    for bq, bk in _FUSED_QKV_BLOCKS:
        if s_pad % bq or s_pad % bk:
            continue
        if (_fused_qkv_need(s_pad, c_pad, inner, bq, bk, itemsize)
                <= _FUSED_QKV_VMEM_BUDGET):
            return bq, bk
    return None


_SEQHEAD_BLOCKS = ((256, 2048), (256, 1024), (256, 512), (128, 512),
                   (128, 256))
# (256,1024) at lvl0/b160 missed the 16MB ceiling by 16KB (16.02M real vs
# a 12.7M estimate — Mosaic adds ~3.3MB here); the seqhead layout needs
# its own, tighter budget than the all-heads kernel.
_SEQHEAD_VMEM_BUDGET = int(12.5 * 1024 * 1024)


def _seqhead_need(s_pad, c_pad, inner, head_dim, bq, bk, itemsize):
    return (
        s_pad * c_pad * itemsize             # x scratch (single, manual DMA)
        + 2 * s_pad * head_dim * itemsize    # per-head K + V scratch
        + 2 * s_pad * inner * itemsize       # o block (double-buffered)
        + 3 * c_pad * inner * itemsize       # weight blocks (const index)
        + 2 * bq * bk * 4                    # fp32 logits + exp temporaries
        + bq * max(inner, bk) * 4            # fp32 accumulator/q temporaries
    )


def _seqhead_blocks(s_pad, c_pad, inner, head_dim, itemsize):
    for bq, bk in _SEQHEAD_BLOCKS:
        if s_pad % bq or s_pad % bk:
            continue
        if (_seqhead_need(s_pad, c_pad, inner, head_dim, bq, bk, itemsize)
                <= _SEQHEAD_VMEM_BUDGET):
            return bq, bk
    return None


def fused_qkv_attention_fits(seq: int, channels: int, inner: int,
                             dtype=jnp.bfloat16, head_dim: int = 64) -> bool:
    itemsize = jnp.dtype(dtype).itemsize
    # EXACTLY the caller's padding rule (flash_attention_fused_qkv): a
    # smaller pad here could approve a shape whose padded form then finds
    # no dividing block config and raises instead of falling back.
    pad_unit = 256 if seq >= 256 else max(128, 1 << (seq - 1).bit_length())
    s_pad = -(-seq // pad_unit) * pad_unit
    c_pad = -(-channels // 128) * 128
    return (_fused_qkv_blocks(s_pad, c_pad, inner, itemsize) is not None
            or _seqhead_blocks(s_pad, c_pad, inner, head_dim, itemsize)
            is not None)


@functools.partial(
    jax.jit, static_argnames=("heads", "head_dim", "block_q", "block_k",
                              "interpret")
)
def flash_attention_fused_qkv(x, wq, wk, wv, heads: int, head_dim: int,
                              block_q: int | None = None,
                              block_k: int | None = None,
                              interpret: bool | None = None):
    """(B, S, C) x + (C, H*D) q/k/v weights -> (B, S, H*D) attention output.

    The q/k/v projections run INSIDE the kernel (see _fused_qkv_kernel for
    why); numerics match project->flash_attention exactly (same dots, same
    online softmax).  No biases: SD/SDXL attention projections are
    bias-free (diffusers Attention default, /root/reference pipelines).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, c = x.shape
    inner = heads * head_dim
    scale = _softmax_scale(head_dim)
    itemsize = jnp.dtype(x.dtype).itemsize
    pad_unit = 256 if s >= 256 else max(128, 1 << (s - 1).bit_length())
    x_pad, s0 = _pad_to(x, 1, pad_unit)
    # Mosaic DMA slices must be 128-lane aligned; SD channel counts (320)
    # are not.  Pad channels to the tile boundary — physically ~free (the
    # HBM layout already pads lanes to the tile) — and zero-pad the weight
    # ROWS to match: dot(x_pad, w_pad) == dot(x, w) exactly.
    x_pad, _ = _pad_to(x_pad, 2, 128)
    c_pad = x_pad.shape[2]
    if c_pad != c:
        zp = ((0, c_pad - c), (0, 0))
        wq = jnp.pad(wq, zp)
        wk = jnp.pad(wk, zp)
        wv = jnp.pad(wv, zp)
    s_pad = x_pad.shape[1]
    use_max = (x.dtype != jnp.bfloat16
               or os.environ.get("GSWM_ATTN_USE_MAX") == "1")
    mode = os.environ.get("GSWM_FUSED_QKV_MODE", "")
    blocks = (None if mode == "seqhead"
              else _fused_qkv_blocks(s_pad, c_pad, inner, itemsize))
    if blocks is not None:
        bq = blocks[0] if block_q is None else block_q
        bk = blocks[1] if block_k is None else block_k
        bq, bk = min(bq, s_pad), min(bk, s_pad)
        kernel = functools.partial(
            _fused_qkv_kernel, block_q=bq, block_k=bk, heads=heads,
            head_dim=head_dim, scale=scale, valid_k=s0, use_max=use_max)
        out = pl.pallas_call(
            kernel,
            grid=(b, s_pad // bq),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # x in HBM; manual DMA
                pl.BlockSpec((c_pad, inner), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_pad, inner), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c_pad, inner), lambda bi, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, inner), lambda bi, i: (bi, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, s_pad, inner), x.dtype),
            scratch_shapes=[
                # x DMA chunk: must DIVIDE s_pad (s_pad is always a multiple
                # of 256 or a power of two below it) — min(512, s_pad) left
                # the 2304-token tail unprojected (garbage K/V rows inside
                # valid_k; found by interpret-mode NaN scratch, round 3)
                pltpu.VMEM((min(512 if s_pad % 512 == 0 else 256, s_pad),
                            c_pad), x.dtype),
                pltpu.VMEM((s_pad, inner), x.dtype),            # q
                pltpu.VMEM((s_pad, inner), x.dtype),            # k
                pltpu.VMEM((s_pad, inner), x.dtype),            # v
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(x_pad, wq, wk, wv)
        return out[:, :s0, :]

    sh = _seqhead_blocks(s_pad, c_pad, inner, head_dim, itemsize)
    if sh is None:
        raise ValueError(
            f"fused qkv attention does not fit VMEM at seq={s}, "
            f"channels={c}, inner={inner} — gate with "
            "fused_qkv_attention_fits() and fall back to flash_attention")
    bq = sh[0] if block_q is None else block_q
    bk = sh[1] if block_k is None else block_k
    bq, bk = min(bq, s_pad), min(bk, s_pad)
    kernel = functools.partial(
        _fused_qkv_kernel_seqhead, block_q=bq, block_k=bk, heads=heads,
        head_dim=head_dim, scale=scale, valid_k=s0, use_max=use_max)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x in HBM; manual DMA
            pl.BlockSpec((c_pad, inner), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, inner), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, inner), lambda bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, inner), lambda bi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, inner), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((s_pad, c_pad), x.dtype),      # x (whole image)
            pltpu.VMEM((s_pad, head_dim), x.dtype),   # per-head k
            pltpu.VMEM((s_pad, head_dim), x.dtype),   # per-head v
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad, wq, wk, wv)
    return out[:, :s0, :]


def _flash_kernel_pair(q_ref, k_ref, v_ref, o_ref, *, block_q: int,
                       block_k: int, scale: float, valid_k: int,
                       use_max: bool, head_dim: int):
    """Two d=64 heads per 128-lane grid block (the pair-packed layout).

    The halves are STATIC lane slices of the resident (1, S, 128) blocks
    (measured free in the fused-qkv kernel); each half runs the same online
    softmax recurrence as the head-resident tier.  A zero pair half (odd
    head counts pad the projection WEIGHTS with zero columns) produces
    uniform-softmax x zero values = zero output — no masking needed, and
    to_out's matching zero rows drop it.
    """
    seq_q = q_ref.shape[1]
    seq_k = k_ref.shape[1]
    for lo in (0, head_dim):  # static unroll: the two packed heads

        def k_get(kb, lo=lo):
            return k_ref[0, pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        def v_get(kb, lo=lo):
            return v_ref[0, pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        def q_tile(qi, _, lo=lo, k_get=k_get, v_get=v_get):
            q = q_ref[0, pl.ds(qi * block_q, block_q), lo:lo + head_dim]
            q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
            out = _attend_kv_loop(q, k_get, v_get, block_k=block_k,
                                  valid_k=valid_k, use_max=use_max,
                                  seq_k=seq_k)
            o_ref[0, pl.ds(qi * block_q, block_q),
                  lo:lo + head_dim] = out.astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, seq_q // block_q, q_tile, 0)


def _flash_kernel_pair_kvres(q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                             scale: float, valid_k: int, use_max: bool,
                             head_dim: int):
    """Pair-packed KV-resident tier: grid (B*P, n_q_tiles) with the pair's
    K/V (1, S, 128) blocks constant along the q dimension (fetched once per
    pair, like _flash_kernel_kvres) and one (1, block_q, 128) q/o tile per
    step.  Covers the 768-class 9216-token shape where the pair-resident
    layout (q+k+v+o all in VMEM) exceeds the budget."""
    seq_k = k_ref.shape[1]
    for lo in (0, head_dim):  # static unroll: the two packed heads

        def k_get(kb, lo=lo):
            return k_ref[0, pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        def v_get(kb, lo=lo):
            return v_ref[0, pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        q = q_ref[0, :, lo:lo + head_dim]
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
        out = _attend_kv_loop(q, k_get, v_get, block_k=block_k,
                              valid_k=valid_k, use_max=use_max, seq_k=seq_k)
        o_ref[0, :, lo:lo + head_dim] = out.astype(o_ref.dtype)


def _flash_kernel_pair_streamk(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                               acc_ref, *, scale: float, valid_k: int,
                               block_k: int, use_max: bool, head_dim: int):
    """Pair-packed streaming-K tier: one (q-tile, k-tile) pair per grid step
    with the innermost grid dim walking k-tiles sequentially (scratch
    persists), like _flash_kernel_streamk but on (1, *, 128) pair blocks.
    The two 64-lane halves keep separate m/l scratch COLUMNS and separate
    accumulator LANE ranges.  Scales to any sequence (SDXL's 16384) with
    the packed layout's zero-relayout property."""
    kb = pl.program_id(2)
    n_kb = pl.num_programs(2)
    block_q = q_ref.shape[1]

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    exp, clamp = _exp_clamp()
    for idx, lo in enumerate((0, head_dim)):  # static unroll: the two heads
        half = slice(lo, lo + head_dim)
        col_l = slice(idx, idx + 1)
        q = q_ref[0, :, half]
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0, :, half]
        v = v_ref[0, :, half]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        if valid_k % block_k:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col < valid_k, s, -1e30)
        if use_max:
            m = m_ref[:, col_l]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = exp(s - m_new).astype(p_dtype)
            alpha = exp(m - m_new)
            l_ref[:, col_l] = l_ref[:, col_l] * alpha + jnp.sum(
                p.astype(jnp.float32), axis=-1, keepdims=True)
            acc_ref[:, half] = acc_ref[:, half] * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            m_ref[:, col_l] = m_new
        else:
            p = exp(jnp.minimum(s, clamp))
            l_ref[:, col_l] = l_ref[:, col_l] + jnp.sum(p, axis=-1,
                                                        keepdims=True)
            acc_ref[:, half] = acc_ref[:, half] + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kb == n_kb - 1)
    def _():
        for idx, lo in enumerate((0, head_dim)):
            o_ref[0, :, lo:lo + head_dim] = (
                acc_ref[:, lo:lo + head_dim] / l_ref[:, idx:idx + 1]
            ).astype(o_ref.dtype)


_PACKED_VMEM_BUDGET = 13 * 1024 * 1024


def _packed_resident_bytes(s_pad: int, itemsize: int) -> int:
    """Pair-resident layout: (1, S_pad, 128) q/k/v/o blocks, double-buffered
    by Pallas (8 block-arrays total), plus the fp32 logits + exp tile."""
    return 8 * s_pad * 128 * itemsize + 256 * 1024 * 8


def _packed_kvres_bytes(s_pad: int, itemsize: int, block_q: int = 256,
                        block_k: int = 1024) -> int:
    """Pair KV-resident / q-streamed layout: K+V (1, S_pad, 128) blocks
    double-buffered, q/o (1, block_q, 128) tiles double-buffered, fp32
    logits + exp temporary, fp32 accumulator."""
    return (4 * s_pad * 128 * itemsize
            + 4 * block_q * 128 * itemsize
            + 2 * block_q * block_k * 4
            + block_q * 64 * 4)


def packed_attention_fits(seq: int, dtype=jnp.bfloat16) -> bool:
    """Does any pair-packed layout fit VMEM at this sequence?

    Resident tier: 8*S*128*itemsize + logits.  4096 tokens bf16 = 8.4 MB +
    2 MB -> fits; 9216 (768-class lvl0) = 18.9 MB -> no.  The KV-resident
    tier (K/V per pair resident, q tiles streamed) covers 9216 at 11.8 MB;
    SDXL's 16384 (16.9 MB) returns False here and stays on the split flash
    path by default — flash_attention_packed itself falls through to a pair
    streaming-K tier at ANY length (model opt-in: GSWM_PACKED_ATTN_MAX_SEQ).
    """
    itemsize = jnp.dtype(dtype).itemsize
    s_res = -(-seq // 256) * 256
    if _packed_resident_bytes(s_res, itemsize) <= _PACKED_VMEM_BUDGET:
        return True
    s_kv = -(-seq // 1024) * 1024
    return _packed_kvres_bytes(s_kv, itemsize) <= _PACKED_VMEM_BUDGET


@functools.partial(
    jax.jit, static_argnames=("head_dim", "block_q", "block_k", "interpret")
)
def flash_attention_packed(qkv, head_dim: int = 64,
                           block_q: int | None = None,
                           block_k: int | None = None,
                           interpret: bool | None = None):
    """Pair-packed self-attention: one (B, S, 3*P*128) qkv array -> (B, S, P*128).

    Lane layout: q heads at [0, P*128), k at [P*128, 2*P*128), v at
    [2*P*128, 3*P*128); within each, heads (2p, 2p+1) at [128p, 128p+128) —
    which is exactly the natural (B, S, H*64) projection output order, so
    for even head counts the packed layout IS the qkv matmul output and for
    odd counts only the projection WEIGHTS are zero-padded (free: folded at
    compile time).  The SAME array is passed as three pallas operands whose
    index maps select the q/k/v 128-lane groups, so there is no split, no
    reshape, no transpose, and no 64-offset lane slice anywhere in the XLA
    graph — the relayout copies that cost ~13 ms/step around the lvl0
    split-projection path (docs/BENCH.md round-3 copy budget) vanish.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, c3 = qkv.shape
    assert c3 % (3 * 128) == 0 and head_dim == 64, (c3, head_dim)
    pairs = c3 // (3 * 128)
    scale = _softmax_scale(head_dim)
    use_max = (qkv.dtype != jnp.bfloat16
               or os.environ.get("GSWM_ATTN_USE_MAX") == "1")
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # Tier choice mirrors _flash_bhsd: pair-resident while q+k+v+o fit VMEM
    # (through 4096 tokens), else pair KV-resident / q-streamed (through
    # 9216).  GSWM_PACKED_TIER forces one (resident|kvres) for A/B tests.
    force_tier = os.environ.get("GSWM_PACKED_TIER")
    s_r = -(-s // 256) * 256
    use_resident = (
        _packed_resident_bytes(s_r, itemsize) <= _PACKED_VMEM_BUDGET
        if force_tier is None else force_tier == "resident")

    if use_resident:
        bq = 256 if block_q is None else block_q
        bk = (min(2048, 1 << (s - 1).bit_length())
              if block_k is None else block_k)
        qkvp, s0 = _pad_to(qkv, 1, max(bq, bk))
        s_pad = qkvp.shape[1]
        kernel = functools.partial(_flash_kernel_pair, block_q=bq,
                                   block_k=bk, scale=scale, valid_k=s0,
                                   use_max=use_max, head_dim=head_dim)

        def spec(group):
            return pl.BlockSpec(
                (1, s_pad, 128),
                lambda g, group=group: (g // pairs, 0,
                                        group * pairs + g % pairs),
                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kernel,
            grid=(b * pairs,),
            in_specs=[spec(0), spec(1), spec(2)],
            out_specs=pl.BlockSpec((1, s_pad, 128),
                                   lambda g: (g // pairs, 0, g % pairs),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, s_pad, pairs * 128),
                                           qkv.dtype),
            interpret=interpret,
        )(qkvp, qkvp, qkvp)
        return out[:, :s0, :]

    # Pair KV-resident tier (the 768-class 9216-token shape).
    bq = 256 if block_q is None else block_q
    bk = (min(1024, 1 << (s - 1).bit_length())
          if block_k is None else block_k)
    qkvp, s0 = _pad_to(qkv, 1, max(bq, bk))
    s_pad = qkvp.shape[1]
    use_kvres = (
        _packed_kvres_bytes(s_pad, itemsize, bq, bk) <= _PACKED_VMEM_BUDGET
        if force_tier is None else force_tier == "kvres")
    if use_kvres:
        kernel = functools.partial(_flash_kernel_pair_kvres, block_k=bk,
                                   scale=scale, valid_k=s0, use_max=use_max,
                                   head_dim=head_dim)

        def spec_kv(group):
            # constant along the q-tile dimension: fetched once per pair
            return pl.BlockSpec(
                (1, s_pad, 128),
                lambda g, qi, group=group: (g // pairs, 0,
                                            group * pairs + g % pairs),
                memory_space=pltpu.VMEM)

        qo_spec = pl.BlockSpec((1, bq, 128),
                               lambda g, qi: (g // pairs, qi, g % pairs),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(b * pairs, s_pad // bq),
            in_specs=[qo_spec, spec_kv(1), spec_kv(2)],
            out_specs=qo_spec,
            out_shape=jax.ShapeDtypeStruct((b, s_pad, pairs * 128),
                                           qkv.dtype),
            interpret=interpret,
        )(qkvp, qkvp, qkvp)
        return out[:, :s0, :]

    # Pair streaming-K tier: any sequence (SDXL's 16384).
    kernel = functools.partial(_flash_kernel_pair_streamk, block_k=bk,
                               scale=scale, valid_k=s0, use_max=use_max,
                               head_dim=head_dim)

    def spec_sk(group):
        return pl.BlockSpec(
            (1, bk, 128),
            lambda g, qi, kb, group=group: (g // pairs, kb,
                                            group * pairs + g % pairs),
            memory_space=pltpu.VMEM)

    qo_spec3 = pl.BlockSpec((1, bq, 128),
                            lambda g, qi, kb: (g // pairs, qi, g % pairs),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b * pairs, s_pad // bq, s_pad // bk),
        in_specs=[qo_spec3, spec_sk(1), spec_sk(2)],
        out_specs=qo_spec3,
        out_shape=jax.ShapeDtypeStruct((b, s_pad, pairs * 128), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 2), jnp.float32),    # m per half
            pltpu.VMEM((bq, 2), jnp.float32),    # l per half
            pltpu.VMEM((bq, 128), jnp.float32),  # acc, both halves
        ],
        interpret=interpret,
    )(qkvp, qkvp, qkvp)
    return out[:, :s0, :]


# ---------------------------------------------------------------------------
# Channel-resident (cres) tier: natural-layout q/k/v, zero relayouts.
#
# The split path's remaining lvl0 cost is the (B,S,H,64)->(BH,S,64) relayout
# copies around the kernel custom call (~2.9 s of a 32 s 512^2 pass,
# docs/BENCH.md round-3 budget).  Every previous attack changed the MATMUL
# side (fused-qkv: projections in-kernel — lost at 4096; packed: 128-lane
# pair blocks — grid-inefficient; transposed: (3N,B,S) operands — lost at
# 768^2).  This tier changes neither: the three projections stay ordinary
# XLA matmuls (full MXU, pipelined across the scan) whose (B,S,C) outputs
# feed the kernel DIRECTLY — q via a (1,block_q,C) blockspec, K/V via ONE
# manual DMA per image into single-buffered VMEM scratch (dodging Mosaic's
# ~3x buffering of C-wide constant-index blocks, the reason a naive
# (1,S,C) blockspec blows scoped VMEM at 4096).  Heads are unrolled
# in-kernel with STATIC 64-lane slices (measured free in the fused-qkv
# kernel), and the (1,block_q,C) output feeds to_out with no relayout.
# Per-head matmul shapes are IDENTICAL to the split resident tier, so the
# kernel rate is preserved and the copies are pure savings.
#
# K/V must arrive with a 128-multiple channel count (Mosaic DMA lane
# alignment): the CALLER pads the k/v projection WEIGHT columns (zero
# columns, folded at compile time — nothing at activation cost); q and the
# output stay at the true inner width.

_CRES_BLOCKS = ((512, 2048), (512, 1024), (256, 2048), (256, 1024),
                (256, 512), (128, 512), (128, 256))
# Calibrated against real Mosaic outcomes (runbook r4b2 cres_blocks sweep):
# (512,2048) at lvl0-512² (s_pad 4096, c_kv 384) estimates 16.1MB and
# COMPILES AND WINS — 48.57 ms/step vs 51.30 at the (512,1024) a 13MB
# budget had picked — so the cres layout's Mosaic overhead is far below
# the fused-qkv tier's ~2.8MB (single-buffered scratch, only q/o blocks
# double-buffer).  The K/V scratch itself is separately capped: 768²'s
# 9216 tokens (14.2MB of scratch alone) must keep falling back to the
# split kvres tier rather than gamble the compile.
_CRES_VMEM_BUDGET = int(16.2 * 1024 * 1024)
_CRES_SCRATCH_CAP = int(13.0 * 1024 * 1024)


def _cres_need(s_pad: int, c_kv: int, inner: int, head_dim: int,
               bq: int, bk: int, itemsize: int) -> int:
    return (
        2 * s_pad * c_kv * itemsize        # K + V scratch (single, manual DMA)
        + 2 * 2 * bq * inner * itemsize    # q/o blocks, double-buffered
        + 2 * bq * bk * 4                  # fp32 logits + exp temporaries
        + bq * head_dim * 4                # fp32 accumulator
    )


def _cres_blocks(s_pad: int, c_kv: int, inner: int, head_dim: int,
                 itemsize: int):
    """Largest (block_q, block_k) whose VMEM estimate fits, or None."""
    # GSWM_CRES_SCRATCH_CAP: experiment override (bytes) — 9216 tokens
    # (14.16MB scratch, total (256,512) estimate 15.94MB) is under the
    # measured 16.2MB ceiling but has never compiled on real Mosaic; the
    # default cap keeps 768² on the proven split kvres tier until the A/B.
    cap = int(os.environ.get("GSWM_CRES_SCRATCH_CAP", _CRES_SCRATCH_CAP))
    if 2 * s_pad * c_kv * itemsize > cap:
        return None
    for bq, bk in _CRES_BLOCKS:
        if s_pad % bq or s_pad % bk:
            continue
        if (_cres_need(s_pad, c_kv, inner, head_dim, bq, bk, itemsize)
                <= _CRES_VMEM_BUDGET):
            return bq, bk
    return None


def cres_attention_fits(seq: int, inner: int, dtype=jnp.bfloat16,
                        head_dim: int = 64) -> bool:
    """Does the channel-resident layout fit VMEM at this shape?  SD lvl0
    512^2 (4096 tokens, C=320->384 padded) fits at (512,1024) = 11.9MB;
    SDXL lvl0 (4096 tokens, C=640) fits at (128,1024); 768^2's 9216 tokens
    do NOT (K/V scratch alone is 14.2MB) and stay on the split kvres tier."""
    itemsize = jnp.dtype(dtype).itemsize
    pad_unit = 256 if seq >= 256 else max(128, 1 << (seq - 1).bit_length())
    s_pad = -(-seq // pad_unit) * pad_unit
    c_kv = -(-inner // 128) * 128
    return _cres_blocks(s_pad, c_kv, inner, head_dim, itemsize) is not None


def _flash_kernel_cres(q_ref, k_hbm, v_hbm, o_ref, k_vmem, v_vmem, k_sem,
                       v_sem, *, heads: int, head_dim: int, block_k: int,
                       scale: float, valid_k: int, use_max: bool):
    """Grid (B, n_q_tiles); K/V for image b are DMA'd HBM->VMEM once at the
    first q tile (scratch persists across the inner grid dimension), then
    each q tile attends per head via static lane slices."""
    b = pl.program_id(0)
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        ck = pltpu.make_async_copy(k_hbm.at[b], k_vmem, k_sem)
        cv = pltpu.make_async_copy(v_hbm.at[b], v_vmem, v_sem)
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

    s_pad = k_vmem.shape[0]
    q_all = q_ref[0]
    for h in range(heads):
        lo = h * head_dim
        q = q_all[:, lo:lo + head_dim]
        q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)

        def k_get(kb, lo=lo):
            return k_vmem[pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        def v_get(kb, lo=lo):
            return v_vmem[pl.ds(kb * block_k, block_k), lo:lo + head_dim]

        out = _attend_kv_loop(q, k_get, v_get, block_k=block_k,
                              valid_k=valid_k, use_max=use_max, seq_k=s_pad)
        o_ref[0, :, lo:lo + head_dim] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "head_dim", "block_q", "block_k",
                              "interpret")
)
def flash_attention_cres(q, k, v, heads: int, head_dim: int,
                         block_q: int | None = None,
                         block_k: int | None = None,
                         interpret: bool | None = None):
    """(B, S, H*D) q + (B, S, C_kv) k/v -> (B, S, H*D) attention output.

    ``C_kv`` must be a 128 multiple (pad the k/v projection weight columns;
    lanes past H*D are ignored).  Numerics match the split flash path
    exactly: same per-head dots, same online softmax (_attend_kv_loop)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, s, inner = q.shape
    c_kv = k.shape[2]
    if c_kv % 128:
        raise ValueError(
            f"cres k/v channel count must be a 128 multiple, got {c_kv} — "
            "pad the projection weight columns (see Attention routing)")
    assert inner == heads * head_dim and v.shape == k.shape
    scale = _softmax_scale(head_dim)
    itemsize = jnp.dtype(q.dtype).itemsize
    use_max = (q.dtype != jnp.bfloat16
               or os.environ.get("GSWM_ATTN_USE_MAX") == "1")
    pad_unit = 256 if s >= 256 else max(128, 1 << (s - 1).bit_length())
    qp, s0 = _pad_to(q, 1, pad_unit)
    kp, _ = _pad_to(k, 1, pad_unit)
    vp, _ = _pad_to(v, 1, pad_unit)
    s_pad = qp.shape[1]
    blocks = _cres_blocks(s_pad, c_kv, inner, head_dim, itemsize)
    if blocks is None:
        raise ValueError(
            f"cres attention does not fit VMEM at seq={s}, inner={inner} — "
            "gate with cres_attention_fits() and fall back to "
            "flash_attention")
    bq = blocks[0] if block_q is None else block_q
    bk = blocks[1] if block_k is None else block_k
    bq, bk = min(bq, s_pad), min(bk, s_pad)
    if s_pad % bq or s_pad % bk:
        # the grid (s_pad // bq) and the fori_loop (seq_k // block_k) floor:
        # a non-dividing override would silently drop query tiles / tail key
        # blocks (auto-selection filters for divisibility; only hand-passed
        # block_q/block_k can reach this).
        raise ValueError(
            f"block_q={bq} and block_k={bk} must divide the padded "
            f"sequence {s_pad}")
    kernel = functools.partial(
        _flash_kernel_cres, heads=heads, head_dim=head_dim, block_k=bk,
        scale=scale, valid_k=s0, use_max=use_max)
    out = pl.pallas_call(
        kernel,
        grid=(b, s_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, inner), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # k in HBM; manual DMA
            pl.BlockSpec(memory_space=pl.ANY),  # v in HBM; manual DMA
        ],
        out_specs=pl.BlockSpec((1, bq, inner), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, inner), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((s_pad, c_kv), q.dtype),   # k (whole image)
            pltpu.VMEM((s_pad, c_kv), q.dtype),   # v (whole image)
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :s0, :]


def _flash_kernel_T(qkvT_hbm, o_hbm, q_vmem, o_vmem, k_bufs, v_bufs,
                    q_sem, o_sem, k_sems, v_sems, *, heads: int,
                    head_dim: int, block_q: int, block_k: int, scale: float,
                    valid_k: int, inner: int):
    """Transposed-operand streaming flash step over a (3*H*D, B, S) stacked
    projection output — the layout a ``('nc,bsc->nbs')`` qkv matmul produces
    NATIVELY, so XLA has no {1,2,0}->{2,1,0} relayout or qkv-split copy to
    materialize around the call (the measured ~3.4 ms/site of lvl0 context
    overhead, docs/BENCH.md round 3).  All math stays transposed with ZERO
    transpose ops:

      scores (bq, bk) = dot(q_tile (d,bq), k_tile (d,bk)) contracting dim 0
                        (the d-sublane dim — same MXU structural cap);
      l      (1, bq) += dot(ones (1,bk), P (bq,bk)) contracting dim 1 — an
                        MXU matvec that lands the row sums already in the
                        broadcast orientation the (d, bq) accumulator needs;
      acc    (d, bq) += dot(v_tile (d,bk), P (bq,bk)) contracting dim 1.

    Grid (heads, B/8): Mosaic requires >= 8 sublanes per block/DMA tile, so
    each step owns EIGHT batch elements — q/o move as (d, 8, bq) tiles and
    K/V stream as double-buffered (d, 8, bk) chunks shared by the eight
    online-softmax accumulators (refetched per q tile; ~5 ns/token of HBM
    vs ~13 ns/token of MXU work, fully hidden by the double buffer).

    No-max softmax only (the bf16 model path; fp32 callers get the same
    clamped-exp math — exact within fp32 rounding for |logits| < 60, which
    trained SD satisfies by a 2x margin)."""
    h = pl.program_id(0)
    b8 = pl.program_id(1)
    d = head_dim
    s_pad = qkvT_hbm.shape[2]
    nq = s_pad // block_q
    nk = s_pad // block_k
    b0 = b8 * 8
    dtype = o_hbm.dtype
    ones = jnp.ones((1, block_k), jnp.float32)

    def kv_copies(kb, slot):
        ks = pl.ds(kb * block_k, block_k)
        return (
            pltpu.make_async_copy(
                qkvT_hbm.at[pl.ds(inner + h * d, d), pl.ds(b0, 8), ks],
                k_bufs.at[slot], k_sems.at[slot]),
            pltpu.make_async_copy(
                qkvT_hbm.at[pl.ds(2 * inner + h * d, d), pl.ds(b0, 8), ks],
                v_bufs.at[slot], v_sems.at[slot]),
        )

    def q_tile(qi, _):
        qs = pl.ds(qi * block_q, block_q)
        q_cp = pltpu.make_async_copy(
            qkvT_hbm.at[pl.ds(h * d, d), pl.ds(b0, 8), qs], q_vmem, q_sem)
        q_cp.start()
        for cp in kv_copies(0, 0):
            cp.start()
        q_cp.wait()
        qts = []
        for bi in range(8):
            qt = q_vmem[:, bi, :]
            qts.append((qt.astype(jnp.float32) * scale).astype(qt.dtype))

        def kb_body(kb, carry):
            ls, accs = carry
            slot = jax.lax.rem(kb, 2)

            @pl.when(kb + 1 < nk)
            def _():
                for cp in kv_copies(kb + 1, 1 - slot):
                    cp.start()

            for cp in kv_copies(kb, slot):
                cp.wait()
            col = None
            if valid_k != s_pad:
                col = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
            ls_new, accs_new = [], []
            for bi in range(8):
                kt = k_bufs[slot, :, bi, :]
                vt = v_bufs[slot, :, bi, :]
                s = jax.lax.dot_general(
                    qts[bi], kt, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (bq, bk)
                if col is not None:
                    s = jnp.where(col < valid_k, s, -1e30)
                exp, clamp = _exp_clamp()
                p = exp(jnp.minimum(s, clamp))
                ls_new.append(ls[bi] + jax.lax.dot_general(
                    ones, p, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))     # (1, bq)
                accs_new.append(accs[bi] + jax.lax.dot_general(
                    vt, p.astype(vt.dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))     # (d, bq)
            return tuple(ls_new), tuple(accs_new)

        l0 = tuple(jnp.zeros((1, block_q), jnp.float32) for _ in range(8))
        acc0 = tuple(jnp.zeros((d, block_q), jnp.float32) for _ in range(8))
        ls, accs = jax.lax.fori_loop(0, nk, kb_body, (l0, acc0))
        for bi in range(8):
            o_vmem[:, bi, :] = (accs[bi] / ls[bi]).astype(dtype)
        o_cp = pltpu.make_async_copy(
            o_vmem, o_hbm.at[pl.ds(h * d, d), pl.ds(b0, 8), qs], o_sem)
        o_cp.start()
        o_cp.wait()
        return 0

    jax.lax.fori_loop(0, nq, q_tile, 0)


# Transposed tier VMEM: q/o (d,8,bq) tiles + 2x double-buffered (d,8,bk)
# K/V chunks + per-step (bq,bk) temporaries + eight (d+1, bq) accumulators;
# budget leaves the usual ~3 MB Mosaic slack under the 16 MB scoped ceiling.
_TRANSPOSED_VMEM_BUDGET = int(12.5 * 1024 * 1024)


def _transposed_need(head_dim: int, bq: int, bk: int, itemsize: int) -> int:
    # The (bq, bk) term counts the per-kb-step live set Mosaic keeps on the
    # scoped-vmem stack: fp32 logits s, fp32 exp p, p cast to the V dtype,
    # and the int32 col iota of the K-mask path — undercounting these is
    # exactly how the first chip run of this tier OOMed at 17.26M vs the
    # 16M scoped ceiling (bq=512, bk=1024; runbook r4a).
    return (2 * head_dim * 8 * bq * itemsize        # q + o tiles
            + 4 * head_dim * 8 * bk * itemsize      # k/v double-buffered
            + 4 * bq * bk * 4                       # s, p, p.astype, col
            + 8 * (head_dim + 1) * bq * 4)          # 8 accumulators + sums


def transposed_attention_fits(seq: int, batch: int = 8, head_dim: int = 64,
                              dtype=jnp.bfloat16,
                              block_q: int = DEFAULT_BLOCK_Q,
                              block_k: int = 1024) -> bool:
    """True when the transposed streaming tier applies: the kernel itself
    streams (any length), so the gates are the 8-sublane batch granularity
    and the VMEM budget at the blocks the runtime would choose (it halves
    block_k down to 256 until the estimate fits, mirroring
    flash_attention_transposed)."""
    if batch % 8:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    bq, bk = min(block_q, seq), min(block_k, seq)
    while _transposed_need(head_dim, bq, bk, itemsize) \
            > _TRANSPOSED_VMEM_BUDGET and bk > 256:
        bk //= 2
    return _transposed_need(head_dim, bq, bk, itemsize) \
        <= _TRANSPOSED_VMEM_BUDGET


def flash_attention_transposed(qkvT, heads: int, head_dim: int = 64,
                               block_q: int | None = None,
                               block_k: int | None = None,
                               interpret: bool | None = None):
    """Self-attention over a TRANSPOSED stacked projection output.

    ``qkvT``: (3*heads*head_dim, B, S) — q, then k, then v along dim 0, the
    native output of ``jnp.einsum('nc,bsc->nbs', w_qkv_T, x)``.  Returns the
    attention output oT as (heads*head_dim, B, S), which ``to_out`` consumes
    directly via ``jax.lax.dot_general(oT, w_out, (((0,), (0,)), ((), ())))``
    -> (B, S, C).  The pallas call reads q/k/v as manual-DMA slices of the
    SAME HBM array (no split) and both its operand and output layouts match
    what the surrounding matmuls produce/consume — the relayout copies
    around the (B,S,H,D) kernel path (both the packed and fused-qkv attacks
    on which measured as losses, docs/BENCH.md round 3) never exist in this
    formulation.  B is padded to the 8-sublane DMA granularity if needed
    (real callers route here only when B % 8 == 0).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n3, b, s = qkvT.shape
    inner = heads * head_dim
    assert n3 == 3 * inner, (n3, heads, head_dim)
    bq = DEFAULT_BLOCK_Q if block_q is None else block_q
    bk = 1024 if block_k is None else block_k
    itemsize = jnp.dtype(qkvT.dtype).itemsize
    while _transposed_need(head_dim, bq, bk, itemsize) \
            > _TRANSPOSED_VMEM_BUDGET and bk > 256:
        bk //= 2
    qkvT, b0 = _pad_to(qkvT, 1, 8)
    b_pad = qkvT.shape[1]
    blk = max(bq, bk)
    qkvT, s0 = _pad_to(qkvT, 2, blk)
    s_pad = qkvT.shape[2]
    bq = min(bq, s_pad)
    bk = min(bk, s_pad)
    scale = _softmax_scale(head_dim)

    kernel = functools.partial(
        _flash_kernel_T, heads=heads, head_dim=head_dim, block_q=bq,
        block_k=bk, scale=scale, valid_k=s0, inner=inner)

    out = pl.pallas_call(
        kernel,
        grid=(heads, b_pad // 8),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],   # manual DMA
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((inner, b_pad, s_pad), qkvT.dtype),
        scratch_shapes=[
            pltpu.VMEM((head_dim, 8, bq), qkvT.dtype),      # q tile
            pltpu.VMEM((head_dim, 8, bq), qkvT.dtype),      # o tile
            pltpu.VMEM((2, head_dim, 8, bk), qkvT.dtype),   # k chunks
            pltpu.VMEM((2, head_dim, 8, bk), qkvT.dtype),   # v chunks
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qkvT)
    return out[:, :b0, :s0]


def flash_attention_sharded(q, k, v, **kw):
    """flash_attention partitioned over a 'tp' mesh axis — by heads.

    How the kernel partitions: attention is embarrassingly parallel over the
    head axis, so under a tensor-parallel mesh the pallas_call runs inside
    ``shard_map`` with q/k/v head-sharded — each device executes the kernel
    on its local heads with NO collectives (the Megatron all-reduce happens
    at the row-parallel to_out projection outside the kernel, see
    gswm.sharding.mesh._spec_for_path).  GSPMD cannot partition an opaque
    pallas_call itself, so without this wrapper a tp mesh would replicate
    the full attention on every device.

    A sequence-parallel mesh axis ('sp' > 1) takes precedence: the sequence
    is the axis worth sharding once latents outgrow a chip (SDXL 16k+), and
    gswm.ops.ring_attention rotates K/V shards over the ICI ring.

    Falls back to the plain call when no mesh / tp=1 / heads not divisible.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        names = getattr(mesh, "axis_names", ()) or ()
    except Exception:
        return flash_attention(q, k, v, **kw)
    if ("sp" in names and mesh.shape["sp"] > 1
            and q.shape[1] % mesh.shape["sp"] == 0
            and k.shape[1] % mesh.shape["sp"] == 0):
        from gswm.ops.ring_attention import ring_attention

        return ring_attention(q, k, v)
    if "tp" not in names or mesh.shape["tp"] == 1:
        return flash_attention(q, k, v, **kw)
    if q.shape[2] % mesh.shape["tp"] != 0:
        return flash_attention(q, k, v, **kw)
    batch_axis = (
        "dp"
        if "dp" in names and q.shape[0] % mesh.shape["dp"] == 0
        else None
    )
    spec = jax.sharding.PartitionSpec(batch_axis, None, "tp", None)
    fn = jax.shard_map(
        functools.partial(flash_attention, **kw),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def xla_flash_attention(q, k, v, heads: int, head_dim: int):
    """(B, S, H*D) q/k/v (UNPADDED channels) -> (B, S, H*D) attention.

    No Pallas: one dot_general -> clamp/exp -> dot_general chain that XLA's
    windowed fusion emitter schedules ITSELF as a flash kernel.  Round-5
    attribution (tools/exp_kernel_rate.py, docs/BENCH.md) showed the Mosaic
    cres kernel is dot-bound at ~79-82 TF/s while XLA runs the identical
    alternating qkT+PV tile chain at 117.9 TF/s by fusing both dots into a
    single kOutput fusion — the O(S^2) logits tensor is regenerated
    tile-by-tile in scoped VMEM and never materialized in HBM (verified:
    the 26.8 GB bf16 logits of SD lvl0 at b160 run on a 16 GB chip).
    Measured on v5e (tools/exp_xla_flash.py, b160/4096 tok/5 heads/d=64):
    37.30 ms/call (92.1 TF/s) vs cres 43.57 ms — +16.8% on the bucket.

    Two structural rules keep the chain one fusion candidate:
      * the probability tensor has EXACTLY ONE consumer — the softmax
        row-sum l rides the PV dot as a ones-column appended to V, so no
        separate reduce forces p to materialize (a second consumer would);
      * no lax.scan around the dots — both scan formulations measured
        catastrophic (kscan OOMs: the per-step logits window materializes;
        qscan 3.3x slower).

    Softmax semantics match the kernel's no-max path (_attend_kv_loop
    body_nomax): fp32 logits, clamp at _NOMAX_CLAMP, p cast to the model
    dtype for the PV matmul, fp32 accumulation, exact for |logits| < 60
    (softmax without the shift — see flash_attention_transposed's note).
    There is no sequence padding, so no key masking is needed at all.

    Reference semantics: diffusers Attention (/root/reference
    extract.py:46-70's UNet); parity: tests/test_xla_flash_attention.py.
    """
    b, s, inner = q.shape
    assert inner == heads * head_dim and k.shape == v.shape == q.shape
    scale = _softmax_scale(head_dim)
    exp, clamp = _exp_clamp()
    q4 = (q.astype(jnp.float32) * scale).astype(q.dtype)
    q4 = q4.reshape(b, s, heads, head_dim)
    k4 = k.reshape(b, s, heads, head_dim)
    v4 = v.reshape(b, s, heads, head_dim)
    ones = jnp.ones((b, s, heads, 1), v4.dtype)
    va = jnp.concatenate([v4, ones], axis=-1)
    # batch dims (B, H) taken IN PLACE on the (B,S,H,D) layout — no
    # transpose ops anywhere; XLA owns the internal layouts.
    logits = jax.lax.dot_general(
        q4, k4, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32)            # (B,H,S,Sk) fp32
    if os.environ.get("GSWM_XF_BF16_EXP") == "1":
        # wholeb experiment (trace-time knob, default OFF): cast the
        # clamped logits to bf16 BEFORE the exp so the VPU elementwise
        # phase runs on half-width lanes.  bf16 logits carry ~2-3
        # significant digits -> p has O(1%) relative error — fine for
        # sign-based decode, NOT parity-exact (tools/exp_xla_flash.py
        # xf_wholeb; docs/BENCH.md round-5 exp-residual decomposition).
        p = exp(jnp.minimum(logits, clamp).astype(jnp.bfloat16))
    else:
        p = exp(jnp.minimum(logits, clamp)).astype(q.dtype)
    o_aug = jax.lax.dot_general(
        p, va, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32)            # (B,H,S,D+1) fp32
    out = o_aug[..., :head_dim] / o_aug[..., head_dim:head_dim + 1]
    return (out.astype(q.dtype)
            .transpose(0, 2, 1, 3).reshape(b, s, inner))


def reference_attention(q, k, v):
    """Plain fp32 attention for parity tests; same (B, S, H, D) layout."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (d**-0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32)).astype(q.dtype)
