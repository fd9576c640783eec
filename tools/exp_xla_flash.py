"""XLA-flash lvl0 attention: can XLA's fusion emitter beat the Mosaic kernel?

Follow-up to tools/exp_kernel_rate.py (docs/BENCH.md round-5 attribution):
the production cres kernel is dot-bound under Mosaic at 82 TF/s while XLA
schedules the IDENTICAL alternating qkT+PV tile chain at 117.9 TF/s by
fusing both dots into one windowed kOutput fusion — the 1.68 GB logits
intermediate is regenerated tile-by-tile in scoped VMEM and never touches
HBM.  If the emitter fuses through clamp/exp the way it fuses through the
bf16 cast, plain-XLA attention IS a flash kernel, and a faster one.

The formulation keeps the logits/probability tensor to EXACTLY ONE
consumer so the whole chain is a single fusion candidate: the softmax
row-sum l rides the PV dot as a ones-column appended to V

    o_aug = exp(min(q*scale @ k^T, 60)) @ [v | 1]
    out   = o_aug[..., :d] / o_aug[..., d:]

(no separate l reduce — a second consumer of p would force XLA to either
materialize p or duplicate the qkT).  Semantics match the kernel's bf16
no-max path (gswm/ops/attention.py:_attend_kv_loop body_nomax): fp32
logits, clamp at 60, bf16 p into the PV dot, fp32 accumulation.

Variants (fresh subprocess each — an unfused variant OOMs the 16GB HBM,
which is itself the no-fusion verdict):

  cres    the production flash_attention_cres (baseline, same harness)
  whole   one dot_general chain over the full (B,H,4096,4096) logits —
          26.8 GB bf16 if materialized; running at all proves fusion
  kscan   lax.scan over key blocks of 2048 with an fp32 (acc, l) carry —
          the flash recurrence expressed at the XLA level
  qscan   lax.scan over query blocks of 512, full-width keys per step

Usage:  python tools/exp_xla_flash.py            # everything
        GSWM_XF_VARIANTS=cres,whole python tools/exp_xla_flash.py
        python tools/exp_xla_flash.py --child VARIANT   # internal
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import os as _os
# GSWM_XF_SHAPE=b,s,h,d,ckv overrides the default 512² lvl0 shape — e.g.
# 48,9216,5,64,384 (768² lvl0, currently on the split kvres tier) or
# 8,16384,5,64,384 (SD 1024² extraction lvl0, streaming-K tier today).
_shape = _os.environ.get("GSWM_XF_SHAPE", "160,4096,5,64,384")
B, S, H, D, C_KV = (int(x) for x in _shape.split(","))
INNER = H * D
CLAMP = 60.0
ATT_FLOPS = 4.0 * B * H * S * S * D


def _delta_time(fn, n1=3, n2=9, warm=2):
    import numpy as np
    import jax

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.perf_counter() - t0

    run(warm)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)


def _split_heads(q, k, v):
    import jax.numpy as jnp
    b, s, _ = q.shape
    scale = 1.0 / (D ** 0.5)
    q4 = (q.astype(jnp.float32) * scale).astype(q.dtype)
    q4 = q4.reshape(b, s, H, D)
    k4 = k[:, :, :INNER].reshape(b, s, H, D)
    v4 = v[:, :, :INNER].reshape(b, s, H, D)
    return q4, k4, v4


def _aug(v4):
    import jax.numpy as jnp
    b, s = v4.shape[:2]
    ones = jnp.ones((b, s, H, 1), v4.dtype)
    return jnp.concatenate([v4, ones], axis=-1)


def _finish(o_aug):
    """(B,H,S,D+1) fp32 -> (B,S,H*D) bf16."""
    import jax.numpy as jnp
    b, _, s, _ = o_aug.shape
    out = o_aug[..., :D] / o_aug[..., D:D + 1]
    return out.astype(jnp.bfloat16).transpose(0, 2, 1, 3).reshape(b, s, INNER)


def xf_whole(q, k, v):
    import jax
    import jax.numpy as jnp
    q4, k4, v4 = _split_heads(q, k, v)
    va = _aug(v4)
    # batch dims (B, H) taken IN PLACE on the (B,S,H,D) layout — no
    # transpose ops; XLA owns the internal layout.
    s = jax.lax.dot_general(
        q4, k4, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32)          # (B,H,S,Sk) fp32
    p = jnp.exp(jnp.minimum(s, CLAMP)).astype(jnp.bfloat16)
    o_aug = jax.lax.dot_general(
        p, va, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32)          # (B,H,S,D+1) fp32
    return _finish(o_aug)


def xf_wholeb(q, k, v):
    """bf16-exp variant: logits cast to bf16 BEFORE clamp/exp, so the VPU
    elementwise phase runs on half-width lanes (2x elem rate if packed).
    The round-5 decomposition (docs/BENCH.md) shows the fused exp adds
    ~8 ms/call over the cast-only control — the only remaining in-chain
    residual.  PRECISION: bf16 logits carry ~2-3 significant digits, so p
    has O(1%) relative error at typical |logits|<10 — fine for the
    sign-based decode, NOT parity-exact; env-gated experiment only."""
    import jax
    import jax.numpy as jnp
    q4, k4, v4 = _split_heads(q, k, v)
    va = _aug(v4)
    s = jax.lax.dot_general(
        q4, k4, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32)
    sb = jnp.minimum(s, CLAMP).astype(jnp.bfloat16)
    p = jnp.exp(sb)
    o_aug = jax.lax.dot_general(
        p, va, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32)
    return _finish(o_aug)


def xf_kscan(q, k, v, block_k=2048):
    import jax
    import jax.numpy as jnp
    q4, k4, v4 = _split_heads(q, k, v)
    va = _aug(v4)
    b, s = q4.shape[:2]
    nk = s // block_k
    kb = va.reshape(b, nk, block_k, H, D + 1).transpose(1, 0, 3, 2, 4)
    kk = k4.reshape(b, nk, block_k, H, D).transpose(1, 0, 3, 2, 4)
    # scan carries the fp32 (B,H,S,D+1) accumulator; each step is one
    # qkT+exp+PV fusion candidate over a (B,H,S,block_k) logits window.
    acc0 = jnp.zeros((b, H, s, D + 1), jnp.float32)

    def body(acc, kv):
        kt, vt = kv                                   # (B,H,bk,{D,D+1})
        s = jax.lax.dot_general(
            q4, kt, (((3,), (3,)), ((0, 2), (0, 1))),
            preferred_element_type=jnp.float32)       # (B,H,S,bk)
        p = jnp.exp(jnp.minimum(s, CLAMP)).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            p, vt, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32)
        return acc + o, ()

    o_aug, _ = jax.lax.scan(body, acc0, (kk, kb))
    return _finish(o_aug)


def xf_qscan(q, k, v, block_q=512):
    import jax
    import jax.numpy as jnp
    q4, k4, v4 = _split_heads(q, k, v)
    va = _aug(v4)
    b, s = q4.shape[:2]
    nq = s // block_q
    qs = q4.reshape(b, nq, block_q, H, D).transpose(1, 0, 3, 2, 4)

    def body(_, qt):                                  # qt (B,H,bq,D)
        s = jax.lax.dot_general(
            qt, k4, (((3,), (3,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32)       # (B,H,bq,Sk)
        p = jnp.exp(jnp.minimum(s, CLAMP)).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            p, va, (((3,), (1,)), ((0, 1), (0, 2))),
            preferred_element_type=jnp.float32)       # (B,H,bq,D+1)
        return (), o

    _, o_blocks = jax.lax.scan(body, (), qs)          # (nq,B,H,bq,D+1)
    o_aug = o_blocks.transpose(1, 2, 0, 3, 4).reshape(b, H, s, D + 1)
    return _finish(o_aug)


_VARIANTS = {"whole": xf_whole, "wholeb": xf_wholeb, "kscan": xf_kscan,
             "qscan": xf_qscan}


def child(variant: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/gswm-jax-cache-xf-{variant}")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import gswm.ops.attention as A

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    q0 = (jax.random.normal(k1, (B, S, INNER)) * 0.3).astype(jnp.bfloat16)
    k = (jax.random.normal(k2, (B, S, C_KV)) * 0.3).astype(jnp.bfloat16)
    v = (jax.random.normal(k3, (B, S, C_KV)) * 0.3).astype(jnp.bfloat16)
    n = 8

    if variant == "cres":
        def attn(q, k, v):
            return A.flash_attention_cres(q, k, v, H, D)
    elif variant == "split":
        # today's routing above the cres window (768²'s 9216 tokens: the
        # KV-resident tier; 16k: streaming-K) — includes the same
        # (B,S,C)->(B,S,H,D) relayouts the model path pays around it.
        def attn(q, k, v):
            q4 = q.reshape(B, S, H, D)
            k4 = k[:, :, :INNER].reshape(B, S, H, D)
            v4 = v[:, :, :INNER].reshape(B, S, H, D)
            o = A.flash_attention(q4, k4, v4)
            return o.reshape(B, S, INNER)
    else:
        attn = _VARIANTS[variant]

    @jax.jit
    def go(q, k, v):
        def body(carry, _):
            o = attn(carry, k, v)
            o = jnp.tanh(o.astype(jnp.float32) * 0.5).astype(jnp.bfloat16)
            return o, ()

        y, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.float32(y.astype(jnp.float32).sum())

    # parity vs the production kernel before timing (same harness inputs)
    if variant not in ("cres", "split"):
        if A.cres_attention_fits(S, INNER, head_dim=D):
            ref = A.flash_attention_cres(q0[:2], k[:2], v[:2], H, D)
        else:
            ref = A.flash_attention(
                q0[:2].reshape(2, S, H, D),
                k[:2, :, :INNER].reshape(2, S, H, D),
                v[:2, :, :INNER].reshape(2, S, H, D)).reshape(2, S, INNER)
        got = jax.jit(_VARIANTS[variant])(q0[:2], k[:2], v[:2])
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"PARITY {err:.6f}", flush=True)

    t = _delta_time(lambda: go(q0, k, v)) / n
    print(f"RESULT {t * 1e3:.3f} {ATT_FLOPS / t / 1e12:.2f}", flush=True)


def main() -> None:
    if sys.argv[1:2] == ["--child"]:
        child(sys.argv[2])
        return

    import jax
    print(f"devices: {jax.devices()}", flush=True)
    print(f"lvl0 shape b={B} s={S} h={H} d={D}; "
          f"attention {ATT_FLOPS / 1e12:.2f} TFLOP/call", flush=True)

    variants = ("cres", "whole", "kscan", "qscan")
    if S > 4096:
        variants = ("split", "whole")
    if os.environ.get("GSWM_XF_VARIANTS"):
        variants = tuple(os.environ["GSWM_XF_VARIANTS"].split(","))
    for variant in variants:
        proc = subprocess.run(
            [sys.executable, __file__, "--child", variant],
            env=os.environ, capture_output=True, text=True, timeout=1800)
        lines = proc.stdout.splitlines()
        par = [ln for ln in lines if ln.startswith("PARITY")]
        res = [ln for ln in lines if ln.startswith("RESULT")]
        if proc.returncode or not res:
            tail = proc.stderr[-600:]
            oom = "RESOURCE_EXHAUSTED" in proc.stderr
            print(f"  {variant:6s} {'OOM (not fused)' if oom else 'FAILED'}"
                  f"\n{'' if oom else tail}", flush=True)
            continue
        ms, tf = (float(x) for x in res[0].split()[1:3])
        ptxt = f"  parity-err {par[0].split()[1]}" if par else ""
        print(f"  {variant:6s} {ms:8.2f} ms/call  {tf:6.1f} TF/s"
              f"{ptxt}", flush=True)


if __name__ == "__main__":
    main()
