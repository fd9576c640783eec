"""Ring attention: sequence-parallel attention over a TPU mesh axis.

SURVEY.md §5 scoped ring attention as the long-context extension for
SDXL-and-beyond latent sizes (4x128x128 -> 16k tokens, 8K-pixel latents ->
1M tokens): when one chip cannot hold a sequence's K/V (or its O(S_local*S)
logits working set), shard the SEQUENCE over a mesh axis and rotate K/V
shards around the ICI ring.

TPU-native design (jax collectives, not a port of any GPU ring):
  * `shard_map` over the `sp` mesh axis; every device keeps its local Q
    shard resident for the whole computation.
  * Per ring step each device attends its Q shard against the currently
    visiting K/V shard with the ONLINE-SOFTMAX recurrence (running max —
    shards arrive in ring order, so exactness requires the full
    rescale chain, unlike the single-chip no-max fast path), then forwards
    the K/V shard to its right neighbor with `jax.lax.ppermute` — XLA
    schedules the permute collective over ICI and overlaps it with the next
    step's compute.
  * After `sp` steps every Q shard has seen every K/V shard; outputs stay
    sequence-sharded (no gather).

Communication volume per device: (sp-1) * |K_local + V_local| — the same
bytes a single all-gather of K/V would move, but peak memory stays at one
shard and compute starts immediately.

Local per-step attention runs the online-softmax recurrence over K-chunks
(<=1024 keys each), so the fp32 logits working set per device stays at
(b, h, S/sp, 1024) regardless of shard length — no quadratic local blow-up
at the 16k+ token scales sp exists for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gswm.ops.attention import flash_attention


def _ring_attend_local(q, k0, v0, axis_name: str):
    """Runs on ONE device inside shard_map.  q/k0/v0: (B, S_local, H, D)."""
    n = jax.lax.psum(1, axis_name)
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale

    b, sq, h, d = q.shape
    m0 = jnp.full((b, h, sq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, sq, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, sq, d), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    # Chunk the local attend so the fp32 logits working set stays bounded:
    # a full (b, h, S_local, S_local) einsum at SDXL-scale local shards
    # (16k/sp tokens) would materialize GBs per ring step — exactly the
    # blow-up sp exists to avoid (ADVICE r2).  The same online-softmax
    # recurrence runs over K-chunks inside each ring step, so numerics are
    # unchanged (running max is maintained across chunks AND ring steps).
    sk_local = k0.shape[1]
    n_chunks = max(1, -(-sk_local // 1024))
    while sk_local % n_chunks:
        n_chunks += 1
    ck = sk_local // n_chunks

    def attend_chunk(c, carry, kc, vc):
        m, l, acc = carry
        ks = jax.lax.dynamic_slice_in_dim(kc, c * ck, ck, axis=1)
        vs = jax.lax.dynamic_slice_in_dim(vc, c * ck, ck, axis=1)
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, ks.astype(jnp.float32))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vs.astype(jnp.float32)
        )
        return m_new, l_new, acc_new

    def step(_, carry):
        m, l, acc, kc, vc = carry
        m, l, acc = jax.lax.fori_loop(
            0, n_chunks,
            lambda c, mla: attend_chunk(c, mla, kc, vc),
            (m, l, acc),
        )
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return m, l, acc, kc, vc

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, step, (m0, l0, acc0, k0, v0))
    out = acc / l
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ring_attention(q, k, v, axis: str = "sp"):
    """(B, S, H, D) q/k/v -> (B, S, H, D), with S sharded over mesh axis
    ``axis``.

    Requires an active mesh (jax.sharding.set_mesh / use_mesh) whose
    ``axis`` size divides S.  Falls back to the single-device flash kernel
    when there is no mesh, the axis is absent, or its size is 1 — same
    call, any scale.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
        names = getattr(mesh, "axis_names", ()) or ()
    except Exception:
        return flash_attention(q, k, v)
    if axis not in names or mesh.shape[axis] == 1:
        return flash_attention(q, k, v)
    sp = mesh.shape[axis]
    if q.shape[1] % sp or k.shape[1] % sp:
        return flash_attention(q, k, v)

    batch_axis = (
        "dp" if "dp" in names and q.shape[0] % mesh.shape["dp"] == 0 else None
    )
    spec = jax.sharding.PartitionSpec(batch_axis, axis, None, None)
    fn = jax.shard_map(
        functools.partial(_ring_attend_local, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
