"""Mesh construction and sharding specs."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, sp: int = 1, devices=None
) -> Mesh:
    """(dp, tp[, sp]) mesh over the available devices; dp defaults to
    n_devices // (tp*sp).  dp rides the outer (DCN-friendlier) axis; tp and
    sp (sequence-parallel, for gswm.ops.ring_attention) ride the inner
    (ICI-contiguous) ones.  The sp axis is only materialized when sp > 1 so
    existing 2-axis callers see the same mesh as before."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    if dp * tp * sp != n:
        raise ValueError(f"dp*tp*sp={dp*tp*sp} != n_devices={n}")
    if sp == 1:
        arr = np.asarray(devices).reshape(dp, tp)
        return Mesh(arr, axis_names=("dp", "tp"))
    arr = np.asarray(devices).reshape(dp, tp, sp)
    return Mesh(arr, axis_names=("dp", "tp", "sp"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def _spec_for_path(path: tuple[str, ...]) -> P:
    """Tensor-parallel partition spec for one UNet parameter.

    Column-parallel (shard output dim): attention q/k/v projections and the
    GEGLU up-projection.  Row-parallel (shard input dim): attention output
    and MLP down-projection — GSPMD then inserts the single all-reduce per
    block that Megatron-style TP requires.
    """
    names = set(path)
    if "kernel" not in names:
        return P()
    if {"to_q", "to_k", "to_v"} & names and ("attn1" in names or "attn2" in names):
        return P(None, "tp")
    if "to_out" in names and ("attn1" in names or "attn2" in names):
        return P("tp", None)
    if "net_0" in names and "proj" in names:
        return P(None, "tp")
    if "net_2" in names:
        return P("tp", None)
    return P()


def unet_param_specs(params) -> dict:
    """Pytree of PartitionSpec matching the UNet param tree."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return _spec_for_path(path)

    return walk(params, ())


def shard_params(params, mesh: Mesh):
    """Place params on the mesh: attention/MLP kernels tp-sharded, the rest
    replicated."""
    specs = unet_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
