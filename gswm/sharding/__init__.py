"""Device-mesh parallelism (SURVEY.md §2.5).

The reference is strictly single-process single-GPU; scale-out here is
TPU-native by construction: a ``jax.sharding.Mesh`` with axes

  dp — data parallel over the image batch (embed, inversion, decode, attacks)
  tp — tensor parallel over UNet attention heads / MLP hidden dim
       (Megatron-style, activated by the with_sharding hints in
       gswm.models.layers + the param specs below)

XLA GSPMD inserts the collectives (all-reduce over tp on attention/MLP
outputs) and routes them over ICI.  No NCCL-analog code exists or is needed.
"""

from gswm.sharding.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    unet_param_specs,
    shard_params,
)
