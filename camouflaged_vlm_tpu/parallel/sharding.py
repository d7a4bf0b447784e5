"""Parameter partition rules (tensor parallelism).

Megatron-style sharding expressed as path->PartitionSpec rules; XLA's GSPMD
propagation inserts the collectives. Column-parallel layers (qkv / MLP up
projections) shard their output features; row-parallel layers (attention
output / MLP down projections) shard their input features, producing one
all-reduce per block — riding ICI, never DCN.

flax Dense kernels are (in_features, out_features).
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'a/b/c' param path, spec) — first match wins.
_RULES: Tuple[Tuple[str, P], ...] = (
    # column-parallel: shard output features
    (r"(qkv|in_proj|lin1|c_fc|q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"(qkv|in_proj|lin1|c_fc|q_proj|k_proj|v_proj)/bias$", P("model")),
    # row-parallel: shard input features
    (r"(attn/proj|out_proj|lin2|c_proj)/kernel$", P("model", None)),
    # rel-pos tables index by head_dim (last axis) — replicate
    # conv kernels, norms, embeddings, biases of row-parallel layers: replicate
)


def param_partition_spec(path: str, ndim: int) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            if len([a for a in spec if a is not None]) <= ndim:
                return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings matching `params`."""

    def to_sharding(path, leaf):
        spec = param_partition_spec(_path_str(path), leaf.ndim)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(mesh: Mesh, params):
    """Device-put params according to the partition rules."""
    shardings = make_param_shardings(mesh, params)
    return jax.device_put(params, shardings)
