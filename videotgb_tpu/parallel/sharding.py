"""Logical-axis sharding rules (GSPMD) for every model family in the framework.

Models annotate their parameters with *logical* axis names (via
``flax.linen.with_partitioning``); this module maps logical names to mesh axes
and produces :class:`jax.sharding.NamedSharding` trees for params, optimizer
state, and batches. This replaces the reference's implicit DDP replication
(SURVEY.md section 2.7) with explicit, per-tensor placement.

Logical vocabulary:
  "embed"   — model width (d_model / hidden)   -> fsdp-sharded under ZeRO-3
  "heads"   — attention heads                   -> tp
  "kv"      — per-head dim                      -> replicated
  "mlp"     — feed-forward hidden               -> tp
  "vocab"   — token embedding rows              -> tp
  "batch"   — leading batch dim of activations  -> dp (+fsdp when flattened in)
  None      — replicated
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videotgb_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS

# rules: logical axis name -> mesh axis (or None = replicate)
DEFAULT_RULES: tuple[tuple[str, Any], ...] = (
    ("batch", (DATA_AXIS, FSDP_AXIS)),
    ("embed", FSDP_AXIS),
    ("heads", TENSOR_AXIS),
    ("kv", None),
    ("mlp", TENSOR_AXIS),
    ("vocab", TENSOR_AXIS),
    ("conv_in", None),
    ("conv_out", None),
    ("seq", None),
    ("layers", None),  # stacked axis from nn.scan-over-layers
)


def logical_to_mesh(logical_spec: P, rules=DEFAULT_RULES) -> P:
    table = dict(rules)
    axes = []
    for name in logical_spec:
        if name is None:
            axes.append(None)
        elif isinstance(name, (tuple, list)):
            flat = []
            for sub in name:
                mapped = table.get(sub)
                if mapped is None:
                    continue
                flat.extend(mapped if isinstance(mapped, tuple) else (mapped,))
            axes.append(tuple(flat) if flat else None)
        else:
            axes.append(table.get(name))
    return P(*axes)


def param_partition_spec(params: Any, rules=DEFAULT_RULES) -> Any:
    """Pytree of PartitionSpecs from flax ``Partitioned`` metadata."""
    logical = nn.get_partition_spec(params)
    return jax.tree.map(
        lambda spec: logical_to_mesh(spec, rules) if isinstance(spec, P) else P(),
        logical,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_RULES) -> Any:
    """Place a parameter pytree onto the mesh according to its annotations."""
    specs = param_partition_spec(params, rules)
    unboxed = nn.meta.unbox(params)
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        unboxed,
        specs,
    )


def batch_spec() -> P:
    return P((DATA_AXIS, FSDP_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every leaf of a batch along its leading axis over dp(+fsdp).

    Leaves whose leading dim is not divisible by the data-parallel extent
    (scalars, per-step constants) are replicated instead.
    """
    import numpy as np

    dp_size = int(np.prod([mesh.shape[a] for a in (DATA_AXIS, FSDP_AXIS)]))
    sharded = NamedSharding(mesh, batch_spec())
    replicated = NamedSharding(mesh, P())

    def put(x):
        arr = jax.numpy.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % dp_size == 0:
            return jax.device_put(arr, sharded)
        return jax.device_put(arr, replicated)

    return jax.tree.map(put, batch)


def with_sharding(x: Any, mesh: Mesh, spec: P) -> Any:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
