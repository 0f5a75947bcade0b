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

from videotgb_tpu.parallel.mesh import (
    DATA_AXIS, FSDP_AXIS, PIPELINE_AXIS, SEQUENCE_AXIS, TENSOR_AXIS)

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
    # stacked axis from nn.scan-over-layers: stage-sharded when the mesh has
    # a pp extent (size-1 pp axes make this a no-op on non-pipelined meshes)
    ("layers", PIPELINE_AXIS),
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
    """Pytree of PartitionSpecs from flax ``Partitioned`` metadata.

    Effectively-rank-1 params (norm scales/biases — "embed" alone, possibly
    under a scanned "layers" axis) are REPLICATED: fsdp-sharding a vector
    saves no memory worth having but forces XLA to reshard the surrounding
    activations every layer (the spmd_partitioner "involuntary full
    rematerialization" warnings in the r1 multichip dryrun).
    """

    def one(spec: Any) -> P:
        if not isinstance(spec, P):
            return P()
        if sum(1 for n in spec if n != "layers") <= 1:
            return P()
        if "vocab" in spec:
            # embedding tables shard on vocab only: an embed-sharded lookup
            # output would immediately reshard to the batch layout (another
            # r1 involuntary-remat source)
            spec = P(*[n if n in ("vocab", "layers") else None for n in spec])
        return logical_to_mesh(spec, rules)

    logical = nn.get_partition_spec(params)
    return jax.tree.map(one, logical, is_leaf=lambda x: isinstance(x, P))


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


def shard_batch(batch: Any, mesh: Mesh, axis: int = 0) -> Any:
    """Shard every leaf of a batch along axis ``axis`` over dp(+fsdp).

    ``axis=0`` is the ordinary per-step batch; ``axis=1`` handles a
    K-steps-per-dispatch window whose leaves are stacked (K, B, ...) — the
    scan axis stays unsharded, the batch axis shards. Leaves whose sharded
    dim is not divisible by the data-parallel extent (scalars, per-step
    constants) are replicated instead.
    """
    import numpy as np

    dp_size = int(np.prod([mesh.shape[a] for a in (DATA_AXIS, FSDP_AXIS)]))
    spec = P(*([None] * axis), (DATA_AXIS, FSDP_AXIS))
    sharded = NamedSharding(mesh, spec)
    replicated = NamedSharding(mesh, P())

    def put(x):
        arr = jax.numpy.asarray(x)
        if arr.ndim > axis and arr.shape[axis] % dp_size == 0:
            return jax.device_put(arr, sharded)
        return jax.device_put(arr, replicated)

    return jax.tree.map(put, batch)


def with_sharding(x: Any, mesh: Mesh, spec: P) -> Any:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def active_mesh() -> Mesh | None:
    """The mesh installed by a ``with mesh:`` context, if any."""
    try:
        from jax.interpreters import pxla

        m = pxla.thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def constrain_batch(x: Any) -> Any:
    """Pin an activation's leading axis to the dp(+fsdp) mesh axes — and,
    when the mesh carries a sequence-parallel extent, its token axis to sp.

    No-op without an active mesh context (single-chip, CPU tests). Model code
    calls this on activations whose sharding XLA would otherwise have to
    guess — the fix for the spmd_partitioner.cc "involuntary full
    rematerialization" warnings around the TGB in the r1 multichip dryrun.

    Sequence parallelism (Megatron-SP over GSPMD): every call site is a
    (B, T, D) residual stream between transformer layers, so constraining
    axis 1 to the sp mesh axis token-shards LayerNorm/MLP/elementwise work
    while GSPMD inserts the all-gather into attention (which needs the full
    sequence) and the reduce-scatter back out. The sp constraint is gated on
    ndim == 3 exactly — higher-rank activations (e.g. (B, F, H, W, C) frame
    slabs) have no token axis and sharding axis 1 there would be semantically
    wrong (correct under GSPMD but with pathological resharding collectives).
    Decode steps (T=1) and other non-divisible token counts skip the sp part
    and stay batch-sharded only.
    """
    mesh = active_mesh()
    if mesh is None:
        return x
    # a user mesh may carry only a subset of the canonical axes (e.g. a bare
    # ("dp",) mesh in a multi-process run) — constrain over whichever of
    # dp/fsdp are present, ignore the rest
    batch_axes = tuple(a for a in (DATA_AXIS, FSDP_AXIS)
                       if a in mesh.shape)
    extent = 1
    for a in batch_axes:
        extent *= mesh.shape[a]
    if not batch_axes or x.shape[0] % extent:
        return x
    spec = [batch_axes]
    sp = mesh.shape.get(SEQUENCE_AXIS, 1)
    if sp > 1 and x.ndim == 3 and x.shape[1] % sp == 0:
        spec.append(SEQUENCE_AXIS)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
