"""Pipeline parallelism: a GPipe-style pipelined layer scan over a mesh axis.

The reference scales by replicating the whole model per GPU (DDP x4 — its
only axis). This framework already adds fsdp/tp; this module adds the third
production axis for deep towers that exceed a chip even sharded: the
layer-stacked params of a scanned tower (nn.scan's leading layer axis) are
split into contiguous stages over a ``pp`` mesh axis, and microbatches
stream through the stages with `ppermute` hops between neighbours
(the "pipelined scan" recipe of the scaling playbook — bubble fraction
(S-1)/(M+S-1) for S stages and M microbatches).

`pipeline_apply` is numerically identical to running the full layer stack
sequentially (verified on the virtual CPU mesh, tests/test_pipeline_parallel.py)
and differentiable (pure jax: autodiff flows through the collectives).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_apply(
    layer_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    mesh: Mesh,
    axis: str = "pp",
    microbatches: int | None = None,
) -> Any:
    """Apply L stacked layers to ``x`` pipelined over mesh axis ``axis``.

    layer_fn(params_l, x) -> x applies ONE layer (params_l = the pytree with
    the leading layer axis removed). ``stacked_params`` leaves have leading
    dim L with L % pp == 0; stage s owns layers [s*L/pp, (s+1)*L/pp).

    ``x`` may be a single (B, ...) array or a PYTREE whose every leaf has
    leading batch dim B — use a tuple like ``(h, positions, bias)`` to
    stream per-microbatch side inputs (attention bias, positions, encoder
    states) alongside the activation; layer_fn returns the same structure
    (pass constants through unchanged). B % microbatches == 0; microbatches
    defaults to the pipeline depth (a reasonable latency/bubble tradeoff).

    Returns the full (B, ...) output tree, replicated over ``axis``.
    """
    pp = mesh.shape[axis]
    if pp == 1:
        def body(h, p):
            return layer_fn(p, h), None
        out, _ = jax.lax.scan(body, x, stacked_params)
        return out

    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % pp != 0:
        raise ValueError(f"{n_layers} layers not divisible by pp={pp}")
    m = microbatches or pp
    # the batch dim stays sharded over any dp/fsdp mesh axes: each dp group
    # pipelines its own shard (pp composes with dp); tp must be 1 inside the
    # pipelined region (params enter the stage un-tp-split)
    from videotgb_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS

    batch_axes = tuple(a for a in (DATA_AXIS, FSDP_AXIS)
                       if a in mesh.axis_names and mesh.shape[a] > 1)
    dp_extent = 1
    for a in batch_axes:
        dp_extent *= mesh.shape[a]
    b = jax.tree.leaves(x)[0].shape[0]
    if b % (m * dp_extent) != 0:
        raise ValueError(
            f"batch {b} not divisible by microbatches*dp = {m}*{dp_extent}")
    b_local = b // dp_extent
    mb = b_local // m

    # stage-sharded params: leading layer axis split over pp
    pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    bspec = P(batch_axes) if batch_axes else P()
    xspec = jax.tree.map(lambda _: bspec, x)

    def stage_fn(params_local, x_rep):
        """Runs on every pp rank; params_local = (L/pp, ...) local layers,
        x_rep = this dp group's batch shard."""
        rank = jax.lax.axis_index(axis)
        micro = jax.tree.map(
            lambda a: a.reshape(m, mb, *a.shape[1:]), x_rep)

        def run_local(h):
            def body(carry, p):
                return layer_fn(p, carry), None
            out, _ = jax.lax.scan(body, h, params_local)
            return out

        out_buf = jax.tree.map(jnp.zeros_like, micro)
        h = jax.tree.map(lambda a: jnp.zeros(a.shape[1:], a.dtype), micro)

        def step(carry, t):
            h_in, out_buf = carry
            # stage 0 ingests microbatch t (garbage past the end is masked
            # out by the write guard below); later stages use the handoff
            feed = jax.tree.map(lambda a: a[jnp.minimum(t, m - 1)], micro)
            h = jax.tree.map(
                lambda f, hi: jnp.where(rank == 0, f, hi), feed, h_in)
            h = run_local(h)
            # the last stage finished microbatch (t - (pp-1)) at step t
            done_idx = t - (pp - 1)
            write = (rank == pp - 1) & (done_idx >= 0)

            def put(buf, val):
                updated = jax.lax.dynamic_update_slice_in_dim(
                    buf, val[None].astype(buf.dtype),
                    jnp.maximum(done_idx, 0), axis=0)
                return jnp.where(write, updated, buf)

            out_buf = jax.tree.map(put, out_buf, h)
            # hand my activation to the next stage (ring; the wraparound
            # last->first edge carries garbage that stage 0 overwrites)
            h_next = jax.tree.map(
                lambda a: jax.lax.ppermute(
                    a, axis, [(i, (i + 1) % pp) for i in range(pp)]), h)
            return (h_next, out_buf), None

        # scan (not fori/while): static trip count keeps the whole pipeline
        # reverse-differentiable
        (h, out_buf), _ = jax.lax.scan(
            step, (h, out_buf), jnp.arange(m + pp - 1))
        # deliver the last stage's outputs to every rank (replicated over pp)
        def collect(buf):
            mask = (rank == pp - 1).astype(buf.dtype)
            buf = jax.lax.psum(buf * mask, axis)
            return buf.reshape(b_local, *buf.shape[2:])

        return jax.tree.map(collect, out_buf)

    fn = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(pspec, xspec), out_specs=xspec,
        check_vma=False,
    )
    return fn(stacked_params, x)


def active_pp_mesh(axis: str = "pp") -> Mesh | None:
    """The ambient mesh when it has a ``pp`` axis of size > 1 (else None).

    Towers use this to decide at trace time whether their scanned layer
    stack should route through ``pipeline_apply`` (models/llama.py,
    models/t5.py)."""
    from videotgb_tpu.parallel.sharding import active_mesh

    mesh = active_mesh()
    if (mesh is not None and axis in mesh.axis_names
            and mesh.shape[axis] > 1):
        return mesh
    return None


def place_pipeline_params(stacked_params: Any, mesh: Mesh, axis: str = "pp"):
    """Device-put stacked layer params with the layer axis sharded over
    ``axis`` (stage s holds its contiguous layer block)."""
    return jax.tree.map(
        lambda p: jax.device_put(p, NamedSharding(mesh, P(axis))),
        stacked_params)
