"""The training loop: jitted sharded train step, grad accumulation, eval,
checkpointing, early stopping.

TPU-native replacement for lightning.Trainer as the reference uses it
(reference: src/train.py:60-98, configs/trainer/*.yaml): params/opt-state are
placed on the (dp, fsdp, tp, pp, sp) mesh by their logical annotations, the batch is
dp-sharded, and one jit'd step computes grads (accumulated over
``accumulate_grad_batches`` micro-batches with lax.scan), applies the masked
AdamW update, and returns host-reducible metric scalars. Checkpoints go
through Orbax (training.checkpoint); monitoring/early-stop mirror the
reference's ModelCheckpoint/EarlyStopping on a monitored metric
(configs/callbacks/default.yaml).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh
from videotgb_tpu.parallel.sharding import shard_batch
from videotgb_tpu.training.optim import cosine_warmup_schedule, make_optimizer
from videotgb_tpu.utils.logging import get_logger
from videotgb_tpu.utils.rng import RngStream

log = get_logger("videotgb.trainer")


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 1000
    lr: float = 5e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.05
    accumulate_grad_batches: int = 1
    max_grad_norm: float | None = 1.0
    # K train steps per host dispatch (lax.scan over a stacked batch window
    # with donated carry): amortizes the ~2x host-dispatch overhead measured
    # on the TG stage (ROOFLINE.md — 68.9 ms wall vs 31 ms device on the
    # 1-core harness). 1 = the ordinary per-step path. Recipes that need a
    # host pass between steps (SF pseudo-labels) fall back to 1 in fit().
    steps_per_dispatch: int = 1
    log_every: int = 50
    eval_every: int = 500
    checkpoint_every: int = 500
    monitor: str = "val/score"
    monitor_mode: str = "max"
    early_stop_patience: int | None = None
    # callbacks-group extras (reference configs/callbacks/model_summary.yaml
    # RichModelSummary max_depth, rich_progress_bar.yaml RichProgressBar)
    model_summary_depth: int | None = None
    progress_bar: bool = False
    seed: int = 42
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def param_summary(params: Any, mask: Any, max_depth: int) -> list[str]:
    """Depth-limited parameter table (the RichModelSummary analogue,
    reference configs/callbacks/model_summary.yaml): param counts grouped by
    the first ``max_depth`` path components, with trainable counts from the
    optimizer mask."""
    groups: dict[str, list[int]] = {}
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = jax.tree.leaves(mask)
    for (path, leaf), m in zip(flat_p, flat_m):
        name = "/".join(str(getattr(k, "key", k)) for k in path[:max_depth])
        g = groups.setdefault(name, [0, 0])
        n = int(jnp.size(leaf))
        g[0] += n
        if m:
            g[1] += n
    width = max(len(n) for n in groups) if groups else 0
    lines = [f"  {'module'.ljust(width)}  params      trainable"]
    for name in sorted(groups):
        total, train = groups[name]
        lines.append(f"  {name.ljust(width)}  {total / 1e6:8.2f}M  "
                     f"{train / 1e6:8.2f}M")
    return lines


class TrainState:
    """params + opt_state + step as a simple pytree-of-arrays holder."""

    def __init__(self, params: Any, opt_state: Any, step: jax.Array):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def as_tuple(self):
        return self.params, self.opt_state, self.step


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        loss_fn: Callable[[Any, dict, jax.Array], tuple[jax.Array, dict]],
        filter_fn: Callable | None = None,
        mesh: Mesh | None = None,
    ):
        """loss_fn(params, batch, key) -> (loss, aux dict of scalars/arrays)."""
        self.config = config
        self.loss_fn = loss_fn
        self.writers = None  # optional utils.writers.MultiWriter
        self.mesh = mesh or create_mesh(config.mesh)
        self.rng = RngStream(config.seed)
        schedule = cosine_warmup_schedule(
            config.lr, config.max_steps, config.warmup_ratio
        )
        self._schedule = schedule
        self._filter_fn = filter_fn
        self._tx = None
        self._train_step = None
        self._best = None
        self._stale_evals = 0

    # ------------------------------------------------------------- state init
    def init_state(self, params: Any, param_specs: Any = None) -> TrainState:
        """``param_specs`` (a PartitionSpec pytree from
        parallel.sharding.param_partition_spec) places params on the mesh —
        fsdp/tp sharding for the big towers; None leaves them replicated."""
        cfg = self.config
        if param_specs is not None:
            from jax.sharding import NamedSharding

            params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                params, param_specs)
        self._tx, mask = make_optimizer(
            params, self._schedule, cfg.weight_decay, self._filter_fn,
            cfg.max_grad_norm,
        )
        self._mask = mask
        n_train = sum(
            int(jnp.size(p)) for p, m in zip(
                jax.tree.leaves(params), jax.tree.leaves(mask)) if m
        )
        n_total = sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
        log.info("params: %.2fM trainable / %.2fM total",
                 n_train / 1e6, n_total / 1e6)
        if cfg.model_summary_depth:
            for line in param_summary(params, mask, cfg.model_summary_depth):
                log.info("%s", line)
        # jitted init inherits the param shardings for the optimizer state
        opt_state = jax.jit(self._tx.init)(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------- train step
    def _build_step(self):
        cfg = self.config
        accum = cfg.accumulate_grad_batches
        mask = getattr(self, "_mask", None)

        def loss_with_freeze(params, batch, key):
            # torch requires_grad=False parity (the reference freezes towers
            # that way, LSTP_SF_blip2_module.py:663-668): stop_gradient on
            # frozen leaves lets XLA prune their ENTIRE backward — a frozen
            # ViT-g costs zero backward FLOPs instead of a full masked-out
            # gradient pass — and grad-norm/clipping then count trainable
            # params only, like Lightning's clip over requires_grad params.
            if mask is not None and not all(jax.tree.leaves(mask)):
                params = jax.tree.map(
                    lambda m, p: p if m else jax.lax.stop_gradient(p),
                    mask, params)
            return self.loss_fn(params, batch, key)

        def single_grad(params, batch, key):
            (loss, aux), grads = jax.value_and_grad(loss_with_freeze, has_aux=True)(
                params, batch, key
            )
            return loss, aux, grads

        def step(params, opt_state, step_idx, batch, key):
            if accum == 1:
                loss, aux, grads = single_grad(params, batch, key)
            else:
                # micro-batches stacked on axis 0: (accum, B/accum, ...)
                keys = jax.random.split(key, accum)

                def scan_body(carry, inp):
                    micro, k = inp
                    loss, aux, grads = single_grad(params, micro, k)
                    acc_grads, acc_loss = carry
                    acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                    # scalar aux (mrc_loss/lm_loss breakdowns) stack per
                    # micro-batch and average below — the IVT recipe (accum 4
                    # in the reference) must keep its loss breakdown in logs
                    aux_scalars = {k2: v for k2, v in aux.items()
                                   if isinstance(v, jax.Array) and v.ndim == 0}
                    return (acc_grads, acc_loss + loss), aux_scalars

                zero = jax.tree.map(jnp.zeros_like, params)
                (grads, loss_sum), aux_stacked = jax.lax.scan(
                    scan_body, (zero, 0.0), (batch, keys)
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
                loss = loss_sum / accum
                aux = {k2: jnp.mean(v) for k2, v in aux_stacked.items()}
            updates, opt_state = self._tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            metrics = {"loss": loss, "grad_norm": gnorm,
                       "lr": self._schedule(step_idx)}
            for k, v in aux.items():
                if isinstance(v, jax.Array) and v.ndim == 0:
                    metrics[k] = v
            return params, opt_state, step_idx + 1, metrics

        self._step_body = step
        self._train_step = jax.jit(step, donate_argnums=(0, 1))

        def multi(params, opt_state, step_idx, batches, keys):
            # K substeps in one compiled program; each substep is the SAME
            # body as the single-step path (identical numerics/RNG sequence)
            def body(carry, inp):
                params, opt_state, step_idx = carry
                batch, key = inp
                params, opt_state, step_idx, metrics = step(
                    params, opt_state, step_idx, batch, key)
                return (params, opt_state, step_idx), metrics

            (params, opt_state, step_idx), metrics = jax.lax.scan(
                body, (params, opt_state, step_idx), (batches, keys))
            return params, opt_state, step_idx, metrics

        self._multi_step = jax.jit(multi, donate_argnums=(0, 1))

    def train_step(self, state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        if self._train_step is None:
            self._build_step()
        batch = shard_batch(batch, self.mesh)
        key = self.rng.fold(int(state.step), "train")
        # mesh context so in-model constrain_batch() pins activation shardings
        with self.mesh:
            params, opt_state, step, metrics = self._train_step(
                state.params, state.opt_state, state.step, batch, key
            )
        return TrainState(params, opt_state, step), metrics

    def train_step_multi(self, state: TrainState, window: dict
                         ) -> tuple[TrainState, dict]:
        """K train steps in ONE dispatch. ``window`` leaves are stacked
        (K, B, ...); the scan axis stays on-device, the batch axis shards
        over dp(+fsdp). Returns metrics stacked (K,) per key — substep i of
        the window computes exactly what K consecutive single train_step
        calls would (same per-step RNG fold), so resume/logging semantics
        are unchanged; only host dispatch is amortized."""
        if self._train_step is None:
            self._build_step()
        k_steps = int(jax.tree.leaves(window)[0].shape[0])
        base = int(state.step)
        keys = jnp.stack([self.rng.fold(base + i, "train")
                          for i in range(k_steps)])
        window = shard_batch(window, self.mesh, axis=1)
        with self.mesh:
            params, opt_state, step, metrics = self._multi_step(
                state.params, state.opt_state, state.step, window, keys)
        return TrainState(params, opt_state, step), metrics

    def _windows(self, train_iter: Iterable[dict], k: int,
                 state: TrainState) -> Iterable:
        """Group the batch stream into K-step windows for train_step_multi.

        Yields ``("window", stacked)`` tuples whose leaves are np.stack'd
        (K, B, ...) — host-side, shard_batch does the device_put — and falls
        back to yielding raw batches one at a time near the max_steps horizon
        or when the iterator ends mid-window, so the run stops at EXACTLY
        max_steps (K-step jumps never overshoot) and only ONE window shape
        ever compiles."""
        import numpy as np

        remaining = self.config.max_steps - int(state.step)
        buf: list[dict] = []
        for batch in train_iter:
            if remaining < k:
                # horizon closer than a full window: drain buffer + singles
                # (remaining counts buffered-but-unyielded steps too, so this
                # only triggers with an empty buffer)
                for b in buf:
                    remaining -= 1
                    yield b
                buf.clear()
                remaining -= 1
                yield batch
                if remaining <= 0:
                    return
                continue
            buf.append(batch)
            if len(buf) == k:
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *buf)
                buf.clear()
                remaining -= k
                yield ("window", stacked)
                if remaining <= 0:
                    return
        for b in buf:  # iterator exhausted mid-window
            yield b

    # ------------------------------------------------------------------ fit
    def fit(
        self,
        state: TrainState,
        train_iter: Iterable[dict],
        eval_fn: Callable[[TrainState], dict] | None = None,
        checkpoint_fn: Callable[[TrainState, dict], None] | None = None,
        batch_transform: Callable[[TrainState, dict], dict] | None = None,
    ) -> TrainState:
        """``batch_transform(state, batch)`` runs host-side per step with the
        CURRENT params — the hook for the SF pseudo-label scoring pass."""
        cfg = self.config
        if int(state.step) >= cfg.max_steps:
            return state  # resumed at/after the horizon: nothing to do
        # K-steps-per-dispatch only when no host pass runs between steps
        # (the SF pseudo-label transform needs current params every step)
        k_dispatch = cfg.steps_per_dispatch if batch_transform is None else 1
        t0 = time.perf_counter()
        feed = (self._windows(train_iter, k_dispatch, state)
                if k_dispatch > 1 else train_iter)
        for batch in feed:
            prev_step = int(state.step)
            if k_dispatch > 1 and isinstance(batch, tuple):
                state, stacked = self.train_step_multi(state, batch[1])
                metrics = {k: v[-1] for k, v in stacked.items()}
            else:
                if batch_transform is not None:
                    batch = batch_transform(state, batch)
                state, metrics = self.train_step(state, batch)
            step = int(state.step)

            def crossed(every):
                # boundary test that survives K-step jumps: true when any
                # step in (prev_step, step] is a multiple of ``every``
                # (== step % every == 0 for the K=1 path)
                return bool(every) and (step // every) > (prev_step // every)

            if cfg.progress_bar:
                # in-place per-step line (RichProgressBar analogue); the
                # loss fetch syncs the step, so keep it off for benchmarks
                print(f"\rstep {step}/{cfg.max_steps} "
                      f"loss={float(metrics['loss']):.4f}",
                      end="" if step < cfg.max_steps else "\n", flush=True)
            if crossed(cfg.log_every):
                host = {k: float(v) for k, v in metrics.items()}
                rate = step / (time.perf_counter() - t0)
                log.info("step %d %s (%.2f it/s)", step, host, rate)
                if self.writers is not None:
                    self.writers.log_metrics(host, step)
            if eval_fn is not None and crossed(cfg.eval_every):
                eval_metrics = eval_fn(state)
                log.info("eval @%d: %s", step, eval_metrics)
                if self.writers is not None:
                    self.writers.log_metrics(eval_metrics, step)
                if checkpoint_fn is not None:
                    checkpoint_fn(state, eval_metrics)
                if self._should_stop(eval_metrics):
                    log.info("early stopping at step %d", step)
                    break
            elif (checkpoint_fn is not None and cfg.checkpoint_every
                  and step % cfg.checkpoint_every == 0):
                # periodic save between eval ticks (metrics=None: recorded as
                # a resume point, never a "best" candidate) — long runs with
                # sparse evals must still survive preemption
                checkpoint_fn(state, None)
            if step >= cfg.max_steps:
                break
        return state

    def _should_stop(self, eval_metrics: dict) -> bool:
        cfg = self.config
        if cfg.early_stop_patience is None or cfg.monitor not in eval_metrics:
            return False
        value = eval_metrics[cfg.monitor]
        better = (
            self._best is None
            or (cfg.monitor_mode == "max" and value > self._best)
            or (cfg.monitor_mode == "min" and value < self._best)
        )
        if better:
            self._best = value
            self._stale_evals = 0
            return False
        self._stale_evals += 1
        return self._stale_evals >= cfg.early_stop_patience
