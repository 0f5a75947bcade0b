"""Training-step throughput benchmark on one TPU chip.

bench.py covers serving; this measures the TRAINING side against the
reference's own hardware budgets (BASELINE.md — the reference publishes no
throughput numbers, only its recipe shapes):

  stage | reference hardware/batch                      | mode here
  ------|-----------------------------------------------|-----------------
  TG    | 1 GPU, batch 32, 3 epochs                     | ``tg``
  SF    | 4 GPUs x batch 2 (global 8), bf16, 2 epochs   | ``sf``
  E2E   | batch 8 (LSTP_blip2flant5xl_videoinstruct)    | ``e2e``
  IV    | 4 GPUs x batch 4 (global 16), 3 epochs        | ``iv``
  IVT   | 4 GPUs x batch 1 x accum 4, bf16, 2 epochs    | ``ivt``

Modes (env ``BENCH_TRAIN_MODES``, default ``tg,ivt,sf``; ``iv``/``e2e``
cover the remaining recipes — all five flagship-scale except SF, whose
T5-xl optimizer state needs fsdp>=4):

* ``tg`` — flagship TGB sampler (RoPE-BERT-base over flow tokens +
  question fusion) through ``TGRecipe`` at the reference's single-device
  batch 32. Params are initialized through ``span_logits`` so only the
  sampler tree exists on chip (the TG stage never touches the backbone —
  reference LSTP_TG_blip2_module trains the sampler standalone).
* ``ivt`` — flagship BLIP2-Flan-T5-xl with LoRA r=8 through ``IVTRecipe``
  (trainable = Q-Former + projection + LoRA adapters; ViT-g/T5-xl frozen).
  Frozen leaves ride in bf16 residency (the torch recipe autocasts them,
  configs/experiment/*:24) so the whole thing FITS ONE v5e chip at the
  reference's effective batch (device batch 4 x accum 4 = 16); trainable
  leaves and their AdamW state stay f32.
* ``sf`` — the SF joint step (TGB span loss + backbone LM loss through the
  Gumbel selection) at the ``small`` preset, global batch 8. The flagship
  SF optimizer state (T5-xl AdamW, ~36 GB f32) requires fsdp>=4 chips —
  that sharding is validated by ``__graft_entry__.dryrun_multichip``; one
  chip measures the structure-true small preset. ``scores`` arrive
  synthetic (the host pseudo-label pass is an inference workload, benched
  on the serving side).

Env: BENCH_TRAIN_MODES, BENCH_TRAIN_PRESET (force one preset for all
modes; tests use ``tiny``), BENCH_TRAIN_STEPS (timed steps, default 6),
BENCH_TRAIN_BATCH / BENCH_TRAIN_ACCUM / BENCH_TRAIN_FLOW overrides,
BENCH_TRAIN_K (steps per dispatch for the windowed measurement; per-mode
defaults below — 0 disables).

Prints ONE JSON line:
  {"metric": "train_clips_per_sec_per_chip", "value": <tg clips/s>,
   "unit": "clips/s", "vs_baseline": ..., "per_mode": {...}}
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

import numpy as np


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


def _timed_steps(trainer, state, batch, n_steps: int):
    """Run warmup(compile) + timed steps two ways.

    Returns (pipelined_s, synced_s, compile_s, loss, state):

    * pipelined — n steps dispatched back-to-back, ONE loss fetch at the
      end. This is the cadence of real training (a trainer fetches metrics
      every log_every steps, not every step) and what the device actually
      sustains: each step's dispatch overlaps the previous step's execution.
    * synced — per-step with a loss fetch each step; on this harness the
      fetch alone costs ~25 ms of tunnel round-trip (TG flagship measured:
      31 ms device vs 104 ms synced wall — tools/traintraceprobe.py).
    """
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, batch)
    loss = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, batch)
        loss = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    synced_s = statistics.median(times)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = trainer.train_step(state, batch)
    loss = float(metrics["loss"])
    pipelined_s = (time.perf_counter() - t0) / n_steps
    return pipelined_s, synced_s, compile_s, loss, state


def _multi_fields(trainer, state, batch, k: int, flops, batch_size: int
                  ) -> dict:
    """K-window measurement with an OOM guard: the stacked window costs
    K x batch of HBM on top of params+activations, so a preset that fits
    per-step can exceed HBM windowed (flagship E2E did at K=2). An OOM is
    recorded as a skip note — the per-step number stands — instead of
    killing the remaining bench modes."""
    import jax

    try:
        multi_s, _, multi_loss = _timed_multi(trainer, state, batch, k)
    except jax.errors.JaxRuntimeError as e:
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        return {"steps_per_dispatch": k,
                "multi_note": "window OOM: K x batch exceeds HBM next to "
                              "params+activations; per-step path stands"}
    out = {"steps_per_dispatch": k,
           "step_ms_multi": round(multi_s * 1e3, 1),
           "clips_per_s_multi": round(batch_size / multi_s, 3),
           "loss_multi": round(multi_loss, 4)}
    out.update({f"{kk}_multi": v for kk, v in
                _mfu_fields(flops, multi_s).items()})
    return out


def _timed_multi(trainer, state, batch, k: int, n_disp: int = 3):
    """K-steps-per-dispatch (trainer.train_step_multi): ONE host dispatch
    scans K substeps on device — the dispatch/fetch overhead the pipelined
    number still pays once per step is paid once per K. The window stacks
    the same batch K times (memory: K x batch; callers pick K per mode)."""
    import jax
    import jax.numpy as jnp

    window = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (k, *x.shape)),
                          batch)
    t0 = time.perf_counter()
    state, stacked = trainer.train_step_multi(state, window)
    float(stacked["loss"][-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, stacked = trainer.train_step_multi(state, window)
    loss = float(stacked["loss"][-1])
    per_step_s = (time.perf_counter() - t0) / (n_disp * k)
    return per_step_s, compile_s, loss


def _cost_flops(lowered) -> float | None:
    """FLOPs of a lowered computation, robust to this backend.

    ``Lowered.cost_analysis()`` returns None on the axon tunnel client (it
    doesn't implement HLO cost analysis; probed 2026-08-20) — fall back to
    running XLA's analysis client-side on the in-process CPU client over
    the same lowered HLO module. Pure static analysis: no remote compile,
    no device work."""
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else None
    if cost and "flops" in cost:
        return float(cost["flops"])
    try:
        import jax.extend.backend as xb
        from jax._src.lib import xla_client as xc

        mod = lowered.compiler_ir("hlo")
        props = xc._xla.hlo_module_cost_analysis(
            xb.get_backend("cpu"),
            mod.as_hlo_module() if hasattr(mod, "as_hlo_module") else mod)
        return float(props["flops"])
    except Exception:
        return None


def _flops_per_step(trainer, state, batch) -> float | None:
    """XLA cost-analysis FLOPs of ONE compiled train step (fwd+bwd+update).

    Abstract-lowered (ShapeDtypeStructs — the donated buffers from timing
    are gone) and read client-side from the StableHLO, so no extra remote
    compile. XLA counts a lax.scan body ONCE, so multiply grad-accum scans
    back in at the caller if needed; here accum microbatches are stacked in
    the batch operand, and the RAFT/decoder loops don't appear in training
    steps benched here. Returns None when the backend can't cost it."""
    import jax

    try:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (state.params, state.opt_state, state.step, batch,
             trainer.rng.fold(0, "train")))
        return _cost_flops(trainer._train_step.lower(*abstract))
    except Exception:
        return None


def _stop_frozen(params, filter_fn):
    """stop_gradient on frozen leaves — the trainer's loss_with_freeze mask,
    reproduced for the cost model so frozen towers' pruned backward doesn't
    inflate the FLOP count."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [leaf if filter_fn(path, leaf) else jax.lax.stop_gradient(leaf)
           for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, out)


def _grad_flops(model, recipe, abstract_params, batch,
                accum_scans: int = 1) -> float | None:
    """Cost-analysis FLOPs of one fwd+bwd on an UNROLLED model.

    XLA's cost analysis counts a while/scan body ONCE (verified on this
    toolchain: a 10-iter scan of a matmul costs 1 matmul), so scanned-tower
    (nn.scan) steps undercount by ~depth x. Callers bench a scanned model
    but pass the unrolled twin here — same math, every layer visible to the
    counter. The optimizer update (~2 x params FLOPs) is omitted as noise.
    """
    import jax

    def gfn(p, b, k):
        def loss(pp):
            return recipe.loss_fn(model, _stop_frozen(pp, recipe.filter_fn),
                                  b, k)[0]
        return jax.grad(loss)(p)

    try:
        sds = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
        key = jax.random.key(0)
        lowered = jax.jit(gfn).lower(abstract_params, sds(batch), sds(key))
        flops = _cost_flops(lowered)
        return flops * accum_scans if flops else None
    except Exception:
        return None


# v5e bf16 peak (chip spec) and the measured matmul ceiling on this chip
# (tools/perfprobe.py: ViT-shaped MLP matmuls sustain ~167 TF/s)
CHIP_PEAK_TFLOPS = 197.0
MATMUL_CEILING_TFLOPS = 167.0


def _mfu_fields(flops: float | None, step_s: float, accum_scans: int = 1
                ) -> dict:
    if not flops or step_s <= 0:
        return {}
    tfs = flops * accum_scans / step_s / 1e12
    return {"tflops_achieved": round(tfs, 1),
            "mfu": round(tfs / CHIP_PEAK_TFLOPS, 3),
            "mfu_vs_matmul_ceiling": round(tfs / MATMUL_CEILING_TFLOPS, 3)}


def _count(tree) -> float:
    import jax

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree)) / 1e6


def _trainer(recipe, model, batch_size: int, accum: int = 1):
    import jax

    from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh
    from videotgb_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(max_steps=100, lr=5e-5, accumulate_grad_batches=accum,
                        log_every=1_000_000, eval_every=1_000_000)
    # per-chip benchmark: pin the mesh to ONE device (the default dp=-1
    # would absorb every visible device — 8 on the CPU test backend)
    mesh = create_mesh(MeshConfig(dp=1), jax.devices()[:1])
    return Trainer(cfg,
                   loss_fn=lambda p, b, k: recipe.loss_fn(model, p, b, k),
                   filter_fn=recipe.filter_fn, mesh=mesh)


def _freeze_bf16(params, filter_fn):
    """bf16 residency for FROZEN leaves only (leaf-wise, freeing each f32
    buffer): the flagship backbone would not fit in f32 next to activations.
    Trainable leaves (and therefore optimizer state) stay f32 — the same
    split torch autocast training keeps."""
    import jax
    import jax.numpy as jnp

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves_with_path, treedef = flat
    out = []
    for path, leaf in leaves_with_path:
        if (not filter_fn(path, leaf)
                and getattr(leaf, "dtype", None) == jnp.float32):
            out.append(leaf.astype(jnp.bfloat16))
        else:
            out.append(leaf)
    del leaves_with_path, flat
    return jax.tree_util.tree_unflatten(treedef, out)


def _scan_all(cfg):
    """scan_layers on every tower: one compiled layer body per tower keeps
    flagship train-step compiles tractable (same knob as bench.py)."""
    import bench

    return bench._scan_layers(cfg)


# --------------------------------------------------------------------- modes
def bench_tg(preset: str, n_steps: int) -> dict:
    """Reference TG stage: sampler-only training, 1 device, batch 32."""
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training.recipes import TGRecipe

    cfg = getattr(VideoTGBConfig, preset)()
    model = VideoTGB(cfg)
    batch = _env_int("BENCH_TRAIN_BATCH", 32 if preset != "tiny" else 2)
    flow_len = _env_int("BENCH_TRAIN_FLOW",
                        64 if preset != "tiny" else cfg.num_frames)
    fs = cfg.tgb.flow_size
    text_len = 24
    rng = np.random.default_rng(0)

    flow = jnp.asarray(rng.standard_normal((batch, flow_len, fs, fs, 2)),
                       jnp.float32)
    flow_mask = jnp.ones((batch, flow_len + 2), jnp.float32)
    sq_ids = jnp.asarray(
        rng.integers(100, min(cfg.tgb.vocab_size, 5000), (batch, text_len)),
        jnp.int32)
    sq_mask = jnp.ones((batch, text_len), jnp.float32)
    starts = rng.integers(0, flow_len, (batch,))
    ends = np.minimum(starts + rng.integers(0, flow_len, (batch,)),
                      flow_len - 1)
    dbatch = {
        "flow": flow, "flow_mask": flow_mask,
        "sampler_question_ids": sq_ids, "sampler_question_mask": sq_mask,
        "starts": jnp.asarray(starts, jnp.int32),
        "ends": jnp.asarray(ends, jnp.int32),
    }

    # sampler-only param tree: a multi_modal span_logits pass touches every
    # TGB submodule (the init invariant — fusion mode uses a subset)
    key = jax.random.key(0)
    from flax import linen as nn

    variables = jax.jit(lambda k: model.init(
        k, flow[:1], flow_mask[:1], sq_ids[:1], sq_mask[:1],
        mode="multi_modal", method=model.span_logits))(key)
    params = nn.meta.unbox(variables)["params"]
    jax.block_until_ready(params)

    recipe = TGRecipe()
    trainer = _trainer(recipe, model, batch)
    state = trainer.init_state(params)
    pipe_s, sync_s, compile_s, loss, state = _timed_steps(
        trainer, state, dbatch, n_steps)
    out = {
        "batch": batch, "flow_len": flow_len,
        "step_ms": round(pipe_s * 1e3, 1),
        "step_ms_synced": round(sync_s * 1e3, 1),
        "clips_per_s": round(batch / pipe_s, 3),
        "compile_s": round(compile_s, 1),
        "params_trainable_millions": round(_count(params), 1),
        "loss": round(loss, 4),
        "reference_budget": "1 GPU, batch 32",
    }
    flops = _flops_per_step(trainer, state, dbatch)
    out.update(_mfu_fields(flops, pipe_s))
    # TG is the dispatch-bound stage (ROOFLINE: 68.9 ms wall vs 31 ms
    # device) — the K-steps-per-dispatch window is its measured answer
    k = _env_int("BENCH_TRAIN_K", 8)
    if k > 1:
        out.update(_multi_fields(trainer, state, dbatch, k, flops, batch))
    return out


def bench_ivt(preset: str, n_steps: int) -> dict:
    """Reference IVT stage: LoRA + Q-Former training, frozen towers bf16,
    device batch 4 x accum 4 (the reference's 1/GPU x 4 GPUs x accum 4)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training.recipes import IVTRecipe

    cfg = getattr(VideoTGBConfig, preset)()
    t5 = dataclasses.replace(cfg.blip2.t5, lora_rank=8)
    cfg = dataclasses.replace(cfg, blip2=dataclasses.replace(cfg.blip2, t5=t5))
    cfg_unrolled = cfg  # cost-model twin: scan bodies count once (see _grad_flops)
    if preset == "flagship":
        cfg = _scan_all(cfg)
    model = VideoTGB(cfg)

    micro = _env_int("BENCH_TRAIN_BATCH", 4 if preset != "tiny" else 2)
    accum = _env_int("BENCH_TRAIN_ACCUM", 4 if preset != "tiny" else 2)
    image = cfg.blip2.vit.image_size
    nframe = cfg.nframe
    text_len, ans_len = 32, 32
    rng = np.random.default_rng(0)
    vocab = cfg.blip2.t5.vocab_size

    def micro_batch(i):
        r = np.random.default_rng(i)
        return {
            "frames": r.standard_normal(
                (micro, nframe, image, image, 3)).astype(np.float32),
            "widths": np.full((micro,), nframe, np.int32),
            "question_ids": r.integers(
                100, min(vocab, 5000), (micro, text_len)).astype(np.int32),
            "question_mask": np.ones((micro, text_len), np.float32),
            "answer_ids": r.integers(
                100, min(vocab, 5000), (micro, ans_len)).astype(np.int32),
            "answer_mask": np.ones((micro, ans_len), np.float32),
        }

    # accumulation: micro-batches stacked on axis 0 (trainer scan contract)
    stacked = jax.tree.map(lambda *x: jnp.asarray(np.stack(x)),
                           *[micro_batch(i) for i in range(accum)])

    key = jax.random.key(0)
    mb0 = jax.tree.map(lambda x: x[0][:1], stacked)
    recipe = IVTRecipe()
    # frozen towers -> bf16 INSIDE the init jit: a post-hoc cast holds the
    # full f32 tree (16.3 GB) and the bf16 copies simultaneously — OOMs the
    # chip. Under jit, XLA's liveness analysis frees each f32 init buffer at
    # its cast, so peak stays ~the bf16 tree. AdamW state is then allocated
    # for the f32 trainable subset only.
    variables = jax.jit(lambda k: _freeze_bf16(
        nn.meta.unbox(model.init(
            k, mb0["frames"], mb0["question_ids"], mb0["question_mask"],
            mb0["answer_ids"], None, None, True, None,
            method=_ivt_init_method))["params"],
        recipe.filter_fn))(key)
    params = variables
    jax.block_until_ready(params)
    trainer = _trainer(recipe, model, micro, accum=accum)
    state = trainer.init_state(params)
    pipe_s, sync_s, compile_s, loss, state = _timed_steps(
        trainer, state, stacked, n_steps)
    eff = micro * accum
    out = {
        "batch": micro, "accum": accum, "effective_batch": eff,
        "step_ms": round(pipe_s * 1e3, 1),
        "step_ms_synced": round(sync_s * 1e3, 1),
        "clips_per_s": round(eff / pipe_s, 3),
        "compile_s": round(compile_s, 1),
        "params_total_millions": round(_count(params), 1),
        "loss": round(loss, 4),
        "reference_budget": "4 GPUs, batch 1/GPU x accum 4",
    }
    # FLOP count on the unrolled twin (scanned towers count once in the
    # scanned graph), one micro-batch x accum
    model_u = VideoTGB(cfg_unrolled) if preset == "flagship" else model
    aparams = jax.eval_shape(lambda k: nn.meta.unbox(model_u.init(
        k, mb0["frames"], mb0["question_ids"], mb0["question_mask"],
        mb0["answer_ids"], None, None, True, None,
        method=_ivt_init_method))["params"], key)
    micro_b = jax.tree.map(lambda x: x[0], stacked)
    out.update(_mfu_fields(
        _grad_flops(model_u, recipe, aparams, micro_b, accum_scans=accum),
        pipe_s))
    # no K-window by default: the 543 ms flagship step is compute-bound
    # (dispatch ~5%) and a K-stacked window multiplies the 3 GB frame batch
    return out


def _ivt_init_method(mdl, frames, q_ids, q_mask, a_ids, qf_ids, qf_mask,
                     mean_pool, visual_valid):
    return mdl.model(frames, q_ids, q_mask, a_ids, mean_pool=mean_pool,
                     visual_valid=visual_valid, qformer_input_ids=qf_ids,
                     qformer_attention_mask=qf_mask)


def bench_iv(preset: str, n_steps: int) -> dict:
    """Reference IV stage: Q-Former (+projection) only trains, frames arrive
    pre-selected. Reference budget 4 GPUs x batch 4 — the global batch 16
    runs on one chip here (frozen towers bf16, same residency as ivt)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training.recipes import IVRecipe

    cfg = getattr(VideoTGBConfig, preset)()
    cfg_unrolled = cfg
    if preset == "flagship":
        cfg = _scan_all(cfg)
    model = VideoTGB(cfg)

    batch = _env_int("BENCH_TRAIN_BATCH", 16 if preset != "tiny" else 2)
    image = cfg.blip2.vit.image_size
    nframe = cfg.nframe
    text_len, ans_len = 32, 32
    rng = np.random.default_rng(0)
    vocab = cfg.blip2.t5.vocab_size
    dbatch = {
        "frames": jnp.asarray(rng.standard_normal(
            (batch, nframe, image, image, 3)), jnp.float32),
        "widths": jnp.full((batch,), nframe, jnp.int32),
        "question_ids": jnp.asarray(rng.integers(
            100, min(vocab, 5000), (batch, text_len)), jnp.int32),
        "question_mask": jnp.ones((batch, text_len), jnp.float32),
        "answer_ids": jnp.asarray(rng.integers(
            100, min(vocab, 5000), (batch, ans_len)), jnp.int32),
        "answer_mask": jnp.ones((batch, ans_len), jnp.float32),
    }

    key = jax.random.key(0)
    recipe = IVRecipe()
    variables = jax.jit(lambda k: _freeze_bf16(
        nn.meta.unbox(model.init(
            k, dbatch["frames"][:1], dbatch["question_ids"][:1],
            dbatch["question_mask"][:1], dbatch["answer_ids"][:1],
            None, None, True, None,
            method=_ivt_init_method))["params"],
        recipe.filter_fn))(key)
    params = variables
    jax.block_until_ready(params)

    trainer = _trainer(recipe, model, batch)
    state = trainer.init_state(params)
    pipe_s, sync_s, compile_s, loss, state = _timed_steps(
        trainer, state, dbatch, n_steps)
    out = {
        "batch": batch,
        "step_ms": round(pipe_s * 1e3, 1),
        "step_ms_synced": round(sync_s * 1e3, 1),
        "clips_per_s": round(batch / pipe_s, 3),
        "compile_s": round(compile_s, 1),
        "params_total_millions": round(_count(params), 1),
        "loss": round(loss, 4),
        "reference_budget": "4 GPUs, batch 4/GPU (global 16)",
    }
    model_u = VideoTGB(cfg_unrolled) if preset == "flagship" else model
    aparams = jax.eval_shape(lambda k: nn.meta.unbox(model_u.init(
        k, dbatch["frames"][:1], dbatch["question_ids"][:1],
        dbatch["question_mask"][:1], dbatch["answer_ids"][:1],
        None, None, True, None,
        method=_ivt_init_method))["params"], key)
    out.update(_mfu_fields(_grad_flops(model_u, recipe, aparams, dbatch),
                           pipe_s))
    return out


def bench_sf(preset: str, n_steps: int, recipe=None,
             budget: str = "4 GPUs, batch 2/GPU (global 8)",
             k_dispatch: int = 8) -> dict:
    """Reference SF stage at the reference's global batch 8. Flagship SF
    needs fsdp>=4 for the T5-xl AdamW state; ``small`` is the one-chip
    structure-true stand-in (same towers/selection pipeline, reduced
    depth/width)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training.recipes import SFRecipe

    cfg = getattr(VideoTGBConfig, preset)()
    cfg_unrolled = cfg
    if preset == "flagship":
        cfg = _scan_all(cfg)
    model = VideoTGB(cfg)
    batch = _env_int("BENCH_TRAIN_BATCH", 8 if preset != "tiny" else 2)
    flow_len = _env_int("BENCH_TRAIN_FLOW",
                        32 if preset != "tiny" else cfg.num_frames)
    image = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size
    text_len = 24
    rng = np.random.default_rng(0)
    vocab = cfg.blip2.t5.vocab_size

    dbatch = {
        "frames": jnp.asarray(rng.standard_normal(
            (batch, cfg.num_frames, image, image, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal(
            (batch, flow_len, fs, fs, 2)), jnp.float32),
        "flow_mask": jnp.ones((batch, flow_len + 2), jnp.float32),
        "video_length": jnp.full((batch,), flow_len, jnp.int32),
        "sampler_question_ids": jnp.asarray(rng.integers(
            100, min(cfg.tgb.vocab_size, 5000), (batch, text_len)), jnp.int32),
        "sampler_question_mask": jnp.ones((batch, text_len), jnp.float32),
        "question_ids": jnp.asarray(rng.integers(
            100, min(vocab, 5000), (batch, text_len)), jnp.int32),
        "question_mask": jnp.ones((batch, text_len), jnp.float32),
        "answer_ids": jnp.asarray(rng.integers(
            100, min(vocab, 5000), (batch, 16)), jnp.int32),
        "scores": jnp.asarray(rng.random((batch, cfg.num_frames)),
                              jnp.float32),
    }

    key = jax.random.key(0)
    recipe = recipe if recipe is not None else SFRecipe()

    def _init(k):
        p = nn.meta.unbox(model.init(
            k, dbatch["frames"][:1], dbatch["flow"][:1],
            dbatch["flow_mask"][:1], dbatch["video_length"][:1],
            dbatch["sampler_question_ids"][:1],
            dbatch["sampler_question_mask"][:1], dbatch["question_ids"][:1],
            dbatch["question_mask"][:1], k,
            method=model.init_pipeline))["params"]
        # flagship towers don't fit f32 next to activations — frozen leaves
        # ride bf16 (cast inside this jit; see bench_ivt); small/tiny keep
        # f32 for test-numerics comparability
        return _freeze_bf16(p, recipe.filter_fn) if preset == "flagship" else p

    params = jax.jit(_init)(key)
    jax.block_until_ready(params)

    trainer = _trainer(recipe, model, batch)
    state = trainer.init_state(params)
    pipe_s, sync_s, compile_s, loss, state = _timed_steps(
        trainer, state, dbatch, n_steps)
    out = {
        "batch": batch, "flow_len": flow_len, "preset": preset,
        "step_ms": round(pipe_s * 1e3, 1),
        "step_ms_synced": round(sync_s * 1e3, 1),
        "clips_per_s": round(batch / pipe_s, 3),
        "compile_s": round(compile_s, 1),
        "params_total_millions": round(_count(params), 1),
        "loss": round(loss, 4),
        "reference_budget": budget,
    }
    model_u = VideoTGB(cfg_unrolled) if preset == "flagship" else model
    aparams = jax.eval_shape(lambda k: nn.meta.unbox(model_u.init(
        k, dbatch["frames"][:1], dbatch["flow"][:1],
        dbatch["flow_mask"][:1], dbatch["video_length"][:1],
        dbatch["sampler_question_ids"][:1],
        dbatch["sampler_question_mask"][:1], dbatch["question_ids"][:1],
        dbatch["question_mask"][:1], k,
        method=model_u.init_pipeline))["params"], key)
    flops = _grad_flops(model_u, recipe, aparams, dbatch)
    out.update(_mfu_fields(flops, pipe_s))
    k = _env_int("BENCH_TRAIN_K", k_dispatch)
    if k > 1:
        out.update(_multi_fields(trainer, state, dbatch, k, flops, batch))
    return out


def bench_e2e(preset: str, n_steps: int) -> dict:
    """Reference E2E stage (LSTP_blip2_module): TGB + Q-Former train through
    the Gumbel selection, ViT/LLM/RAFT frozen — light enough trainable set
    that the FLAGSHIP runs on one chip (frozen towers bf16). Reference
    budget: batch 8."""
    from videotgb_tpu.training.recipes import E2ERecipe

    # K=2: the flagship E2E step is compute-bound (~340 ms) and the window
    # doubles the 600 MB f32 frame batch — enough to see the dispatch share
    return bench_sf(preset, n_steps, recipe=E2ERecipe(),
                    budget="reference batch 8", k_dispatch=2)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/root/.jax_cache"))
    from bench import wait_for_compiler

    wait_for_compiler(float(os.environ.get("BENCH_COMPILE_WAIT_S", "900")))
    modes = os.environ.get("BENCH_TRAIN_MODES", "tg,ivt,sf").split(",")
    n_steps = _env_int("BENCH_TRAIN_STEPS", 6)
    forced = os.environ.get("BENCH_TRAIN_PRESET")

    runners = {"tg": (bench_tg, "flagship"), "ivt": (bench_ivt, "flagship"),
               "iv": (bench_iv, "flagship"), "e2e": (bench_e2e, "flagship"),
               "sf": (bench_sf, "small")}
    per_mode = {}
    for mode in modes:
        mode = mode.strip()
        if mode not in runners:
            raise SystemExit(f"unknown BENCH_TRAIN_MODES entry {mode!r}")
        fn, default_preset = runners[mode]
        try:
            per_mode[mode] = fn(forced or default_preset, n_steps)
        except Exception as e:  # noqa: BLE001 — a wedged device after a
            # caught OOM must not lose the modes already measured
            per_mode[mode] = {"error": f"{type(e).__name__}: {e}"[:300]}
        # progress to stderr so a late-mode failure can't lose earlier
        # modes' measurements (the one-line JSON below stays the artifact)
        print(f"[bench_train] {mode}: {json.dumps(per_mode[mode])}",
              file=sys.stderr, flush=True)
        # free the mode's HBM before the next one: flax/trainer pytrees sit
        # in reference cycles, so without an explicit collect a flagship
        # mode's ~8 GB param+opt tree can outlive its frame and OOM the
        # next mode's batch upload (observed: e2e -> sf, 2026-08-20).
        # clear_caches drops the dead jitted executables too; the tiny
        # allocate+fetch drains the async queue so the frees land before
        # the next mode allocates. Best-effort: after an in-mode OOM was
        # caught (the e2e K-window) the device can stay wedged — even a
        # scalar alloc fails — so a cleanup failure must not lose the
        # measured modes; order OOM-prone modes last.
        import gc

        try:
            gc.collect()
            jax.clear_caches()
            gc.collect()
            import jax.numpy as jnp

            float(jnp.zeros((), jnp.float32) + 1.0)
        except Exception as e:  # noqa: BLE001
            print(f"[bench_train] inter-mode cleanup probe failed "
                  f"({type(e).__name__}) — device may be wedged from a "
                  f"caught OOM; later modes may fail", file=sys.stderr,
                  flush=True)

    ok_modes = {k: v for k, v in per_mode.items() if "clips_per_s" in v}
    headline = ok_modes.get("tg") or next(iter(ok_modes.values()))
    # the K-steps-per-dispatch cadence is a real trainer mode
    # (TrainerConfig.steps_per_dispatch) — the headline is the best
    # sustainable per-chip rate of the two
    best = max(headline["clips_per_s"],
               headline.get("clips_per_s_multi", 0.0))
    print(json.dumps({
        "metric": "train_clips_per_sec_per_chip",
        "value": best,
        "unit": "clips/s",
        # no reference throughput exists (BASELINE.md: accuracy only);
        # vs_baseline compares against the reference's per-device batch
        # cadence of 1 step/s as a neutral anchor = clips/s / batch
        "vs_baseline": round(best / headline["batch"], 3),
        "per_mode": per_mode,
    }))


if __name__ == "__main__":
    main()
