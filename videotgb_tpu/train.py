"""Training entry point: ``python -m videotgb_tpu.train experiment=...``.

The TPU equivalent of the reference's hydra entry (reference:
src/train.py:35-132): compose the config tree, build datamodule + model +
recipe + trainer, fit with checkpointing/early-stop, optionally test.
Overrides use the same dotted grammar (``model.optimizer.lr=1e-4``,
``experiment=LSTP_TG_blip2flant5xl_videoinstruct``).
"""

from __future__ import annotations

import os
import sys
import jax
import numpy as np

from videotgb_tpu.config import Config, compose
from videotgb_tpu.utils.logging import get_logger

log = get_logger("videotgb.train")

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def build_model(cfg: Config):
    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig

    preset = cfg.model.get("preset", "flagship")
    backbone = cfg.model.get("backbone", "blip2")
    mcfg = getattr(VideoTGBConfig, preset)(backbone)
    if cfg.model.get("lora_rank"):
        import dataclasses

        if mcfg.backbone == "blip2":  # incl. the normalized instructblip_t5
            t5 = dataclasses.replace(mcfg.blip2.t5, lora_rank=cfg.model.lora_rank)
            mcfg = dataclasses.replace(
                mcfg, blip2=dataclasses.replace(mcfg.blip2, t5=t5))
        else:
            llm = dataclasses.replace(mcfg.instructblip.llm,
                                      lora_rank=cfg.model.lora_rank)
            mcfg = dataclasses.replace(
                mcfg,
                instructblip=dataclasses.replace(mcfg.instructblip, llm=llm))
    return VideoTGB(mcfg), mcfg


def build_recipe(cfg: Config):
    from videotgb_tpu.training.recipes import RECIPES

    name = cfg.model.get("recipe", "tg")
    kwargs = {}
    if name in ("tg", "sf", "e2e") and cfg.model.get("tgb_mode"):
        kwargs["mode"] = cfg.model.tgb_mode
    if name == "sf" and cfg.model.get("online_flow"):
        # RAFT inside the train step instead of precomputed flow (reference
        # LSTP_SF_small_module.py: xraft.RAFT instantiated in setup())
        kwargs["online_flow"] = True
    if name == "e2e" and cfg.model.get("selection"):
        # "tgb" (LSTP_module.py live Gumbel selection) vs "uniform"
        # (LSTP_blip2_module.py baseline branch)
        kwargs["selection"] = cfg.model.selection
    return RECIPES[name](**kwargs)


def apply_callbacks(cfg: Config, tcfg) -> dict:
    """Map the ``callbacks`` config group (reference
    configs/callbacks/{default,model_checkpoint,early_stopping}.yaml) onto the
    trainer: early_stopping -> TrainerConfig monitor/mode/patience,
    model_checkpoint.every_n_train_steps -> checkpoint_every. Returns the
    None-stripped model_checkpoint knobs for CheckpointConfig.

    Monitor precedence: an explicit ``trainer.monitor`` key (every
    configs/trainer/*.yaml sets one; experiment overlays override it) wins
    over the callbacks group's monitor — the two sources agree in every
    shipped config (the overlays mirror the reference's callbacks sections
    AND set trainer.monitor), so this only matters for hand-rolled configs
    where the trainer key is the established knob."""
    cbs = cfg.get("callbacks") or Config()
    mc = {k: v for k, v in (cbs.get("model_checkpoint") or {}).items()
          if v is not None}
    es = {k: v for k, v in (cbs.get("early_stopping") or {}).items()
          if v is not None}
    monitor = es.get("monitor", mc.get("monitor"))
    if monitor == "???":
        raise ValueError("callbacks.early_stopping.monitor must be set "
                         "(reference configs/callbacks/early_stopping.yaml)")
    trainer_has_monitor = "monitor" in (cfg.get("trainer") or {})
    if monitor and not trainer_has_monitor:
        tcfg.monitor = monitor
        tcfg.monitor_mode = es.get("mode", mc.get("mode", tcfg.monitor_mode))
    if es:
        tcfg.early_stop_patience = es.get("patience",
                                          tcfg.early_stop_patience)
    if mc.get("every_n_train_steps"):
        tcfg.checkpoint_every = mc["every_n_train_steps"]
    ms = cbs.get("model_summary")
    if ms is not None:
        tcfg.model_summary_depth = (ms or {}).get("max_depth", 1)
    if "rich_progress_bar" in cbs:
        tcfg.progress_bar = True
    return mc


def build_data(cfg: Config, mcfg):
    from videotgb_tpu.data.datasets import (
        SyntheticVideoQA, VideoInstructDataset, collate_videoinstruct,
    )
    from videotgb_tpu.data.loader import PrefetchLoader
    from videotgb_tpu.data.tokenizer import load_tokenizer

    dcfg = cfg.data
    tok = load_tokenizer(dcfg.get("tokenizer"))
    sampler_tok = load_tokenizer(dcfg.get("sampler_tokenizer"))
    kind = dcfg.get("name", "synthetic")
    common = dict(
        num_frames=mcfg.num_frames,
        max_flow_len=dcfg.get("max_flow_len", 64),
        nframe=mcfg.nframe,
        image_size=mcfg.blip2.vit.image_size if mcfg.blip2 else
        mcfg.instructblip.vit.image_size,
    )
    if kind == "synthetic":
        train_ds = SyntheticVideoQA(
            length=dcfg.get("train_size", 64),
            flow_size=mcfg.tgb.flow_size,
            flow_len_range=tuple(dcfg.get("flow_len_range", (8, 64))),
            seed=cfg.get("seed", 0), **common)
        val_ds = SyntheticVideoQA(
            length=dcfg.get("val_size", 16), flow_size=mcfg.tgb.flow_size,
            flow_len_range=tuple(dcfg.get("flow_len_range", (8, 64))),
            seed=cfg.get("seed", 0) + 1, **common)
    elif kind == "videoinstruct":
        train_ds = VideoInstructDataset(
            dcfg.text_dir, dcfg.video_dir, dcfg.of_dir, split="train", **common)
        val_ds = VideoInstructDataset(
            dcfg.text_dir, dcfg.video_dir, dcfg.of_dir, split="val", **common)
    elif kind in ("iv", "ivt"):
        import os as _os

        from videotgb_tpu.data.datasets import IVInstructDataset, collate_iv

        def _split_paths(split):
            """text_dir layout parity (reference ivinstruct_dataset.py:52,202,
            ivtinstruct_dataset.py:218): {split}.json + pseudo_label.json
            (+ nlp_tune.json text-only rows for ivt). An explicit
            data.text_path/text_only_path/pseudo_label_path overrides."""
            td = dcfg.get("text_dir")
            text = dcfg.get("text_path") or _os.path.join(td, f"{split}.json")
            pseudo = dcfg.get("pseudo_label_path") or (
                _os.path.join(td, "pseudo_label.json") if td else None)
            text_only = dcfg.get("text_only_path") or (
                _os.path.join(td, "nlp_tune.json") if td else None)
            return text, pseudo, text_only

        def mk(split):
            text, pseudo, text_only = _split_paths(split)
            return IVInstructDataset(
                text, dcfg.image_dir, dcfg.video_dir, split=split,
                nframe=mcfg.nframe, image_size=common["image_size"],
                include_text_only=(kind == "ivt"),
                text_only_path=text_only,
                pseudo_label_path=pseudo,
            )
        train_ds, val_ds = mk("train"), mk("val")

        # instruction-aware backbones read the prompt through the
        # bert-vocab qformer tokenizer (the sampler tokenizer family)
        instruction_aware = mcfg.instruction_aware

        def collate(samples):
            return collate_iv(samples, tok, nframe=mcfg.nframe,
                              image_size=common["image_size"],
                              max_txt_len=dcfg.get("max_txt_len", 128),
                              answer_len=dcfg.get("answer_len", 32),
                              qformer_tokenizer=(sampler_tok
                                                 if instruction_aware else None))

        loader_kw = dict(batch_size=dcfg.get("batch_size", 2),
                         collate_fn=collate,
                         num_workers=dcfg.get("num_workers", 8),
                         seed=cfg.get("seed", 0))
        return (PrefetchLoader(train_ds, shuffle=True, **loader_kw),
                PrefetchLoader(val_ds, shuffle=False, **loader_kw), tok)
    else:
        raise ValueError(f"unknown data.name {kind}")

    def collate(samples):
        return collate_videoinstruct(
            samples, tok, sampler_tok,
            max_flow_len=common["max_flow_len"],
            max_txt_len=dcfg.get("max_txt_len", 128),
            nframe=mcfg.nframe,
            answer_len=dcfg.get("answer_len", 32),
        )

    loader_kw = dict(
        batch_size=dcfg.get("batch_size", 2),
        collate_fn=collate,
        num_workers=dcfg.get("num_workers", 8),
        seed=cfg.get("seed", 0),
    )
    return (PrefetchLoader(train_ds, shuffle=True, **loader_kw),
            PrefetchLoader(val_ds, shuffle=False, **loader_kw), tok)


def evaluate_tg(model, recipe, state, loader, tok) -> dict[str, float]:
    """TG-stage validation: span IoU metrics
    (reference: LSTP_TG_blip2_module.py:397-451)."""
    import jax.numpy as jnp

    from videotgb_tpu.data.loader import device_batch
    from videotgb_tpu.training import metrics as M

    iou_state = M.iou_init()
    loss_state = M.mean_init()
    for batch in loader:
        db = device_batch(batch)
        # eval mode: dropout off (reference Lightning validation semantics)
        loss, aux = recipe.loss_fn(model, state.params, db, jax.random.key(0),
                                   deterministic=True)
        iou_state = M.iou_update(
            iou_state, aux["start_logits"], aux["end_logits"],
            db["starts"], db["ends"])
        loss_state = M.mean_update(loss_state, loss)
    iou, iou3, iou5 = M.iou_compute(iou_state)
    return {
        "val/loss": float(M.mean_compute(loss_state)),
        "val/iou_score": float(iou),
        "val/iou_3": float(iou3),
        "val/iou_5": float(iou5),
    }


def evaluate_generative(model, recipe, state, loader, tok,
                        max_new_tokens: int = 16) -> dict[str, float]:
    """SF/E2E/IV validation: greedy generation scored with BLEU-1 — the
    reference's val/score monitor (LSTP_SF_blip2_module.py:107-119,560-584)."""
    import jax.numpy as jnp

    from videotgb_tpu.data.loader import device_batch
    from videotgb_tpu.models.videotgb import generate_blip2, generate_instructblip
    from videotgb_tpu.ops.decode import DecodeConfig
    from videotgb_tpu.training import metrics as M

    t5cfg = model.config.blip2.t5 if model.config.backbone == "blip2" else None
    dcfg = DecodeConfig(
        max_new_tokens=max_new_tokens,
        eos_token_id=t5cfg.eos_token_id if t5cfg else 2,
        pad_token_id=t5cfg.pad_token_id if t5cfg else 0,
    )
    loss_state = M.mean_init()
    loss_batches = 0
    preds: list[str] = []
    targets: list[str] = []
    params = ({"params": state.params} if "params" not in state.params
              else state.params)
    from videotgb_tpu.training.recipes import SFRecipe

    for batch in loader:
        db = device_batch(batch)
        # the SF loss needs host-distilled pseudo scores; eval is
        # generation-only for it (matching eval_forward, which never
        # computes mrc_loss — LSTP_SF_blip2_module.py:382-508)
        if not isinstance(recipe, SFRecipe) or "scores" in db:
            loss, _ = recipe.loss_fn(model, state.params, db, jax.random.key(0),
                                     deterministic=True)
            loss_state = M.mean_update(loss_state, loss)
            loss_batches += 1
        # both backbones generate for val/score, matching the reference's
        # eval_forward (LSTP_module.py:379-408 generates for blip2 AND the
        # Vicuna instructblip variant) so checkpoint selection never degrades
        # to loss-only on Vicuna recipes
        if "flow" not in db:
            # IV/IVT batches: pre-selected frames, no selection stage
            from videotgb_tpu.models.videotgb import generate_iv

            tokens = generate_iv(model, params, db, dcfg, jax.random.key(0))
        elif model.config.backbone == "blip2":
            tokens, _ = generate_blip2(model, params, db, dcfg, jax.random.key(0))
        else:
            tokens, _ = generate_instructblip(model, params, db, dcfg,
                                              jax.random.key(0))
        preds.extend(tok.batch_decode(np.asarray(tokens),
                                      skip_special_tokens=True))
        targets.extend(a.replace(" </s>", "") for a in batch["_text_answer"])
    # no val/loss key when no batch had a computable loss (SF without pseudo
    # scores) — a logged 0.0 would masquerade as a perfect loss
    out = ({"val/loss": float(M.mean_compute(loss_state))}
           if loss_batches else {})
    if preds:
        out["val/score"] = M.bleu1(preds, targets)
    return out


def train(cfg: Config) -> dict[str, float]:
    from flax import linen as nn

    from videotgb_tpu.data.loader import device_batch
    from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh
    from videotgb_tpu.training.checkpoint import CheckpointConfig, CheckpointManager
    from videotgb_tpu.training.trainer import Trainer, TrainerConfig

    seed = cfg.get("seed", 42)
    if cfg.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)
    # trainer.platform: run on host CPU instead of the TPU backend (the
    # reference's `trainer=cpu` / `trainer=ddp_sim` accelerator switch);
    # devices>1 on cpu makes a virtual device pool for dp simulation. Must
    # happen before any other jax call; a no-op if the backend already
    # initialized to the requested platform (tests force cpu in conftest).
    platform = cfg.get("trainer", Config()).get("platform")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
            if platform == "cpu":
                jax.config.update(
                    "jax_num_cpu_devices",
                    int(cfg.trainer.get("devices", 1)))
        except RuntimeError as e:  # backend already up (e.g. under pytest)
            log.warning("trainer.platform=%s ignored: %s", platform, e)
    model, mcfg = build_model(cfg)
    recipe = build_recipe(cfg)
    train_loader, val_loader, tok = build_data(cfg, mcfg)

    tcfg_raw = cfg.get("trainer", Config())
    max_steps = tcfg_raw.get("max_steps",
                             tcfg_raw.get("max_epochs", 1) * len(train_loader))
    tcfg = TrainerConfig(
        max_steps=max_steps,
        lr=cfg.model.get("optimizer", Config()).get("lr", 5e-5),
        weight_decay=cfg.model.get("optimizer", Config()).get("weight_decay", 0.0),
        warmup_ratio=cfg.model.get("scheduler", Config()).get("warmup", 0.05),
        accumulate_grad_batches=tcfg_raw.get("accumulate_grad_batches", 1),
        log_every=tcfg_raw.get("log_every", 10),
        eval_every=tcfg_raw.get("eval_every", max(max_steps // 4, 1)),
        monitor=tcfg_raw.get("monitor", "val/iou_score"),
        seed=seed,
        mesh=MeshConfig(dp=tcfg_raw.get("dp", -1), fsdp=tcfg_raw.get("fsdp", 1),
                        tp=tcfg_raw.get("tp", 1), pp=tcfg_raw.get("pp", 1),
                        sp=tcfg_raw.get("sp", 1)),
    )
    ckpt_overrides = apply_callbacks(cfg, tcfg)

    def loss_fn(params, batch, key):
        return recipe.loss_fn(model, params, batch, key)

    trainer = Trainer(tcfg, loss_fn, filter_fn=recipe.filter_fn)
    out_dir = cfg.get("paths", Config()).get("output_dir", "outputs")
    from videotgb_tpu.utils.writers import build_writers

    trainer.writers = build_writers(cfg.get("loggers", ["csv"]), out_dir)
    trainer.writers.log_hyperparams({"config": dict(cfg)})

    # init params from one batch
    first = next(iter(train_loader))
    db = device_batch(first)
    import jax.numpy as jnp

    key = jax.random.key(seed)
    if cfg.model.get("recipe", "tg") in ("iv", "ivt"):
        # stage-3 batches carry pre-selected frames, no flow: init the
        # backbone path only (reference IV/IVT modules never build RAFT/TGB)
        from videotgb_tpu.training.recipes import backbone_init

        variables = backbone_init(model, key, db)
    else:
        variables = model.init(
            key, jnp.asarray(db["frames"]), jnp.asarray(db["flow"]),
            jnp.asarray(db["flow_mask"]), jnp.asarray(db["video_length"]),
            jnp.asarray(db["sampler_question_ids"]),
            jnp.asarray(db["sampler_question_mask"]),
            jnp.asarray(db["question_ids"]), jnp.asarray(db["question_mask"]),
            key, method=model.init_pipeline,
        )
    from videotgb_tpu.parallel.sharding import param_partition_spec

    param_specs = param_partition_spec(variables["params"])
    params = nn.meta.unbox(variables)["params"]
    state = trainer.init_state(params, param_specs=param_specs)

    ckpt_dir = ckpt_overrides.get(
        "dirpath") or cfg.get("paths", Config()).get("ckpt_dir",
                                                     "outputs/checkpoints")
    ckpt = CheckpointManager(CheckpointConfig(
        directory=ckpt_dir,
        monitor=tcfg.monitor,
        mode=ckpt_overrides.get("mode", tcfg.monitor_mode),
        max_to_keep=ckpt_overrides.get("save_top_k", 1),
        save_last=ckpt_overrides.get("save_last", True)))
    if cfg.get("ckpt_path"):
        from videotgb_tpu.training.checkpoint import resolve_ckpt_path

        root, step = resolve_ckpt_path(str(cfg.ckpt_path))
        src = (ckpt if os.path.abspath(root) == os.path.abspath(ckpt_dir)
               else CheckpointManager(CheckpointConfig(directory=root,
                                                       monitor=tcfg.monitor)))
        step = step if step is not None else src.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {root}")
        if "opt_state" in src.item_names(step):
            # full-state resume: optimizer moments + schedule position
            # continue exactly (reference trainer.fit(ckpt_path=...) semantics)
            restored = src.restore(step, template={
                "params": state.params, "opt_state": state.opt_state,
                "step": state.step})
            state.params = restored["params"]
            state.opt_state = restored["opt_state"]
            # int() first: the bare array restores replicated over every
            # local device, which would clash with single-device params
            state.step = jnp.asarray(int(restored["step"]), jnp.int32)
            log.info("resumed full train state from %s @ step %d", root, step)
        else:
            # params-only source (converted released weights): warm start
            restored = src.restore(step, template={"params": state.params})
            state.params = restored["params"]
            log.info("warm-started params from %s @ step %d", root, step)

    def eval_fn(state):
        if cfg.model.get("recipe", "tg") == "tg":
            return evaluate_tg(model, recipe, state, val_loader, tok)
        # generative recipes: val loss + BLEU-1 of greedy answers (val/score)
        return evaluate_generative(
            model, recipe, state, val_loader, tok,
            max_new_tokens=cfg.model.get("eval_max_new", 16))

    def checkpoint_fn(state, metrics):
        ckpt.save(int(state.step),
                  {"params": state.params, "opt_state": state.opt_state,
                   "step": state.step}, metrics)

    is_sf = cfg.model.get("recipe", "tg") == "sf"
    text_answers: dict[str, list] = {}

    def batches():
        step = 0
        while step < tcfg.max_steps:
            for batch in train_loader:
                db = device_batch(batch)
                if is_sf:
                    db["_text_answer"] = batch["_text_answer"]
                yield db
                step += 1
                if step >= tcfg.max_steps:
                    return

    def batch_transform(cur_state, db):
        if not is_sf:
            return db
        answers = db.pop("_text_answer")
        db["scores"] = sf_pseudo_scores(
            model, cur_state.params, db, answers, tok,
            max_new_tokens=cfg.model.get("pseudo_max_new", 16))
        return db

    # debug=profiler overlay (reference configs/debug/profiler.yaml:
    # trainer.profiler="simple"): device-trace the whole max_steps-bounded
    # fit; host/python tracers off — a train-step dispatch emits ~500k host
    # events that blow the trace event budget and drop all device ops
    import contextlib

    prof_cfg = cfg.get("profiler")
    if prof_cfg is not None:
        trace_dir = (prof_cfg.get("trace_dir") if isinstance(prof_cfg, dict)
                     else None) or os.path.join(out_dir, "trace")
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = 0
        opts.python_tracer_level = 0
        prof_ctx = jax.profiler.trace(trace_dir, profiler_options=opts)
        log.info("profiler on: writing jax trace to %s", trace_dir)
    else:
        prof_ctx = contextlib.nullcontext()

    with prof_ctx:
        state = trainer.fit(state, batches(), eval_fn=eval_fn,
                            checkpoint_fn=checkpoint_fn,
                            batch_transform=batch_transform)
    final = eval_fn(state)
    checkpoint_fn(state, final)
    ckpt.wait()
    log.info("final metrics: %s", final)

    if cfg.get("test"):
        # reference: trainer.test on the best checkpoint after fit
        # (src/train.py:91-98, best_model_path selection)
        best = ckpt.best_step()
        if best is not None:
            template = {"params": state.params}
            if "opt_state" in ckpt.item_names(best):
                template.update(opt_state=state.opt_state, step=state.step)
            restored = ckpt.restore(best, template=template)
            from videotgb_tpu.training.trainer import TrainState

            best_state = TrainState(restored["params"], None, state.step)
            test_metrics = {f"test{k[3:]}" if k.startswith("val") else k: v
                            for k, v in eval_fn(best_state).items()}
            log.info("test metrics (best ckpt @%d): %s", best, test_metrics)
            final.update(test_metrics)
    return final


def sf_pseudo_scores(model, params, db, text_answers, tok,
                     max_new_tokens: int = 16):
    """The SF self-refinement scoring pass: per-frame greedy generation
    (device) -> decode + rouge_n recall vs the gold answer (host) -> scores
    (B, F) (reference: LSTP_SF_blip2_module.py:151-192)."""
    import jax.numpy as jnp

    from videotgb_tpu.training.metrics import rouge_n
    from videotgb_tpu.training.recipes import pseudo_label_generate

    frames = jnp.asarray(db["frames"])
    b, f = frames.shape[:2]
    qf_ids = db.get("qformer_input_ids")
    ids = pseudo_label_generate(
        model, {"params": params} if "params" not in params else params,
        frames, jnp.asarray(db["question_ids"]),
        jnp.asarray(db["question_mask"]), max_new_tokens=max_new_tokens,
        qformer_input_ids=None if qf_ids is None else jnp.asarray(qf_ids),
        qformer_attention_mask=(
            None if qf_ids is None
            else jnp.asarray(db["qformer_attention_mask"])),
    )
    predictions = tok.batch_decode(np.asarray(ids), skip_special_tokens=True)
    targets = [text_answers[i // f] for i in range(b * f)]
    scores = np.asarray(rouge_n(targets, predictions), np.float32)
    return jnp.asarray(scores.reshape(b, f))


def main(argv: list[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    cfg = compose(CONFIG_DIR, "train", argv)
    from videotgb_tpu.utils.task import apply_extras, setup_run_dir

    setup_run_dir(cfg, job_name="train", overrides=argv)
    apply_extras(cfg)
    train(cfg)


if __name__ == "__main__":
    main()
