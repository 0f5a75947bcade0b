"""Entry-point regression tests: train CLI (TG recipe), eval CLI with
checkpoint restore, IV dataset file reading."""

import json
import os

import numpy as np
import pytest


def test_train_then_eval_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from videotgb_tpu.evaluate import main as eval_main
    from videotgb_tpu.train import main as train_main

    # explicit paths.output_dir pins the dir (hydra run-dir redirect opts out)
    train_main(["experiment=smoke_tg_synthetic",
                f"paths.root_dir={tmp_path}/run",
                f"paths.output_dir={tmp_path}/run/outputs"])
    ckpt_dir = tmp_path / "run" / "outputs" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
    eval_main(["experiment=smoke_tg_synthetic",
               f"paths.root_dir={tmp_path}/run",
               f"paths.output_dir={tmp_path}/run/outputs",
               f"ckpt_path={ckpt_dir}"])
    # csv metrics written
    csv_path = tmp_path / "run" / "outputs" / "csv" / "metrics.csv"
    assert csv_path.exists()


def test_logger_group_composition():
    """configs/logger/ group parity with the reference root composition
    (reference configs/train.yaml:10 `logger: null` + configs/logger/*):
    csv by default, `logger=wandb`-style overrides select one, many_loggers
    fans out."""
    from videotgb_tpu.config import compose
    from videotgb_tpu.train import CONFIG_DIR

    assert compose(CONFIG_DIR, "train", []).loggers == ["csv"]
    assert compose(CONFIG_DIR, "train", ["logger=wandb"]).loggers == ["wandb"]
    many = compose(CONFIG_DIR, "train", ["logger=many_loggers"]).loggers
    assert set(many) >= {"csv", "tensorboard", "wandb", "aim", "comet",
                         "mlflow", "neptune"}


def test_callbacks_group_composition_and_mapping():
    """configs/callbacks/ group parity with the reference root composition
    (reference configs/train.yaml:9 `callbacks: default` +
    configs/callbacks/*.yaml) and its mapping onto the TPU trainer via
    train.apply_callbacks."""
    from videotgb_tpu.config import compose
    from videotgb_tpu.train import CONFIG_DIR, apply_callbacks
    from videotgb_tpu.training.trainer import TrainerConfig

    # root defaults compose callbacks/default.yaml like the reference root
    cfg = compose(CONFIG_DIR, "train", [])
    assert cfg.callbacks.model_checkpoint.save_top_k == 1
    assert cfg.callbacks.early_stopping.patience == 100
    assert cfg.callbacks.model_checkpoint.dirpath == cfg.paths.ckpt_dir

    tcfg = TrainerConfig()
    mc = apply_callbacks(cfg, tcfg)
    assert tcfg.early_stop_patience == 100
    assert mc["save_top_k"] == 1 and "every_n_train_steps" not in mc

    # monitor precedence: trainer.monitor (set by every trainer group file)
    # wins; the callbacks monitor applies when the trainer key is absent
    from videotgb_tpu.config import Config as _Cfg

    tcfg = TrainerConfig(monitor="val/iou_score")
    apply_callbacks(_Cfg({"callbacks": {"early_stopping":
                                        {"monitor": "val/score"}},
                          "trainer": {"monitor": "val/iou_score"}}), tcfg)
    assert tcfg.monitor == "val/iou_score"
    tcfg = TrainerConfig()
    apply_callbacks(_Cfg({"callbacks": {"early_stopping":
                                        {"monitor": "val/other",
                                         "mode": "min"}}}), tcfg)
    assert tcfg.monitor == "val/other" and tcfg.monitor_mode == "min"

    # experiment overlays carry the reference's callbacks overrides
    # (reference configs/experiment/LSTP_TG_...yaml:21-25 monitors,
    #  ...vicuna7b_videoinstruct.yaml:21-23 every_n_train_steps,
    #  ...ivinstruct.yaml save_top_k); they agree with trainer.monitor
    cfg_tg = compose(CONFIG_DIR, "train",
                     ["experiment=LSTP_TG_blip2flant5xl_videoinstruct"])
    assert cfg_tg.callbacks.model_checkpoint.monitor == "val/iou_score"
    assert cfg_tg.callbacks.early_stopping.monitor == "val/iou_score"
    assert cfg_tg.trainer.monitor == "val/iou_score"

    tcfg = TrainerConfig()
    apply_callbacks(
        compose(CONFIG_DIR, "train",
                ["experiment=LSTP_SF_instructblipvicuna7b_videoinstruct"]),
        tcfg)
    assert tcfg.checkpoint_every == 2000

    cfg_iv = compose(CONFIG_DIR, "train",
                     ["experiment=LSTP_instructblipvicuna7b_ivinstruct"])
    assert apply_callbacks(cfg_iv, TrainerConfig())["save_top_k"] == 2

    # callbacks=none -> empty group; legacy trainer.monitor stays in charge
    cfg_none = compose(CONFIG_DIR, "train", ["callbacks=none"])
    tcfg = TrainerConfig(monitor="val/iou_score")
    assert apply_callbacks(cfg_none, tcfg) == {}
    assert tcfg.monitor == "val/iou_score"
    assert tcfg.early_stop_patience is None

    # the standalone early_stopping.yaml requires an explicit monitor,
    # like the reference's `monitor: ???` hydra MISSING
    import pytest as _pytest

    cfg_es = compose(CONFIG_DIR, "train", ["callbacks=early_stopping"])
    with _pytest.raises(ValueError, match="monitor"):
        apply_callbacks(cfg_es, TrainerConfig())


def test_extras_group():
    """configs/extras/ parity (reference configs/extras/default.yaml +
    src/utils/utils.py extras()): ignore_warnings installs a filter,
    enforce_tags rejects tag-less runs, print_config defaults on."""
    import warnings

    import pytest as _pytest

    from videotgb_tpu.config import Config, compose
    from videotgb_tpu.train import CONFIG_DIR
    from videotgb_tpu.utils.task import apply_extras

    cfg = compose(CONFIG_DIR, "train", [])
    assert cfg.extras.ignore_warnings is True
    assert cfg.extras.print_config is True
    assert cfg.extras.enforce_tags is False

    with warnings.catch_warnings():
        apply_extras(Config({"extras": {"ignore_warnings": True,
                                        "print_config": False}}))
        assert warnings.filters[0][0] == "ignore"

    with _pytest.raises(ValueError, match="tags"):
        apply_extras(Config({"extras": {"enforce_tags": True,
                                        "print_config": False},
                             "tags": []}))


def test_train_cli_profiler_overlay(tmp_path, monkeypatch):
    """debug=profiler (reference configs/debug/profiler.yaml) wraps the fit
    in a jax.profiler trace: a parseable .trace.json.gz appears under
    outputs/trace."""
    import glob

    monkeypatch.chdir(tmp_path)
    from videotgb_tpu.train import main as train_main

    train_main(["experiment=smoke_tg_synthetic", "debug=profiler",
                f"paths.root_dir={tmp_path}/run",
                f"paths.output_dir={tmp_path}/run/outputs"])
    traces = glob.glob(str(tmp_path / "run" / "outputs" / "trace" / "**" /
                           "*.trace.json.gz"), recursive=True)
    assert traces, "no trace file produced by debug=profiler"


def test_train_then_eval_cli_sf_generative(tmp_path, monkeypatch):
    """The eval entry must generate + BLEU-score for generative recipes
    (reference trainer.test -> eval_forward, src/eval.py:69 ->
    LSTP_SF_blip2_module.py:595-611) — not crash on the SF loss's missing
    pseudo scores, and not leave dropout on."""
    monkeypatch.chdir(tmp_path)
    from videotgb_tpu.evaluate import main as eval_main
    from videotgb_tpu.train import main as train_main

    train_main(["experiment=smoke_sf_synthetic",
                f"paths.root_dir={tmp_path}/run",
                f"paths.output_dir={tmp_path}/run/outputs"])
    ckpt_dir = tmp_path / "run" / "outputs" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
    metrics = eval_main(["experiment=smoke_sf_synthetic",
                         f"paths.root_dir={tmp_path}/run",
                         f"paths.output_dir={tmp_path}/run/outputs",
                         f"ckpt_path={ckpt_dir}"])
    assert "test/score" in metrics
    assert 0.0 <= metrics["test/score"] <= 1.0
    # SF eval has no computable loss (no pseudo scores) — a fabricated
    # test/loss: 0.0 must not appear
    assert "test/loss" not in metrics


def test_iv_dataset_reads_files(tmp_path):
    import cv2

    from videotgb_tpu.data.datasets import IVInstructDataset

    img_dir = tmp_path / "images"
    vid_dir = tmp_path / "videos"
    img_dir.mkdir()
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(img_dir / "pic.jpg"),
                rng.integers(0, 255, (48, 64, 3), np.uint8))
    writer = cv2.VideoWriter(str(vid_dir / "clip.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 64))
    for _ in range(12):
        writer.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    writer.release()

    data = [
        {"image": "pic.jpg", "conversations": [
            {"from": "human", "value": "<image>\nwhat is this?"},
            {"from": "gpt", "value": "a picture"}]},
        {"video": "clip.mp4", "conversations": [
            {"from": "human", "value": "<video>\nwhat happens?"},
            {"from": "gpt", "value": "things move"}]},
        {"conversations": [
            {"from": "human", "value": "just text"},
            {"from": "gpt", "value": "sure"}]},
    ]
    text_path = tmp_path / "iv.json"
    text_path.write_text(json.dumps(data))

    ds = IVInstructDataset(str(text_path), str(img_dir), str(vid_dir),
                           nframe=4, image_size=32)
    img_sample = ds[0]
    assert img_sample["width"] == 1
    assert img_sample["frames"].shape == (1, 32, 32, 3)
    assert img_sample["question"].endswith("ASSISTANT:")
    vid_sample = ds[1]
    assert vid_sample["width"] == 4
    assert vid_sample["frames"].shape == (4, 32, 32, 3)
    txt_sample = ds[2]
    assert txt_sample["width"] == 0 and txt_sample["frames"] is None
    assert txt_sample["answer"].startswith("sure")


def test_ivinstruct_config_groups_and_build_data(tmp_path):
    """configs/{data,paths}/{iv,ivt}instruct.yaml group parity (reference
    configs/data/ivinstruct.yaml + configs/paths/ivinstruct.yaml) and the
    text_dir file-layout contract: build_data derives {split}.json,
    pseudo_label.json and (ivt) nlp_tune.json from data.text_dir the way the
    reference datasets do (ivinstruct_dataset.py:52,202,
    ivtinstruct_dataset.py:218)."""
    from videotgb_tpu.config import compose
    from videotgb_tpu.train import CONFIG_DIR, build_data

    # group composition: experiments pull paths+data+model groups like the
    # reference defaults lists
    cfg = compose(CONFIG_DIR, "train",
                  ["experiment=LSTP_instructblipvicuna7b_ivinstruct"])
    assert cfg.data.name == "iv"
    assert cfg.data.text_dir.endswith("data/ivinstruct")
    assert cfg.paths.of_dir.endswith("videoinstruct/flow")
    assert cfg.model.get("sampler_ckpt")
    cfg_ivt = compose(CONFIG_DIR, "train",
                      ["experiment=LSTP_blip2flant5xl_ivtinstruct"])
    assert cfg_ivt.data.name == "ivt"
    assert cfg_ivt.model.lora_rank == 8

    # text_dir layout: loaders come up from {split}.json (+ nlp_tune.json
    # text-only rows for ivt) without media on disk
    td = tmp_path / "ivinstruct"
    td.mkdir()
    row = {"conversations": [
        {"from": "human", "value": "just text"},
        {"from": "gpt", "value": "sure"}]}
    (td / "train.json").write_text(json.dumps([row, row]))
    (td / "val.json").write_text(json.dumps([row]))
    (td / "pseudo_label.json").write_text(json.dumps({}))
    (td / "nlp_tune.json").write_text(json.dumps([row]))

    cfg = compose(CONFIG_DIR, "train", [
        "experiment=LSTP_blip2flant5xl_ivtinstruct",
        f"paths.root_dir={tmp_path}", f"data.text_dir={td}",
        "data.tokenizer=byte", "data.num_workers=0", "data.batch_size=2",
        "model.preset=tiny"])
    from videotgb_tpu.models.videotgb import VideoTGBConfig

    train_loader, val_loader, tok = build_data(
        cfg, VideoTGBConfig.tiny(backbone="blip2"))
    assert len(train_loader.dataset) == 3  # train.json + nlp_tune.json rows
    assert len(val_loader.dataset) == 2
    batch = next(iter(train_loader))
    assert batch["frames"].shape[1] == 2  # tiny nframe
    assert (np.asarray(batch["widths"]) == 0).all()  # text-only rows


def test_sf_small_online_flow_model_config():
    """configs/model/LSTP_SF_small.yaml (reference LSTP_SF_small_module:
    RAFT inside the train step) wires SFRecipe(online_flow=True)."""
    from videotgb_tpu.config import compose
    from videotgb_tpu.train import CONFIG_DIR, build_recipe

    cfg = compose(CONFIG_DIR, "train", ["model=LSTP_SF_small"])
    recipe = build_recipe(cfg)
    assert type(recipe).__name__ == "SFRecipe" and recipe.online_flow
    assert cfg.model.backbone == "instructblip_t5"


def test_ivt_train_cli_end_to_end(tmp_path, monkeypatch):
    """`train.py experiment=LSTP_blip2flant5xl_ivtinstruct` runs the full
    fit -> eval -> checkpoint loop from the text_dir file layout. Guards the
    stage-3 CLI path that used to be compose-only: init goes through
    recipes.backbone_init (IV batches carry no flow, so init_pipeline can't
    run) and val generation through models.videotgb.generate_iv."""
    monkeypatch.chdir(tmp_path)
    td = tmp_path / "data" / "ivinstruct"
    td.mkdir(parents=True)
    row = {"conversations": [
        {"from": "human", "value": "just text"},
        {"from": "gpt", "value": "sure"}]}
    (td / "train.json").write_text(json.dumps([row, row]))
    (td / "val.json").write_text(json.dumps([row, row]))
    (td / "pseudo_label.json").write_text(json.dumps({}))
    (td / "nlp_tune.json").write_text(json.dumps([row, row]))

    from videotgb_tpu.train import main as train_main

    train_main(["experiment=LSTP_blip2flant5xl_ivtinstruct", "debug=fdr",
                "model.preset=tiny", "data.tokenizer=byte",
                "data.num_workers=0", "data.batch_size=2",
                "extras.print_config=false",
                "trainer.accumulate_grad_batches=1",
                f"paths.root_dir={tmp_path}",
                f"paths.output_dir={tmp_path}/outputs"])
    ckpt_dir = tmp_path / "outputs" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())


def test_generate_iv_instructblip_masks_text_only_rows():
    """generate_iv on the Vicuna backbone: pre-selected frames, no selection
    stage; a widths==0 row must produce the same tokens as a pure-text
    prompt (the visual prefix is fully masked), independent of the frame
    content (reference ivtinstruct width-0 rows)."""
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig, generate_iv
    from videotgb_tpu.ops.decode import DecodeConfig
    from videotgb_tpu.training.recipes import backbone_init

    model = VideoTGB(VideoTGBConfig.tiny(backbone="instructblip"))
    b, nf, hw = 2, 2, model.config.instructblip.vit.image_size
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.normal(size=(b, nf, hw, hw, 3)),
                              jnp.float32),
        "widths": jnp.asarray([0, 0], jnp.int32),
        "question_ids": jnp.asarray(rng.integers(3, 50, (b, 8)), jnp.int32),
        "question_mask": jnp.ones((b, 8), jnp.int32),
        "instruction_ids": jnp.asarray(rng.integers(3, 50, (b, 12)), jnp.int32),
        "instruction_mask": jnp.ones((b, 12), jnp.int32),
        "labels": jnp.asarray(rng.integers(3, 50, (b, 12)), jnp.int32),
        "qformer_input_ids": jnp.asarray(rng.integers(3, 50, (b, 8)), jnp.int32),
        "qformer_attention_mask": jnp.ones((b, 8), jnp.int32),
    }
    params = backbone_init(model, jax.random.key(0), batch)
    dcfg = DecodeConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=0)
    toks = generate_iv(model, params, batch, dcfg, jax.random.key(1))
    assert toks.shape == (b, 4)
    # different frames, same widths==0 -> identical tokens (prefix masked)
    batch2 = dict(batch)
    batch2["frames"] = jnp.asarray(rng.normal(size=(b, nf, hw, hw, 3)),
                                   jnp.float32)
    toks2 = generate_iv(model, params, batch2, dcfg, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_trainer_group_platform_and_callbacks_extras():
    """configs/trainer/{cpu,ddp_sim,ddp_spawn,ddp_freeze,tpu}.yaml parity
    (reference configs/trainer/*.yaml accelerator/strategy variants) and the
    model_summary / rich_progress_bar callback mappings onto TrainerConfig."""
    from videotgb_tpu.config import compose
    from videotgb_tpu.train import CONFIG_DIR, apply_callbacks
    from videotgb_tpu.training.trainer import TrainerConfig, param_summary

    cfg = compose(CONFIG_DIR, "train", ["trainer=ddp_sim"])
    assert cfg.trainer.platform == "cpu" and cfg.trainer.devices == 2
    assert cfg.trainer.dp == 2
    cfg_cpu = compose(CONFIG_DIR, "train", ["trainer=cpu"])
    assert cfg_cpu.trainer.platform == "cpu" and cfg_cpu.trainer.devices == 1
    assert compose(CONFIG_DIR, "train", ["trainer=ddp_spawn"]).trainer.dp == -1
    assert compose(CONFIG_DIR, "train", ["trainer=ddp_freeze"]).trainer.dp == -1
    assert compose(CONFIG_DIR, "train", ["trainer=tpu"]).trainer.dp == 1

    # default callbacks carry model_summary max_depth 2 (reference
    # configs/callbacks/default.yaml:22) -> trainer knob; the standalone
    # rich_progress_bar group flips the progress flag
    tcfg = TrainerConfig()
    apply_callbacks(compose(CONFIG_DIR, "train", []), tcfg)
    assert tcfg.model_summary_depth == 2 and not tcfg.progress_bar
    tcfg = TrainerConfig()
    apply_callbacks(compose(CONFIG_DIR, "train",
                            ["callbacks=rich_progress_bar"]), tcfg)
    assert tcfg.progress_bar and tcfg.model_summary_depth is None
    tcfg = TrainerConfig()
    apply_callbacks(compose(CONFIG_DIR, "train",
                            ["callbacks=model_summary"]), tcfg)
    assert tcfg.model_summary_depth == 1

    # param_summary groups by path depth and splits trainable counts
    params = {"model": {"a": np.zeros((4, 4)), "b": np.zeros(8)},
              "tgb": {"c": np.zeros(2)}}
    mask = {"model": {"a": True, "b": False}, "tgb": {"c": True}}
    lines = param_summary(params, mask, 1)
    body = "\n".join(lines)
    assert "model" in body and "tgb" in body
    lines2 = param_summary(params, mask, 2)
    assert any("model/a" in l for l in lines2)


def test_hydra_run_dir_management(tmp_path, monkeypatch):
    """Hydra run-dir analogue (reference configs/hydra/default.yaml:9-21):
    two consecutive runs land in DISTINCT dated dirs under
    logs/<task_name>/runs/, each containing the per-run job log
    (train.log), the checkpoints, and the .hydra config snapshot."""
    monkeypatch.chdir(tmp_path)
    from videotgb_tpu.train import main as train_main

    for _ in range(2):
        train_main(["experiment=smoke_tg_synthetic",
                    f"paths.root_dir={tmp_path}/run"])
    runs_root = tmp_path / "run" / "logs" / "train" / "runs"
    run_dirs = sorted(p for p in runs_root.iterdir() if p.is_dir())
    assert len(run_dirs) == 2, f"expected 2 distinct run dirs, got {run_dirs}"
    for rd in run_dirs:
        assert (rd / "train.log").exists() and (
            rd / "train.log").stat().st_size > 0
        assert (rd / "checkpoints").exists() and any(
            (rd / "checkpoints").iterdir())
        assert (rd / ".hydra" / "config.yaml").exists()
        assert (rd / ".hydra" / "overrides.yaml").exists()
    # the job logs are per-run: the first run's log must not contain the
    # second run's records (the handler is swapped at setup_run_dir)
    first_log = (run_dirs[0] / "train.log").read_text()
    assert str(run_dirs[1]) not in first_log


def test_hydra_sweep_multirun_subdirs(tmp_path, monkeypatch):
    """Multirun trials write <sweep_dir>/<job_num> subdirs (reference
    configs/hydra/default.yaml sweep.subdir: ${hydra.job.num}), all under
    ONE dated sweep dir."""
    monkeypatch.chdir(tmp_path)
    from videotgb_tpu.utils.sweep import parse_space, run_sweep

    run_sweep(
        ["experiment=smoke_tg_synthetic", f"paths.root_dir={tmp_path}/run"],
        {"model.optimizer.lr": parse_space("choice(1e-4,2e-4)")},
        trials=2, metric="val/iou_score", mode="max", sampler="random")
    multirun_root = tmp_path / "run" / "logs" / "train" / "multiruns"
    sweeps = [p for p in multirun_root.iterdir() if p.is_dir()]
    assert len(sweeps) == 1, "trials scattered across sweep dirs"
    subdirs = sorted(p.name for p in sweeps[0].iterdir() if p.is_dir())
    assert subdirs == ["0", "1"]
    for sub in subdirs:
        assert (sweeps[0] / sub / "train.log").exists()


def test_trainer_gpu_mps_aliases_and_optuna_name():
    """The reference's remaining override strings resolve verbatim:
    trainer=gpu / trainer=mps (reference configs/trainer/{gpu,mps}.yaml —
    single-accelerator layouts, dp=1 here) and
    hparams_search=videoinstruct_optuna (reference
    configs/hparams_search/videoinstruct_optuna.yaml)."""
    from videotgb_tpu.config import compose
    from videotgb_tpu.train import CONFIG_DIR

    for name in ("gpu", "mps"):
        cfg = compose(CONFIG_DIR, "train", [f"trainer={name}"])
        assert cfg.trainer.dp == 1 and cfg.trainer.fsdp == 1

    cfg = compose(CONFIG_DIR, "train",
                  ["hparams_search=videoinstruct_optuna"])
    hs = cfg.hparams_search
    assert hs.metric == "val/iou_score" and hs.mode == "max"
    assert hs.trials == 20
    assert "model.optimizer.lr" in hs.space


def test_now_resolver_frozen_per_compose():
    """${now:...} renders hydra's dynamic timestamps and is frozen per
    compose(): every occurrence in one tree agrees."""
    import re

    from videotgb_tpu.config import compose
    from videotgb_tpu.train import CONFIG_DIR

    cfg = compose(CONFIG_DIR, "train", [])
    run_dir = cfg.hydra.run.dir
    m = re.search(r"runs/(\d{4}-\d{2}-\d{2})_(\d{2}-\d{2}-\d{2})$", run_dir)
    assert m, run_dir
    sweep_dir = cfg.hydra.sweep.dir
    assert sweep_dir.endswith(f"{m.group(1)}_{m.group(2)}")
