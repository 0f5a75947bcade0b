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

    train_main(["experiment=smoke_tg_synthetic",
                f"paths.root_dir={tmp_path}/run"])
    ckpt_dir = tmp_path / "run" / "outputs" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
    eval_main(["experiment=smoke_tg_synthetic",
               f"paths.root_dir={tmp_path}/run",
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


def test_train_cli_profiler_overlay(tmp_path, monkeypatch):
    """debug=profiler (reference configs/debug/profiler.yaml) wraps the fit
    in a jax.profiler trace: a parseable .trace.json.gz appears under
    outputs/trace."""
    import glob

    monkeypatch.chdir(tmp_path)
    from videotgb_tpu.train import main as train_main

    train_main(["experiment=smoke_tg_synthetic", "debug=profiler",
                f"paths.root_dir={tmp_path}/run"])
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
                f"paths.root_dir={tmp_path}/run"])
    ckpt_dir = tmp_path / "run" / "outputs" / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir())
    metrics = eval_main(["experiment=smoke_sf_synthetic",
                         f"paths.root_dir={tmp_path}/run",
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
