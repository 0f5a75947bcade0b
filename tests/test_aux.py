"""Aux subsystem tests: task wrapper, metric extraction, sweep driver,
process chunking."""

import pytest

from videotgb_tpu.config import Config
from videotgb_tpu.parallel.distributed import process_chunk
from videotgb_tpu.utils.sweep import parse_space, run_sweep
from videotgb_tpu.utils.task import get_metric_value, task_wrapper


def test_task_wrapper_logs_exception(tmp_path):
    cfg = Config({"paths": {"output_dir": str(tmp_path)}})

    @task_wrapper
    def boom(cfg):
        raise RuntimeError("kaboom")

    with pytest.raises(RuntimeError):
        boom(cfg)
    assert "kaboom" in (tmp_path / "error.log").read_text()


def test_get_metric_value():
    assert get_metric_value({"val/iou": 0.5}, "val/iou") == 0.5
    assert get_metric_value({"a": 1}, None) is None
    with pytest.raises(KeyError):
        get_metric_value({"a": 1}, "missing")


def test_parse_space():
    import random

    rng = random.Random(0)
    choice = parse_space("choice(2,4,8)")
    assert all(choice(rng) in (2, 4, 8) for _ in range(10))
    log = parse_space("loguniform(1e-5,1e-3)")
    vals = [log(rng) for _ in range(50)]
    assert all(1e-5 <= v <= 1e-3 for v in vals)
    fixed = parse_space("3")
    assert fixed(rng) == 3


def test_run_sweep_finds_best():
    calls = []

    def fake_train(overrides):
        lr = float([o for o in overrides if o.startswith("model.lr")][0].split("=")[1])
        calls.append(lr)
        return {"val/score": -abs(lr - 5e-4)}  # best near 5e-4

    result = run_sweep(
        base_overrides=["experiment=x"],
        space={"model.lr": parse_space("loguniform(1e-5,1e-2)")},
        trials=12, metric="val/score", mode="max", seed=1,
        train_fn=fake_train,
    )
    assert len(calls) == 12
    assert result["best"]["value"] == max(h["value"] for h in result["history"])


def test_process_chunk():
    items = list(range(10))
    chunks = [process_chunk(items, i, 3) for i in range(3)]
    assert chunks == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert sum(chunks, []) == items
