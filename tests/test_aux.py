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


def test_tpe_concentrates_near_optimum():
    """The native TPE sampler (Optuna-TPESampler analogue) must focus later
    trials near the objective's optimum and find a better best than its own
    startup-random phase would suggest by chance."""
    import math

    from videotgb_tpu.utils.sweep import tpe_suggest

    def objective(lr):
        return -abs(math.log10(lr) + 3.0)  # optimum at lr = 1e-3

    def run(sampler):
        def fake_train(overrides):
            lr = float([o for o in overrides
                        if o.startswith("model.lr")][0].split("=")[1])
            return {"val/score": objective(lr)}

        return run_sweep(
            base_overrides=[],
            space={"model.lr": parse_space("loguniform(1e-6,1e-1)")},
            trials=24, metric="val/score", mode="max", seed=3,
            train_fn=fake_train, sampler=sampler,
        )

    result = run(sampler="tpe")
    assert result["best"]["value"] > -0.5  # within half a decade of 1e-3
    # the exploitation phase concentrates: the last 8 trials sit closer to
    # the optimum on average than the first 8 (which include the random
    # startup trials)
    vals = [h["value"] for h in result["history"]]
    assert sum(vals[-8:]) / 8 > sum(vals[:8]) / 8

    # categorical TPE picks the winning branch most of the time
    def fake_train_cat(overrides):
        d = [o for o in overrides if o.startswith("model.depth")][0]
        return {"val/score": 1.0 if d.endswith("=4") else 0.0}

    result = run_sweep(
        base_overrides=[],
        space={"model.depth": parse_space("choice(2,4,8)")},
        trials=20, metric="val/score", mode="max", seed=5,
        train_fn=fake_train_cat, sampler="tpe",
    )
    picks = [h["params"]["model.depth"] for h in result["history"][6:]]
    assert picks.count(4) > len(picks) // 2


def test_process_chunk():
    items = list(range(10))
    chunks = [process_chunk(items, i, 3) for i in range(3)]
    assert chunks == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9]]
    assert sum(chunks, []) == items
