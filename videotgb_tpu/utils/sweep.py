"""Hyperparameter search driver (the Optuna-multirun analogue).

The reference sweeps with hydra's Optuna plugin
(reference: configs/hparams_search/videoinstruct_optuna.yaml). Optuna is not
in this image, so this driver implements TPE-free random + grid search over
the same override grammar: a sweep spec maps dotted config keys to choices /
ranges, each trial composes the config with those overrides, runs the train
entry, and the best trial by the optimized metric wins.

Usage:
    python -m videotgb_tpu.utils.sweep --trials 8 --metric val/iou_score \\
        --mode max experiment=smoke_tg_synthetic \\
        "sweep.model.optimizer.lr=loguniform(1e-5,1e-3)" \\
        "sweep.data.batch_size=choice(2,4)"
"""

from __future__ import annotations

import argparse
import json
import math
import random
import re
import sys
from typing import Any, Callable

from videotgb_tpu.utils.logging import get_logger
from videotgb_tpu.utils.task import get_metric_value

log = get_logger("videotgb.sweep")

_CHOICE = re.compile(r"choice\((.+)\)")
_UNIFORM = re.compile(r"uniform\(([^,]+),([^)]+)\)")
_LOGUNIFORM = re.compile(r"loguniform\(([^,]+),([^)]+)\)")


def parse_space(spec: str) -> Callable[[random.Random], Any]:
    if m := _CHOICE.match(spec):
        options = [_literal(x) for x in m.group(1).split(",")]
        return lambda rng: rng.choice(options)
    if m := _UNIFORM.match(spec):
        lo, hi = float(m.group(1)), float(m.group(2))
        return lambda rng: rng.uniform(lo, hi)
    if m := _LOGUNIFORM.match(spec):
        lo, hi = math.log(float(m.group(1))), math.log(float(m.group(2)))
        return lambda rng: math.exp(rng.uniform(lo, hi))
    value = _literal(spec)
    return lambda rng: value


def _literal(text: str) -> Any:
    text = text.strip()
    try:
        return int(text)
    except ValueError:
        pass
    try:
        return float(text)
    except ValueError:
        return text


def run_sweep(
    base_overrides: list[str],
    space: dict[str, Callable],
    trials: int,
    metric: str,
    mode: str = "max",
    seed: int = 0,
    train_fn: Callable | None = None,
) -> dict:
    if train_fn is None:
        from videotgb_tpu.config import compose
        from videotgb_tpu.train import CONFIG_DIR, train

        def train_fn(overrides):
            return train(compose(CONFIG_DIR, "train", overrides))

    rng = random.Random(seed)
    best = None
    history = []
    for trial in range(trials):
        sampled = {k: fn(rng) for k, fn in space.items()}
        overrides = base_overrides + [f"{k}={v}" for k, v in sampled.items()]
        log.info("trial %d/%d: %s", trial + 1, trials, sampled)
        try:
            metrics = train_fn(overrides)
            value = get_metric_value(metrics, metric)
        except Exception as e:
            log.error("trial %d failed: %s", trial + 1, e)
            history.append({"params": sampled, "error": str(e)})
            continue
        history.append({"params": sampled, "value": value})
        better = (
            best is None
            or (mode == "max" and value > best["value"])
            or (mode == "min" and value < best["value"])
        )
        if better:
            best = {"params": sampled, "value": value}
    result = {"best": best, "history": history, "metric": metric}
    log.info("sweep done: best=%s", best)
    return result


def main(argv: list[str] | None = None) -> dict:
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=8)
    parser.add_argument("--metric", default="val/iou_score")
    parser.add_argument("--mode", choices=["max", "min"], default="max")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", default=None)
    args, rest = parser.parse_known_args(argv)

    space = {}
    base = []
    for item in rest:
        key, _, value = item.partition("=")
        if key.startswith("sweep."):
            space[key[len("sweep."):]] = parse_space(value)
        else:
            base.append(item)
    result = run_sweep(base, space, args.trials, args.metric, args.mode,
                       args.seed)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(result, f, indent=2, default=str)
    return result


if __name__ == "__main__":
    main()
