"""Evaluation entry point: ``python -m videotgb_tpu.evaluate ckpt_path=...``.

The reference's src/eval.py:33-93 equivalent: compose the eval config,
restore the checkpoint, run the recipe's validation loop on the test split,
and report metrics. Requires ``ckpt_path`` (asserted like the reference
eval.py:42).
"""

from __future__ import annotations

import os
import sys

import jax
from flax import linen as nn

from videotgb_tpu.config import Config, compose
from videotgb_tpu.utils.logging import get_logger

log = get_logger("videotgb.eval")

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def evaluate(cfg: Config) -> dict[str, float]:
    from videotgb_tpu.train import build_data, build_model, build_recipe, evaluate_tg
    from videotgb_tpu.training.checkpoint import CheckpointConfig, CheckpointManager
    from videotgb_tpu.training.trainer import TrainState

    assert cfg.get("ckpt_path") not in (None, "???"), "ckpt_path is required"

    model, mcfg = build_model(cfg)
    recipe = build_recipe(cfg)
    _, val_loader, tok = build_data(cfg, mcfg)

    # init a template tree then restore
    import jax.numpy as jnp

    first = next(iter(val_loader))
    from videotgb_tpu.data.loader import device_batch

    db = device_batch(first)
    key = jax.random.key(cfg.get("seed", 42))
    variables = model.init(
        key, jnp.asarray(db["frames"]), jnp.asarray(db["flow"]),
        jnp.asarray(db["flow_mask"]), jnp.asarray(db["video_length"]),
        jnp.asarray(db["sampler_question_ids"]),
        jnp.asarray(db["sampler_question_mask"]),
        jnp.asarray(db["question_ids"]), jnp.asarray(db["question_mask"]),
        key, method=model.init_pipeline,
    )
    params = nn.meta.unbox(variables)["params"]
    from videotgb_tpu.training.checkpoint import resolve_ckpt_path

    root, step = resolve_ckpt_path(str(cfg.ckpt_path))
    mgr = CheckpointManager(CheckpointConfig(directory=root))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {root}")
    # params-only template: full train-state checkpoints skip their
    # optimizer payload (partial Composite templates are allowed)
    restored = mgr.restore(step, template={"params": params})["params"]
    state = TrainState(restored, None, jnp.zeros((), jnp.int32))

    if cfg.model.get("recipe", "tg") == "tg":
        metrics = evaluate_tg(model, recipe, state, val_loader, tok)
    else:
        # generative recipes restore + generate + score, like the reference's
        # trainer.test -> eval_forward (src/eval.py:69 ->
        # LSTP_SF_blip2_module.py:595-611) — deterministic (dropout off),
        # BLEU-1 val/score, loss skipped where the recipe needs train-time
        # pseudo labels (SF)
        from videotgb_tpu.train import evaluate_generative

        metrics = evaluate_generative(
            model, recipe, state, val_loader, tok,
            max_new_tokens=cfg.model.get("eval_max_new", 16))
    metrics = {f"test{k[3:]}" if k.startswith("val") else k: v
               for k, v in metrics.items()}
    log.info("test metrics: %s", metrics)
    return metrics


def main(argv: list[str] | None = None) -> dict[str, float]:
    argv = argv if argv is not None else sys.argv[1:]
    cfg = compose(CONFIG_DIR, "eval", argv)
    from videotgb_tpu.utils.task import apply_extras, setup_run_dir

    setup_run_dir(cfg, job_name="eval", overrides=argv)
    apply_extras(cfg)
    return evaluate(cfg)


if __name__ == "__main__":
    main()
