"""bench_train.py must print its one-line JSON metric — the training-side
sibling of tests/test_bench.py's driver-surface check, so bit-rot in any
recipe/trainer interface it touches is caught here at the tiny preset."""

import contextlib
import io
import json
import sys

import numpy as np


def test_bench_train_prints_one_json_metric_line(monkeypatch):
    monkeypatch.setenv("BENCH_TRAIN_PRESET", "tiny")
    monkeypatch.setenv("BENCH_TRAIN_MODES", "tg,ivt,iv,e2e,sf")
    monkeypatch.setenv("BENCH_TRAIN_STEPS", "1")
    sys.modules.pop("bench_train", None)
    import bench_train

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_train.main()
    line = buf.getvalue().strip().splitlines()[-1]
    result = json.loads(line)
    assert result["metric"] == "train_clips_per_sec_per_chip"
    assert result["unit"] == "clips/s"
    assert result["value"] > 0
    for mode in ("tg", "ivt", "iv", "e2e", "sf"):
        m = result["per_mode"][mode]
        assert m["clips_per_s"] > 0, mode
        assert m["step_ms"] > 0, mode
        assert m["step_ms_synced"] > 0, mode
        assert np.isfinite(m["loss"]), mode
    # the IVT mode runs the reference's accumulation semantics
    assert result["per_mode"]["ivt"]["effective_batch"] == (
        result["per_mode"]["ivt"]["batch"] * result["per_mode"]["ivt"]["accum"])


def test_freeze_bf16_casts_frozen_leaves_only():
    """IVT residency split: frozen towers -> bf16, trainable subtrees and
    LoRA adapters stay f32 (optimizer state allocates f32 for those only)."""
    import jax.numpy as jnp

    from bench_train import _freeze_bf16
    from videotgb_tpu.training.recipes import IVTRecipe

    params = {
        "model": {
            "qformer": {"w": jnp.zeros((2, 2), jnp.float32)},
            "vision_model": {"w": jnp.zeros((2, 2), jnp.float32)},
            "language_model": {
                "q_lora": {"a": jnp.zeros((2, 2), jnp.float32)},
                "q": {"kernel": jnp.zeros((2, 2), jnp.float32)},
            },
        },
    }
    out = _freeze_bf16(params, IVTRecipe().filter_fn)
    assert out["model"]["qformer"]["w"].dtype == jnp.float32  # trainable
    assert out["model"]["language_model"]["q_lora"]["a"].dtype == jnp.float32
    assert out["model"]["vision_model"]["w"].dtype == jnp.bfloat16  # frozen
    assert out["model"]["language_model"]["q"]["kernel"].dtype == jnp.bfloat16
