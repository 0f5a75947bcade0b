"""Utils tests: writers, profiling helpers, RNG streams."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from videotgb_tpu.utils.profiling import fetch, timed
from videotgb_tpu.utils.rng import RngStream
from videotgb_tpu.utils.writers import CSVWriter, build_writers


def test_csv_writer_appends_and_handles_new_fields(tmp_path):
    w = CSVWriter(str(tmp_path))
    w.log_hyperparams({"lr": 1e-4})
    w.log_metrics({"loss": 1.0}, step=1)
    w.log_metrics({"loss": 0.5, "iou": 0.3}, step=2)  # new column mid-run
    rows = list(csv.DictReader(open(w.path)))
    assert len(rows) == 2
    assert rows[1]["iou"] == "0.3"
    assert os.path.exists(tmp_path / "hparams.json")


def test_build_writers_skips_unavailable(tmp_path):
    multi = build_writers(["csv", "wandb", "nope"], str(tmp_path))
    assert len(multi.writers) >= 1  # csv always works; wandb likely absent
    multi.log_metrics({"a": 1.0}, 0)
    multi.finish()


def test_build_writers_accepts_all_reference_logger_names(tmp_path):
    """Every logger the reference's configs/logger/ group names is accepted
    and degrades to a warning when its lib is absent (aim/comet/mlflow/
    neptune are not in this image) — never a crash."""
    names = ["csv", "tensorboard", "wandb", "aim", "comet", "mlflow",
             "neptune"]
    multi = build_writers(names, str(tmp_path))
    assert len(multi.writers) >= 2  # csv + tensorboard always available
    multi.log_hyperparams({"lr": 1e-4})
    multi.log_metrics({"loss": 0.5}, 1)
    multi.finish()


def test_timed_returns_median_and_output():
    f = jax.jit(lambda x: x * 2)
    t, out = timed(f, jnp.ones((8, 8)), iters=3)
    assert t >= 0
    np.testing.assert_array_equal(out, np.full((8, 8), 2.0))


def test_rng_stream_deterministic_and_distinct():
    s = RngStream(42)
    k1 = s.fold(1, "train")
    k2 = RngStream(42).fold(1, "train")
    k3 = s.fold(1, "eval")
    np.testing.assert_array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    assert not np.array_equal(jax.random.key_data(k1), jax.random.key_data(k3))
