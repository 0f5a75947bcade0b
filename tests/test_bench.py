"""Driver-surface smoke tests: bench.py must print its one-line JSON metric
and __graft_entry__ must expose a jittable entry — these are the two
artifacts the round driver executes, so bit-rot here silently zeroes the
recorded benchmark."""

import contextlib
import io
import json
import sys

import pytest


@pytest.fixture()
def bench_env(monkeypatch):
    monkeypatch.setenv("BENCH_PRESET", "tiny")
    monkeypatch.setenv("BENCH_BATCH", "2")
    monkeypatch.setenv("BENCH_ITERS", "1")
    monkeypatch.setenv("BENCH_MAX_NEW", "2")
    monkeypatch.setenv("BENCH_E2E_ITERS", "2")
    monkeypatch.setenv("BENCH_FLOW_FRAMES", "2")


def test_bench_prints_one_json_metric_line(bench_env):
    sys.modules.pop("bench", None)
    import bench

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    line = buf.getvalue().strip().splitlines()[-1]
    result = json.loads(line)
    assert result["metric"] == "device_sustained_decoded_frames_per_sec_per_chip"
    assert result["unit"] == "frames/s"
    assert result["value"] > 0
    assert result["vs_baseline"] > 0
    for key in ("device_batch_ms", "pipeline_batch_ms", "e2e_this_host_fps",
                "p50_clip_latency_ms", "decode_ms_per_clip", "batch",
                "params_millions"):
        assert key in result, key


def test_graft_entry_compiles():
    import jax

    import __graft_entry__ as g

    fn, example_args = g.entry()
    lowered = jax.jit(fn).lower(*example_args)
    assert lowered.compile() is not None
