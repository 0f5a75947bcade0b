"""Trace one jitted TRAIN step and print the top device ops.

Usage: python tools/traintraceprobe.py tg|ivt|sf [--preset P] [--top K]

The serving segments have tools/traceprobe.py; this is its training-side
sibling so train-step perf work targets measured hotspots too. Builds the
exact step bench_train.py times (same recipe/trainer/batch construction),
warms it, then traces two steady-state steps — rethreading the donated
state between calls (train_step donates params/opt_state; replaying the
same state object would hit invalidated buffers).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["tg", "ivt", "sf"])
    ap.add_argument("--preset", default=None,
                    help="override preset (default: bench_train's per-mode)")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/root/.jax_cache"))

    import bench_train
    from traceprobe import summarize

    # bench_train's _timed_steps runs warmup + n steps; monkeypatch it to
    # trace the steady-state steps instead of timing them, so the batch /
    # model / trainer construction stays byte-for-byte the benched one.
    trace_dir = tempfile.mkdtemp(prefix="jaxtraintrace_")
    orig = bench_train._timed_steps

    # host/python tracing off: a train-step dispatch emits ~500k python
    # events which blow the trace's event budget and drop the device ops
    # (observed: the whole module vanished from the trace)
    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = 0
    opts.python_tracer_level = 0

    def traced_steps(trainer, state, batch, n_steps):
        state, metrics = trainer.train_step(state, batch)  # compile + warm
        float(metrics["loss"])
        with jax.profiler.trace(trace_dir, profiler_options=opts):
            for _ in range(2):
                state, metrics = trainer.train_step(state, batch)
                float(metrics["loss"])
        return orig(trainer, state, batch, 1)

    bench_train._timed_steps = traced_steps
    default_preset = {"tg": "flagship", "ivt": "flagship", "sf": "small"}
    preset = args.preset or default_preset[args.which]
    fn = {"tg": bench_train.bench_tg, "ivt": bench_train.bench_ivt,
          "sf": bench_train.bench_sf}[args.which]
    result = fn(preset, 1)
    print({"mode": args.which, "preset": preset, "step_ms": result["step_ms"]})
    summarize(trace_dir, args.top)


if __name__ == "__main__":
    main()
