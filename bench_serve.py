"""True serving-latency benchmark: Poisson arrivals through ServingEngine.

bench.py reports an *amortized* p50 (device_batch_ms / batch + decode) — a
throughput figure. This harness measures what a client actually observes:
requests arrive as a Poisson process, the engine batches them under its
max-delay policy, and we report the measured per-request latency
distribution from ``Reply.latency_ms`` (queueing + batching delay + both
device phases included) at several batch-size settings.

Run:  python bench_serve.py
Env:  SERVE_PRESET=flagship|small|tiny  SERVE_BATCHES=1,8,64
      SERVE_RATE=8 (req/s)  SERVE_REQUESTS=64  SERVE_MAX_NEW=16
      SERVE_DELAY_MS=30  SERVE_FLOW_FRAMES=4
      SERVE_MESH="dp=8"  (mesh-sharded engine; batch must divide dp*fsdp)
      SERVE_CPU=8        (force a virtual 8-device CPU platform — the
                          queueing/batching behavioral rig for multi-chip
                          layouts this host can't provide; latencies are
                          then CPU-compute-bound, NOT chip numbers)

Prints one JSON line:
  {"metric": "serve_p50_request_latency_ms", "value": ..., "unit": "ms",
   "per_batch": {"1": {"p50": ..., "p99": ..., ...}, ...}}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def bench_one(batch_size: int, preset: str, rate: float, n_requests: int,
              max_new: int, flow_frames: int, delay_ms: float,
              mesh: str | None = None) -> dict:
    from videotgb_tpu.serve import ServingEngine

    eng = ServingEngine(f"random:{preset}", preset=preset,
                        batch_size=batch_size, flow_frames=flow_frames,
                        max_new_tokens=max_new, max_delay_ms=delay_ms,
                        mesh=mesh)
    try:
        rng = np.random.default_rng(0)
        image = (eng.cfg.blip2.vit.image_size if eng.cfg.blip2 is not None
                 else eng.cfg.instructblip.vit.image_size)
        fs = eng.cfg.tgb.flow_size
        frames = rng.integers(0, 255, (eng.cfg.num_frames, image, image, 3),
                              np.uint8)
        flow = rng.integers(0, 255, (flow_frames + 1, fs, fs, 3), np.uint8)

        # warmup: compile both phases at this batch size (pad-path included)
        t0 = time.perf_counter()
        eng.submit(frames, flow, "warmup?").result(timeout=1800)
        compile_s = time.perf_counter() - t0

        # Poisson arrivals: exponential inter-arrival at `rate` req/s
        gaps = rng.exponential(1.0 / rate, n_requests)
        futs = []
        t_start = time.perf_counter()
        for i, gap in enumerate(gaps):
            time.sleep(gap)
            futs.append(eng.submit(frames, flow, f"question {i}?"))
        lats = np.array([f.result(timeout=1800).latency_ms for f in futs])
        wall = time.perf_counter() - t_start
        stats = eng.stats()  # the engine's own loaded-latency decomposition
        return {
            "p50": round(float(np.percentile(lats, 50)), 1),
            "p90": round(float(np.percentile(lats, 90)), 1),
            "p99": round(float(np.percentile(lats, 99)), 1),
            "mean": round(float(lats.mean()), 1),
            "max": round(float(lats.max()), 1),
            "throughput_req_s": round(n_requests / wall, 2),
            "compile_s": round(compile_s, 1),
            "n": n_requests,
            "batches": stats["batches"],
            # per-phase wall (ms): queue_wait / assembly / host_prep /
            # select / gather / answer / postprocess — the /v1/stats view,
            # so every serving run is self-describing
            "phase_ms": stats.get("phase_ms", {}),
        }
    finally:
        eng.close()


def main() -> None:
    cpu_devices = int(os.environ.get("SERVE_CPU", "0"))
    if cpu_devices:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", cpu_devices)
    else:
        from bench import wait_for_compiler

        wait_for_compiler(float(os.environ.get("BENCH_COMPILE_WAIT_S", "900")))
    mesh = os.environ.get("SERVE_MESH") or None
    preset = os.environ.get("SERVE_PRESET", "flagship")
    batches = [int(x) for x in
               os.environ.get("SERVE_BATCHES", "1,8").split(",")]
    rate = float(os.environ.get("SERVE_RATE", "8"))
    n_requests = int(os.environ.get("SERVE_REQUESTS", "48"))
    max_new = int(os.environ.get("SERVE_MAX_NEW", "16"))
    delay_ms = float(os.environ.get("SERVE_DELAY_MS", "30"))
    flow_frames = int(os.environ.get("SERVE_FLOW_FRAMES", "4"))

    per_batch = {}
    for bsz in batches:
        per_batch[str(bsz)] = bench_one(bsz, preset, rate, n_requests,
                                        max_new, flow_frames, delay_ms,
                                        mesh=mesh)
    best_p50 = min(v["p50"] for v in per_batch.values())
    print(json.dumps({
        "metric": "serve_p50_request_latency_ms",
        "value": best_p50,
        "unit": "ms",
        "vs_baseline": round(best_p50 / 250.0, 3),  # target: < 250 ms
        "preset": preset,
        "rate_req_s": rate,
        "max_delay_ms": delay_ms,
        "per_batch": per_batch,
    }))


if __name__ == "__main__":
    main()
