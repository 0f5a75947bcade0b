"""Capture a jax.profiler trace of one pipeline segment and print the top ops.

Usage: python tools/traceprobe.py raft|vit|decode|pipe [--batch N] [--top K]

Parses the XPlane-derived trace.json.gz that jax.profiler writes and
aggregates device-stream op durations by HLO op name prefix, so perf work
targets measured hotspots (PAPERS.md round-2 rule: profile before rewriting).
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import tempfile

import numpy as np


def run_and_trace(fn, *args):
    import jax

    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    # warm/compile first so the trace holds steady-state steps only
    np.asarray(jax.tree.leaves(fn(*args))[0])
    with jax.profiler.trace(tmp):
        for _ in range(2):
            np.asarray(jax.tree.leaves(fn(*args))[0])
    return tmp


def summarize(trace_dir: str, top: int = 40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print(json.dumps({"error": "no trace written", "dir": trace_dir}))
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events: pid names contain "TPU"/"Device"; host
    # threads are excluded by requiring the XLA op metadata fields
    durs = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "Device" in n or "/device" in n.lower()}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        key = name.split(".")[0]
        durs[key] += dur
        counts[key] += 1
        total += dur
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[:top]
    print(json.dumps({"device_total_ms": round(total, 2),
                      "trace": sorted(paths)[-1]}))
    for name, ms in rows:
        print(json.dumps({"op": name[:110], "ms": round(ms, 2),
                          "n": counts[name],
                          "pct": round(100 * ms / max(total, 1e-9), 1)}))


def build(which: str, batch: int, max_new: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import bench as B
    from videotgb_tpu.models.videotgb import (
        VideoTGB, VideoTGBConfig, t5_generate_from_encoder)
    from videotgb_tpu.ops.decode import DecodeConfig

    cfg = B._scan_layers(B._fast_act(B._bf16_params(VideoTGBConfig.flagship())))
    cfg = dataclasses.replace(
        cfg, raft=dataclasses.replace(cfg.raft, dtype=jnp.bfloat16))
    model = VideoTGB(cfg)
    image = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size
    flow_frames = 4
    key = jax.random.key(0)
    text_len = 24
    bd = {
        "frames": jax.random.uniform(key, (batch, cfg.num_frames, image, image, 3)),
        "sampler_question_ids": jnp.full((batch, text_len), 200, jnp.int32),
        "sampler_question_mask": jnp.ones((batch, text_len), jnp.float32),
        "question_ids": jnp.full((batch, text_len), 200, jnp.int32),
        "question_mask": jnp.ones((batch, text_len), jnp.float32),
        "flow_mask": jnp.ones((batch, flow_frames + 2), jnp.float32),
        "video_length": jnp.full((batch,), flow_frames, jnp.int32),
    }
    flow_rgb = jax.random.uniform(
        key, (batch, flow_frames + 1, fs, fs, 3)) * 255.0
    init_flow = jnp.zeros((1, flow_frames, fs, fs, 2))
    variables = jax.jit(lambda k: model.init(
        k, bd["frames"][:1], init_flow, bd["flow_mask"][:1],
        bd["video_length"][:1], bd["sampler_question_ids"][:1],
        bd["sampler_question_mask"][:1], bd["question_ids"][:1],
        bd["question_mask"][:1], k, method=model.init_pipeline))(key)
    from flax import linen as nn

    params = nn.meta.unbox(variables)
    jax.block_until_ready(params)

    # params MUST flow in as a jit argument: closing over them bakes ~3.4 GB
    # of constants into the HLO, which the remote compile service has to
    # ingest over the tunnel (>25 min observed) and which defeats the
    # persistent compile cache.
    if which == "raft":
        fn = jax.jit(lambda p, fr: jnp.sum(model.apply(
            p, fr, method=model.flow_features).astype(jnp.float32)))
        return functools.partial(fn, params, flow_rgb)
    if which == "vit":
        cand = jnp.tile(jnp.arange(cfg.nframe, dtype=jnp.int32)[None], (batch, 1))
        # frames must be a jit ARG too: baked-in they are ~600 MB of HLO
        # constants and the compile service rejects the body (HTTP 413)
        fn = jax.jit(lambda p, fr: jnp.sum(model.apply(
            p, fr, cand, True,
            method=model.encode_selected).astype(jnp.float32)))
        return functools.partial(fn, params, bd["frames"])
    if which == "qformer":
        # isolate the Q-Former at serving shapes: the answer phase runs it
        # over batch*nframe frames' worth of ViT patches
        from flax import linen as nn

        from videotgb_tpu.models.qformer import QFormerModel
        qcfg = cfg.blip2.qformer
        n = batch * cfg.nframe
        qf = QFormerModel(qcfg)
        enc = jax.random.normal(key, (n, 257, qcfg.encoder_hidden_size),
                                jnp.bfloat16)
        queries = jax.random.normal(
            jax.random.fold_in(key, 1),
            (n, qcfg.num_query_tokens, qcfg.hidden_size), jnp.bfloat16)
        qparams = nn.meta.unbox(
            jax.jit(lambda k: qf.init(k, queries[:1], enc[:1]))(key))
        fn = jax.jit(lambda p, qu, e: jnp.sum(
            qf.apply(p, qu, e).astype(jnp.float32)))
        return functools.partial(fn, qparams, queries, enc)
    if which == "decode":
        flow = jax.jit(lambda p, fr: model.apply(
            p, fr, method=model.flow_features))(params, flow_rgb)
        enc_hidden, enc_mask, _ = jax.jit(
            lambda p, fr, fl: model.apply(
                p, fr, fl, bd["flow_mask"], bd["video_length"],
                bd["sampler_question_ids"], bd["sampler_question_mask"],
                bd["question_ids"], bd["question_mask"], key,
                method=model.prepare_t5_inference))(
            params, bd["frames"], flow)
        jax.block_until_ready((enc_hidden, enc_mask))
        dcfg = DecodeConfig(max_new_tokens=max_new, eos_token_id=-1,
                            pad_token_id=0)
        fn = jax.jit(lambda p, eh, em: t5_generate_from_encoder(
            model, p, eh, em, dcfg, key))
        return functools.partial(fn, params, enc_hidden, enc_mask)
    raise SystemExit(which)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["raft", "vit", "decode", "qformer"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max_new", type=int, default=16)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    fn = build(args.which, args.batch, args.max_new)
    d = run_and_trace(fn)
    summarize(d, args.top)
