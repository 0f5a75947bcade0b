"""TPU performance probe: segment timings + ViT layout variants.

Round-2 perf work needs ground truth on where the flagship pipeline's device
time goes (VERDICT.md "What's weak" 1-2) before touching layouts. This probe
times, on the real chip:

  vit      — flagship-shape ViT layer stacks, hand-rolled as pure jnp fns so
             attention-layout variants can be A/B'd without flax plumbing:
               A: current (reshape -> transpose -> flash -> transpose)
               B: einsum projections straight to (B,H,S,D) / back
               C: fused single QKV matmul + B's einsums
               D: XLA dot_product_attention in bshd layout (no Pallas)
  raft     — one RAFT flow pair at 224^2, plus fnet / corr-build / GRU-scan
             segment splits.
  model    — the real flax towers (ViTModel flagship, RAFT) end to end.

Usage: python tools/perfprobe.py vit|raft|model [--batch N]
Results print as one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def _jax():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def timed(fn, *args, iters=5):
    """Median seconds; host fetch is the only real sync on this backend."""
    def sync(out):
        leaf = out if hasattr(out, "shape") else jax.tree.leaves(out)[0]
        np.asarray(leaf)

    sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def report(name, seconds, flops=None, extra=None):
    rec = {"probe": name, "ms": round(seconds * 1000, 2)}
    if flops:
        rec["tflops_per_s"] = round(flops / seconds / 1e12, 1)
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


# --------------------------------------------------------------------- ViT
def vit_probe(batch: int, layers: int, seq: int = 257):
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.ops.attention import flash_attention, dot_product_attention

    H, HEADS, D, FF, S = 1408, 16, 88, 6144, seq
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    scale = 0.02
    w = {
        "wq": jax.random.normal(ks[0], (H, H), jnp.bfloat16) * scale,
        "wk": jax.random.normal(ks[1], (H, H), jnp.bfloat16) * scale,
        "wv": jax.random.normal(ks[2], (H, H), jnp.bfloat16) * scale,
        "wo": jax.random.normal(ks[3], (H, H), jnp.bfloat16) * scale,
        "w1": jax.random.normal(ks[4], (H, FF), jnp.bfloat16) * scale,
        "w2": jax.random.normal(ks[5], (FF, H), jnp.bfloat16) * scale,
        "wqkv": jax.random.normal(ks[6], (H, 3, HEADS, D), jnp.bfloat16) * scale,
    }
    w["wq4"] = w["wq"].reshape(H, HEADS, D)
    w["wk4"] = w["wk"].reshape(H, HEADS, D)
    w["wv4"] = w["wv"].reshape(H, HEADS, D)
    w["wo4"] = w["wo"].reshape(HEADS, D, H)
    x = jax.random.normal(ks[7], (batch, S, H), jnp.bfloat16)

    def ln(x):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, -1, keepdims=True)
        v = jnp.var(x32, -1, keepdims=True)
        return ((x32 - m) * jax.lax.rsqrt(v + 1e-6)).astype(x.dtype)

    def mlp(x, w):
        return jax.nn.gelu(x @ w["w1"]) @ w["w2"]

    def layer_a(x, w):  # current: reshape + transpose around flash
        h = ln(x)
        def proj(wname):
            y = h @ w[wname]
            return y.reshape(batch, S, HEADS, D).transpose(0, 2, 1, 3)
        q, k, v = proj("wq"), proj("wk"), proj("wv")
        ctx = flash_attention(q, k, v, scale=D ** -0.5)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(batch, S, H)
        x = x + ctx @ w["wo"]
        return x + mlp(ln(x), w)

    def layer_b(x, w):  # einsum straight to bhsd
        h = ln(x)
        q = jnp.einsum("bse,ehd->bhsd", h, w["wq4"])
        k = jnp.einsum("bse,ehd->bhsd", h, w["wk4"])
        v = jnp.einsum("bse,ehd->bhsd", h, w["wv4"])
        ctx = flash_attention(q, k, v, scale=D ** -0.5)
        x = x + jnp.einsum("bhsd,hde->bse", ctx, w["wo4"])
        return x + mlp(ln(x), w)

    def layer_c(x, w):  # fused qkv single matmul
        h = ln(x)
        qkv = jnp.einsum("bse,ethd->tbhsd", h, w["wqkv"])
        ctx = flash_attention(qkv[0], qkv[1], qkv[2], scale=D ** -0.5)
        x = x + jnp.einsum("bhsd,hde->bse", ctx, w["wo4"])
        return x + mlp(ln(x), w)

    def layer_d(x, w):  # XLA attention, bshd all the way (no Pallas)
        h = ln(x)
        q = (h @ w["wq"]).reshape(batch, S, HEADS, D)
        k = (h @ w["wk"]).reshape(batch, S, HEADS, D)
        v = (h @ w["wv"]).reshape(batch, S, HEADS, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + ctx.reshape(batch, S, H) @ w["wo"]
        return x + mlp(ln(x), w)

    flops_layer = batch * (4 * 2 * S * H * H + 2 * 2 * S * H * FF
                           + 4 * S * S * H)
    flops = flops_layer * layers

    for name, layer in [("A_current", layer_a), ("B_einsum_bhsd", layer_b),
                        ("C_fused_qkv", layer_c), ("D_xla_bshd", layer_d)]:
        def stack(x, w, layer=layer):
            def body(x, _):
                return layer(x, w), None
            y, _ = jax.lax.scan(body, x, None, length=layers)
            # scalar output: fetching the full activation would swamp the
            # timing in host-tunnel transfer (~35 MB/s)
            return jnp.sum(y.astype(jnp.float32))
        fn = jax.jit(stack)
        t0 = time.perf_counter()
        _ = np.asarray(fn(x, w))
        compile_s = time.perf_counter() - t0
        sec = timed(fn, x, w)
        report(f"vit_{name}", sec, flops,
               {"batch": batch, "layers": layers,
                "compile_s": round(compile_s, 1)})

    # pure matmul reference at the same shapes
    def mm(x, w):
        def body(x, _):
            return jax.nn.gelu(x @ w["w1"]) @ w["w2"], None
        y, _ = jax.lax.scan(body, x, None, length=layers)
        return jnp.sum(y.astype(jnp.float32))
    fn = jax.jit(mm)
    sec = timed(fn, x, w)
    report("matmul_mlp_only", sec, batch * 2 * 2 * S * H * FF * layers,
           {"batch": batch})


# -------------------------------------------------------------------- RAFT
def raft_probe(pairs: int):
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.models.raft import RAFT, RAFTConfig, BasicEncoder
    from videotgb_tpu.ops.correlation import build_corr_pyramid

    cfg = RAFTConfig()
    model = RAFT(cfg)
    key = jax.random.key(0)
    img = jax.random.uniform(key, (pairs, 224, 224, 3)) * 255.0
    img2 = jnp.roll(img, 3, axis=2)
    params = jax.jit(model.init)(key, img[:1], img2[:1])

    fn = jax.jit(lambda p, a, b: jnp.sum(model.apply(p, a, b)))
    t0 = time.perf_counter()
    _ = np.asarray(fn(params, img, img2))
    compile_s = time.perf_counter() - t0
    sec = timed(lambda a, b: fn(params, a, b), img, img2)
    report("raft_full", sec, extra={"pairs": pairs, "ms_per_pair":
                                    round(sec * 1000 / pairs, 2),
                                    "compile_s": round(compile_s, 1)})

    # segments
    enc = BasicEncoder(cfg.fnet_dim, "instance", dtype=cfg.dtype)
    ep = jax.jit(enc.init)(key, img[:1])
    efn = jax.jit(lambda p, a: jnp.sum(enc.apply(p, a)))
    sec = timed(lambda a: efn(ep, a), jnp.concatenate([img, img2]))
    report("raft_fnet_both", sec, extra={"pairs": pairs})

    raw = jax.jit(enc.apply)
    f1, f2 = raw(ep, img), raw(ep, img2)
    bfn = jax.jit(lambda a, b: jnp.sum(jnp.stack(
        [jnp.sum(l) for l in build_corr_pyramid(a, b, cfg.corr_levels)])))
    sec = timed(bfn, f1, f2)
    report("raft_corr_build", sec, extra={"pairs": pairs})


def model_probe(batch: int):
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.models.vit import ViTConfig, ViTModel

    cfg = ViTConfig(scan_layers=True, param_dtype=jnp.bfloat16)
    model = ViTModel(cfg)
    key = jax.random.key(0)
    px = jax.random.uniform(key, (batch, 224, 224, 3), jnp.float32)
    from flax import linen as nn

    params = nn.meta.unbox(jax.jit(model.init)(key, px[:1]))
    fn = jax.jit(lambda p, a: jnp.sum(model.apply(p, a).astype(jnp.float32)))
    t0 = time.perf_counter()
    _ = np.asarray(fn(params, px))
    compile_s = time.perf_counter() - t0
    sec = timed(lambda a: fn(params, a), px)
    H, HEADS, D, FF, S, L = 1408, 16, 88, 6144, 257, 39
    flops = batch * L * (4 * 2 * S * H * H + 2 * 2 * S * H * FF + 4 * S * S * H)
    report("vit_flax_flagship", sec, flops,
           {"batch": batch, "compile_s": round(compile_s, 1)})


def pipe_probe(batch: int, max_new: int = 16, flow_frames: int = 4):
    """Flagship end-to-end segment budget on the real chip: where does the
    bench's device_batch_ms actually go? Segments: RAFT flow, ViT tower,
    Q-Former+T5-encode+TGB+selection (prepare), T5 decode loop."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench as B
    from videotgb_tpu.models.videotgb import (
        VideoTGB, VideoTGBConfig, generate_blip2, t5_generate_from_encoder)
    from videotgb_tpu.ops.decode import DecodeConfig

    cfg = B._scan_layers(B._fast_act(B._bf16_params(VideoTGBConfig.flagship())))
    cfg = dataclasses.replace(
        cfg, raft=dataclasses.replace(cfg.raft, dtype=jnp.bfloat16))
    model = VideoTGB(cfg)
    image = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size
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

    # segment 1: RAFT flow
    flow_fn = jax.jit(lambda p, f: jnp.sum(model.apply(
        p, f, method=model.flow_features).astype(jnp.float32)))
    _ = np.asarray(flow_fn(params, flow_rgb))
    report("pipe_raft_flow", timed(lambda f: flow_fn(params, f), flow_rgb),
           extra={"batch": batch, "pairs": batch * flow_frames})

    flow = jax.jit(lambda p, f: model.apply(
        p, f, method=model.flow_features))(params, flow_rgb)
    jax.block_until_ready(flow)

    # segment 2: ViT + Q-Former on the selected-frame slab (fixed selection)
    nframe = cfg.nframe
    cand = jnp.tile(jnp.arange(nframe, dtype=jnp.int32)[None], (batch, 1))
    vit_fn = jax.jit(lambda p, f: jnp.sum(model.apply(
        p, f, cand, True, method=model.encode_selected).astype(jnp.float32)))
    _ = np.asarray(vit_fn(params, bd["frames"]))
    report("pipe_vit_qformer", timed(lambda f: vit_fn(params, f), bd["frames"]),
           extra={"frames": batch * nframe})

    # segment 3: full prepare (ViT + QFormer + TGB + selection + T5 encode)
    prep_fn = jax.jit(lambda p, bd, flow, k: jax.tree.map(
        lambda x: jnp.sum(x.astype(jnp.float32)), model.apply(
            p, bd["frames"], flow, bd["flow_mask"], bd["video_length"],
            bd["sampler_question_ids"], bd["sampler_question_mask"],
            bd["question_ids"], bd["question_mask"], k,
            method=model.prepare_t5_inference)))
    _ = jax.tree.leaves(prep_fn(params, bd, flow, key))
    np.asarray(jax.tree.leaves(prep_fn(params, bd, flow, key))[0])
    report("pipe_prepare_all", timed(
        lambda: jax.tree.leaves(prep_fn(params, bd, flow, key))[0]),
        extra={"batch": batch})

    # segment 4: decode loop given encoder state
    enc_hidden, enc_mask, _ = jax.jit(lambda p, bd, flow, k: model.apply(
        p, bd["frames"], flow, bd["flow_mask"], bd["video_length"],
        bd["sampler_question_ids"], bd["sampler_question_mask"],
        bd["question_ids"], bd["question_mask"], k,
        method=model.prepare_t5_inference))(params, bd, flow, key)
    jax.block_until_ready((enc_hidden, enc_mask))
    dcfg = DecodeConfig(max_new_tokens=max_new, eos_token_id=-1, pad_token_id=0)
    dec_fn = jax.jit(lambda p, eh, em, k: t5_generate_from_encoder(
        model, p, eh, em, dcfg, k))
    _ = np.asarray(dec_fn(params, enc_hidden, enc_mask, key))
    report("pipe_t5_decode", timed(
        lambda: dec_fn(params, enc_hidden, enc_mask, key)),
        extra={"batch": batch, "max_new": max_new})

    # whole pipeline for cross-check
    full = jax.jit(lambda p, f, fl, bd, k: generate_blip2(
        model, p, dict(bd, frames=f, flow=model.apply(
            p, fl, method=model.flow_features)), dcfg, k)[0])
    _ = np.asarray(full(params, bd["frames"], flow_rgb, bd, key))
    report("pipe_full", timed(
        lambda: full(params, bd["frames"], flow_rgb, bd, key)),
        extra={"batch": batch})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["vit", "raft", "model", "pipe"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--layers", type=int, default=39)
    ap.add_argument("--pairs", type=int, default=32)
    ap.add_argument("--max_new", type=int, default=16)
    ap.add_argument("--seq", type=int, default=257)
    args = ap.parse_args()
    import jax  # noqa: F401  (module-level for timed())

    if args.which == "vit":
        vit_probe(args.batch, args.layers, args.seq)
    elif args.which == "raft":
        raft_probe(args.pairs)
    elif args.which == "pipe":
        pipe_probe(args.batch, args.max_new)
    else:
        model_probe(args.batch)
