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
def vit_probe(batch: int, layers: int):
    import jax
    import jax.numpy as jnp

    from videotgb_tpu.ops.attention import flash_attention, dot_product_attention

    H, HEADS, D, FF, S = 1408, 16, 88, 6144, 257
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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["vit", "raft", "model"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--layers", type=int, default=39)
    ap.add_argument("--pairs", type=int, default=32)
    args = ap.parse_args()
    import jax  # noqa: F401  (module-level for timed())

    if args.which == "vit":
        vit_probe(args.batch, args.layers)
    elif args.which == "raft":
        raft_probe(args.pairs)
    else:
        model_probe(args.batch)
