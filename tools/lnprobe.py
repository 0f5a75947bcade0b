"""A/B the ViT layer's LayerNorm + residual-add passes: XLA vs Pallas fused.

ROOFLINE.md §3 item 2: the ViT trace shows ~0.9 ms/layer of f32 LN
reduce/materialization fat even after the single-pass (E[x²]−E[x]²) rewrite.
Each ViT layer runs two (residual-add → LayerNorm) sequences:

    x = x + attn ; h = LN2(x) ;  x = x + mlp(h) ; h' = LN1_next(x)

Hypothesis: a Pallas kernel computing (res, delta) -> (res+delta,
LN(res+delta)) in one VMEM pass (bf16 in, f32 stats on-chip, bf16 out)
removes XLA's separate add pass and any f32 HBM materialization.

Variants, each a FULL mini-layer stack (qkv proj + flash attn + out proj +
MLP) so fusion opportunities match production:

  a) current: XLA single-pass LayerNorm (models/common.py), separate adds
  b) add_ln:  Pallas fused (add → LN) kernel at both per-layer positions
  c) ln-only: Pallas LN kernel, adds left to XLA (isolates which half wins)

Also prints an isolated LN microbench and a bf16 copy floor at the same
(rows, 1408) shape. Exactness is checked vs (a) (f32 stat-order diffs only).

Usage: python tools/lnprobe.py [--frames 256] [--layers 4] [--iters 5]
"""

from __future__ import annotations

import argparse
import functools
import statistics
import time


def timed(fn, *args, iters=5):
    _ = float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--block", type=int, default=256, help="LN kernel row block")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from videotgb_tpu.ops.attention import flash_attention

    B, S, H, D = args.frames, 264, 16, 88
    E = H * D  # 1408
    F = 6144
    dt = jnp.bfloat16
    eps = 1e-6
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, S, E), dt)
    # weights travel as jit ARGS (a dict pytree) — closed-over arrays bake
    # into the HLO and the remote compile service must ingest them per jit
    # (CLAUDE.md gotcha; the closure version of this probe never returned).
    W = {
        "wq": jax.random.normal(jax.random.fold_in(key, 0), (E, E), dt) * 0.02,
        "wk": jax.random.normal(jax.random.fold_in(key, 1), (E, E), dt) * 0.02,
        "wv": jax.random.normal(jax.random.fold_in(key, 2), (E, E), dt) * 0.02,
        "wo": jax.random.normal(jax.random.fold_in(key, 3), (E, E), dt) * 0.02,
        "wi": jax.random.normal(jax.random.fold_in(key, 10), (E, F), dt) * 0.02,
        "wo2": jax.random.normal(jax.random.fold_in(key, 11), (F, E), dt) * 0.02,
        "g1": jnp.ones((E,), jnp.float32) * 1.1,
        "b1": jnp.zeros((E,), jnp.float32) + 0.01,
    }
    scale = D ** -0.5
    L = args.layers
    bm = args.block

    # ---- XLA single-pass LN (mirror of models/common.py LayerNorm)
    def ln_xla(x, g, b):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        meansq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        return ((x32 - mean) * (inv * g) + b).astype(x.dtype)

    # ---- Pallas fused (add -> LN): (res, delta) -> (res+delta, LN(res+delta))
    def _addln_kern(r_ref, d_ref, g_ref, b_ref, ro_ref, no_ref):
        s = r_ref[...].astype(jnp.float32) + d_ref[...].astype(jnp.float32)
        ro_ref[...] = s.astype(ro_ref.dtype)
        mean = jnp.mean(s, axis=-1, keepdims=True)
        meansq = jnp.mean(s * s, axis=-1, keepdims=True)
        var = jnp.maximum(meansq - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        g = g_ref[...].astype(jnp.float32)
        b = b_ref[...].astype(jnp.float32)
        no_ref[...] = ((s - mean) * (inv * g) + b).astype(no_ref.dtype)

    def add_ln(res, delta, g, b):
        rows = res.shape[0] * res.shape[1]
        r2 = res.reshape(rows, E)
        d2 = delta.reshape(rows, E)
        ro, no = pl.pallas_call(
            _addln_kern,
            grid=(rows // bm,),
            in_specs=[
                pl.BlockSpec((bm, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bm, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, E), res.dtype),
                jax.ShapeDtypeStruct((rows, E), res.dtype),
            ],
        )(r2, d2, g.reshape(1, E), b.reshape(1, E))
        return ro.reshape(res.shape), no.reshape(res.shape)

    # ---- Pallas LN only
    def _ln_kern(x_ref, g_ref, b_ref, o_ref):
        s = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(s, axis=-1, keepdims=True)
        meansq = jnp.mean(s * s, axis=-1, keepdims=True)
        var = jnp.maximum(meansq - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        g = g_ref[...].astype(jnp.float32)
        b = b_ref[...].astype(jnp.float32)
        o_ref[...] = ((s - mean) * (inv * g) + b).astype(o_ref.dtype)

    def ln_pallas(x, g, b):
        rows = x.shape[0] * x.shape[1]
        out = pl.pallas_call(
            _ln_kern,
            grid=(rows // bm,),
            in_specs=[
                pl.BlockSpec((bm, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, E), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, E), x.dtype),
        )(x.reshape(rows, E), g.reshape(1, E), b.reshape(1, E))
        return out.reshape(x.shape)

    def attn_mlp(h, w):
        q = (h @ w["wq"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = (h @ w["wk"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = (h @ w["wv"]).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        ctx = flash_attention(q, k, v, scale=scale)
        return ctx.transpose(0, 2, 1, 3).reshape(B, S, E) @ w["wo"]

    def mlp(h, w):
        return jax.nn.gelu((h @ w["wi"]), approximate=True) @ w["wo2"]

    # ---- a) current
    def layer_a(x, w):
        h = ln_xla(x, w["g1"], w["b1"])
        x = x + attn_mlp(h, w)
        h = ln_xla(x, w["g1"], w["b1"])
        return x + mlp(h, w)

    # ---- b) fused add+LN at both positions (carry (x, h=LN(x)))
    def layer_b(carry, w):
        x, h = carry
        x, h = add_ln(x, attn_mlp(h, w), w["g1"], w["b1"])
        x, h = add_ln(x, mlp(h, w), w["g1"], w["b1"])
        return x, h

    # ---- c) Pallas LN, XLA adds
    def layer_c(x, w):
        h = ln_pallas(x, w["g1"], w["b1"])
        x = x + attn_mlp(h, w)
        h = ln_pallas(x, w["g1"], w["b1"])
        return x + mlp(h, w)

    def stack_plain(layer):
        def run(x, w):
            for _ in range(L):
                x = layer(x, w)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(run)

    def stack_b():
        def run(x, w):
            carry = (x, ln_xla(x, w["g1"], w["b1"]))
            for _ in range(L):
                carry = layer_b(carry, w)
            return jnp.sum(carry[0].astype(jnp.float32))
        return jax.jit(run)

    # correctness first (cheap shapes handled by same code)
    ra = jax.jit(layer_a)(x, W)
    xb, hb = jax.jit(
        lambda x, w: layer_b((x, ln_xla(x, w["g1"], w["b1"])), w))(x, W)
    rc = jax.jit(layer_c)(x, W)
    da = float(jnp.max(jnp.abs(ra.astype(jnp.float32) - xb.astype(jnp.float32))))
    dc = float(jnp.max(jnp.abs(ra.astype(jnp.float32) - rc.astype(jnp.float32))))
    print(f"exactness: b_vs_a={da:.2e}  c_vs_a={dc:.2e}", flush=True)

    fa = stack_plain(layer_a)
    print(f"layer_a (XLA LN)        "
          f"{timed(fa, x, W, iters=args.iters)*1000/L:8.3f} ms/layer", flush=True)
    fb = stack_b()
    print(f"layer_b (Pallas add+LN) "
          f"{timed(fb, x, W, iters=args.iters)*1000/L:8.3f} ms/layer", flush=True)
    fc = stack_plain(layer_c)
    print(f"layer_c (Pallas LN)     "
          f"{timed(fc, x, W, iters=args.iters)*1000/L:8.3f} ms/layer", flush=True)

    # ---- isolated micro numbers
    def iso(fn):
        f = jax.jit(lambda x, g, b: jnp.sum(fn(x, g, b).astype(jnp.float32)))
        return timed(f, x, W["g1"], W["b1"], iters=args.iters) * 1000

    print(f"iso LN xla              {iso(ln_xla):8.3f} ms", flush=True)
    print(f"iso LN pallas           {iso(ln_pallas):8.3f} ms", flush=True)
    fcopy = jax.jit(lambda x: jnp.sum((x + jnp.bfloat16(1.0)).astype(jnp.float32)))
    print(f"iso bf16 add+reduce     {timed(fcopy, x, iters=args.iters)*1000:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
