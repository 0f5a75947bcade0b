"""A/B Q-Former attention formulations at serving shapes.

The qformer traceprobe (batch 64 -> 256 frames) shows ~40 ms/iter against a
~20 ms matmul floor; the fat is ~7 ms of layout copies (head transposes
around the XLA `small` attention path) and ~10 ms of convert+reduce fusions
(f32 softmax/LN on small tensors). Variants per attention call, both
QFormer shapes (self: 32 queries over 32 keys; cross: 32 queries over 264
ViT patches, kv projected from 1408):

  a) current: q/k/v dense -> reshape -> transpose(0,2,1,3) -> einsum bhqd
     -> transpose back -> out proj (ops.attention.dot_product_attention)
  b) bshd: same denses, NO transposes — einsum 'bqhd,bkhd->bhqk' and
     'bhqk,bkhd->bqhd' straight on the (B,S,H,D) layout
  c) flash: force the Pallas row-batched kernel (use_pallas=True) below its
     `small` threshold

Each variant runs a stack of L mini-layers (projections + attention +
out-proj + residual) so fusion matches production; exactness checked vs (a).

Usage: python tools/qformerattnprobe.py [--layers 12] [--iters 5]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--frames", type=int, default=256,
                    help="batch*nframe at serving batch 64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videotgb_tpu.ops.attention import flash_attention

    B, Q, KV = args.frames, 32, 264
    H, D, E, EV = 12, 64, 768, 1408
    dt = jnp.bfloat16
    L = args.layers
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, Q, E), dt)
    enc = jax.random.normal(jax.random.fold_in(key, 9), (B, KV, EV), dt)
    wq, wo = (jax.random.normal(jax.random.fold_in(key, i), (E, E), dt) * 0.02
              for i in range(2))
    wk, wv = (jax.random.normal(jax.random.fold_in(key, 5 + i), (EV, E), dt)
              * 0.02 for i in range(2))
    wks, wvs = (jax.random.normal(jax.random.fold_in(key, 7 + i), (E, E), dt)
                * 0.02 for i in range(2))
    scale = D ** -0.5

    def attn_a(q, k, v):  # current: transpose into BHSD einsum
        q = q.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return ctx.transpose(0, 2, 1, 3).reshape(B, -1, E)

    def attn_b(q, k, v):  # BSHD all the way, no transposes
        q = q.reshape(B, -1, H, D)
        k = k.reshape(B, -1, H, D)
        v = v.reshape(B, -1, H, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        return ctx.reshape(B, -1, E)

    def attn_c(q, k, v):  # force the Pallas kernel below its small threshold
        q = q.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        ctx = flash_attention(q, k, v, scale=scale, use_pallas=True)
        return ctx.transpose(0, 2, 1, 3).reshape(B, -1, E)

    # everything flows in as jit ARGS — closed-over arrays bake into the
    # HLO as constants the remote compile service must ingest (CLAUDE.md)
    W = (wq, wks, wvs, wk, wv, wo)

    def layer(attn, x, enc, W, cross):
        wq, wks, wvs, wk, wv, wo = W
        h = attn(x @ wq, x @ wks, x @ wvs)
        x = x + h @ wo
        if cross:
            h = attn(x @ wq, enc @ wk, enc @ wv)
            x = x + h @ wo
        return x

    def stack(attn, cross):
        def run(x, enc, *W):
            for _ in range(L):
                x = layer(attn, x, enc, W, cross)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(run)

    for cross in (False, True):
        tag = "self+cross" if cross else "self-only "
        one_a = jax.jit(lambda x, enc, *W: layer(attn_a, x, enc, W, cross))
        ra = one_a(x, enc, *W)
        for name, attn in (("a transpose+einsum", attn_a),
                           ("b bshd einsum     ", attn_b),
                           ("c pallas flash    ", attn_c)):
            try:
                f = stack(attn, cross)
                ms = timed(f, x, enc, *W, iters=args.iters) * 1000 / L
                one = jax.jit(
                    lambda x, enc, *W, attn=attn: layer(attn, x, enc, W, cross))
                rv = one(x, enc, *W)
                d = float(jnp.max(jnp.abs(ra.astype(jnp.float32)
                                          - rv.astype(jnp.float32))))
                print(f"{tag} {name} {ms:8.3f} ms/layer  "
                      f"max_abs_vs_a={d:.2e}", flush=True)
            except Exception as e:
                print(f"{tag} {name} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
