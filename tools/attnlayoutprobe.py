"""A/B the flash-attention call INCLUDING the surrounding layout moves.

VERDICT (2026-08-17, v5e-1, --layers 8): the BSHD-native kernel (b) is NOT
expressible through this Mosaic toolchain — batch-middle dot_general is
rejected, per-head (1,bq,1,d) blocks violate the block-divisibility rule,
and head-group blocks with static per-head slices (on refs or on loaded
values) crash the remote compile helper (HTTP 500, exit 1). Of the variants
that compile: (a) transpose+BHSD-kernel 8.30 ms/layer, (c) pure-XLA
attention from BSHD 14.55 ms/layer. The shipped layout (a) stands; see
ROOFLINE.md §3.1.

The ViT trace (tools/traceprobe.py vit) shows ~1.5 ms/layer of `copy` ops —
the (B,S,H,D)->(B,H,S,D) q/k/v transposes into the Pallas kernel plus the
ctx transpose back. Variants measured at ViT-g serving shapes
(B=128 frames, S=264 padded, H=16, D=88):

  a) current: project -> reshape (B,S,H,D) -> transpose -> kernel (BHSD)
     -> transpose back -> out-proj
  b) bshd-kernel: project -> reshape -> kernel gridded over (B, H-groups,
     S-blocks) reading (B,S,H,D) blocks directly (batch-middle dot_general
     inside), write (B,S,H,D) -> out-proj. No XLA-level transposes.
  c) xla attention (einsum bhqd) from BSHD without explicit transposes
     (XLA chooses layouts itself) — sanity floor.

Each variant runs the FULL mini-layer (qkv proj + attn + out proj) so
fusion opportunities match production. Exactness is checked vs (a).

Usage: python tools/attnlayoutprobe.py [--frames 128] [--iters 5]
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
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=4,
                    help="stack depth so per-layer noise averages out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from videotgb_tpu.ops.attention import flash_attention

    B, S, H, D = args.frames, 264, 16, 88
    E = H * D  # 1408
    dt = jnp.bfloat16
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, S, E), dt)
    wq, wk, wv, wo = (
        jax.random.normal(jax.random.fold_in(key, i), (E, E), dt) * 0.02
        for i in range(4)
    )
    scale = D ** -0.5
    L = args.layers

    # ---------------- a) current: transpose into BHSD kernel
    def layer_a(x, wq, wk, wv, wo):
        q = (x @ wq).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        k = (x @ wk).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        v = (x @ wv).reshape(B, S, H, D).transpose(0, 2, 1, 3)
        ctx = flash_attention(q, k, v, scale=scale)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, E)
        return x + ctx @ wo

    # ---------------- b) BSHD-native kernel. Blocks carry a head-group of 8
    # (Pallas: second-to-last block dim must be divisible by 8); Mosaic has
    # no non-leading batch dot_general, so heads unroll statically inside
    # the kernel as plain 2D matmuls — same per-matmul MXU shapes as the
    # row-batched BHSD kernel, but no XLA transposes around the call.
    def _kern(q_ref, k_ref, v_ref, o_ref, *, block_kv, scale, s_kv,
              head_block):
        n_kv = s_kv // block_kv
        q_all = q_ref[0]  # (bq, hb, d) loaded once
        k_all = k_ref[0]  # (s_kv, hb, d)
        v_all = v_ref[0]
        for hh in range(head_block):
            q = q_all[:, hh, :]  # (bq, d) static slice on the value

            # probe uses whole-seq kv (block_kv == s_kv): no kv loop needed
            assert n_kv == 1
            k = k_all[:, hh, :]
            v = v_all[:, hh, :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (bq, skv)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, d)
            out = acc / jnp.maximum(l, 1e-30)
            o_ref[0, :, hh, :] = out.astype(o_ref.dtype)

    def flash_bshd(q, k, v, *, block_q=264, block_kv=264, head_block=8):
        b, s, h, d = q.shape
        grid = (b, h // head_block, s // block_q)
        return pl.pallas_call(
            functools.partial(_kern, block_kv=block_kv, scale=scale, s_kv=s,
                              head_block=head_block),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, head_block, d),
                             lambda b_, hg, sq: (b_, sq, hg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, head_block, d),
                             lambda b_, hg, sq: (b_, 0, hg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, head_block, d),
                             lambda b_, hg, sq: (b_, 0, hg, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, head_block, d),
                                   lambda b_, hg, sq: (b_, sq, hg, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, s, h, d), q.dtype),
        )(q, k, v)

    def layer_b(x, wq, wk, wv, wo):
        q = (x @ wq).reshape(B, S, H, D)
        k = (x @ wk).reshape(B, S, H, D)
        v = (x @ wv).reshape(B, S, H, D)
        ctx = flash_bshd(q, k, v).reshape(B, S, E)
        return x + ctx @ wo

    # ---------------- c) XLA einsum attention from BSHD
    def layer_c(x, wq, wk, wv, wo):
        q = (x @ wq).reshape(B, S, H, D)
        k = (x @ wk).reshape(B, S, H, D)
        v = (x @ wv).reshape(B, S, H, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return x + ctx.astype(x.dtype).reshape(B, S, E) @ wo

    def stack(layer):
        def run(x, wq, wk, wv, wo):
            for _ in range(L):
                x = layer(x, wq, wk, wv, wo)
            return jnp.sum(x.astype(jnp.float32))
        return jax.jit(run)

    fa = stack(layer_a)
    print(f"layer_a (transpose+BHSD)    "
          f"{timed(fa, x, wq, wk, wv, wo, iters=args.iters)*1000/L:8.3f}"
          " ms/layer", flush=True)

    fc = stack(layer_c)
    print(f"layer_c (XLA einsum BSHD)   "
          f"{timed(fc, x, wq, wk, wv, wo, iters=args.iters)*1000/L:8.3f}"
          " ms/layer", flush=True)

    try:
        fb = stack(layer_b)
        ra = jax.jit(lambda *a: layer_a(*a))(x, wq, wk, wv, wo)
        rb = jax.jit(lambda *a: layer_b(*a))(x, wq, wk, wv, wo)
        d_ab = float(jnp.max(jnp.abs(ra.astype(jnp.float32)
                                     - rb.astype(jnp.float32))))
        print(f"layer_b (BSHD kernel)       "
              f"{timed(fb, x, wq, wk, wv, wo, iters=args.iters)*1000/L:8.3f}"
              f" ms/layer  max_abs_vs_a={d_ab:.2e}", flush=True)
    except Exception as e:
        print(f"layer_b FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
