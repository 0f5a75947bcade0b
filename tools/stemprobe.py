"""ROOFLINE §3 item-6 adjudication probe: RAFT encoder 7x7/s2 stem variants.

The direct NHWC 7x7/s2 conv (C_in=3) runs at ~4.6 TF/s effective — 3% of the
matmul ceiling — because the tiny input channel count starves the MXU
contraction. raftencprobe already rejected space-to-depth (33.4 vs 26.4 ms).
Remaining candidate: EXPLICIT im2col — materialize the (B, 112, 112, 7*7*3)
patch tensor with 49 static strided slices (pure layout work XLA can fuse),
then one big (B*112*112, 147) x (147, 64) matmul. HBM cost of the patch
tensor at fnet batch 512 is ~1.9 GB bf16 ≈ 5 ms of bandwidth; the matmul is
<1 ms — if the slicing lowers to bandwidth-rate copies this wins ~3-4x.

Variants:
  direct      lax.conv 7x7/s2 (shipped)
  im2col      manual 49-slice patches + reshape + dot
  patches49   lax.conv_general_dilated_patches + dot (XLA's own im2col)

Exactness vs direct is asserted (same math, f32 accumulate in the dot).

Usage: python tools/stemprobe.py [--batch 512] [--res 224]
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np


def timed(fn, *args, iters=5):
    _ = float(fn(*args))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def report(name, sec, extra=None):
    line = f"{name:24s} {sec*1000:9.2f} ms"
    if extra:
        line += "  " + " ".join(f"{k}={v}" for k, v in extra.items())
    print(line, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    dt = jnp.bfloat16

    b, res = args.batch, args.res
    ho = res // 2
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((b, res, res, 3)), dt)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal((64,)) * 0.05, dt)

    def direct(a):
        out = jax.lax.conv_general_dilated(
            a, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (out + bias.astype(jnp.float32)).astype(dt)

    wmat = w.reshape(147, 64)

    def im2col(a):
        bb = a.shape[0]
        ap_ = jnp.pad(a, ((0, 0), (3, 3), (3, 3), (0, 0)))
        # 49 static strided slices; each is (B, 112, 112, 3)
        cols = [
            jax.lax.slice(ap_, (0, dy, dx, 0),
                          (bb, dy + res, dx + res, 3), (1, 2, 2, 1))
            for dy in range(7) for dx in range(7)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (B, 112, 112, 147)
        out = jnp.dot(patches.reshape(-1, 147), wmat,
                      preferred_element_type=jnp.float32)
        return (out.reshape(bb, ho, ho, 64)
                + bias.astype(jnp.float32)).astype(dt)

    def patches49(a):
        p = jax.lax.conv_general_dilated_patches(
            a, (7, 7), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # patches come out channel-major (C, KH, KW) flattened: reorder the
        # weight instead of the big tensor
        wp = w.transpose(2, 0, 1, 3).reshape(147, 64)
        out = jnp.dot(p.reshape(-1, 147), wp,
                      preferred_element_type=jnp.float32)
        return (out.reshape(a.shape[0], ho, ho, 64)
                + bias.astype(jnp.float32)).astype(dt)

    fns = {"direct": direct, "im2col": im2col, "patches49": patches49}
    ref = None
    for name, f in fns.items():
        jf = jax.jit(lambda a, f=f: jnp.sum(f(a).astype(jnp.float32)))
        raw = jax.jit(f)
        try:
            got = np.asarray(raw(img[:2]).astype(jnp.float32))
            if ref is None:
                ref = got
            err = float(np.max(np.abs(got - ref)))
            sec = timed(lambda a, jf=jf: jf(a), img, iters=args.iters)
            gb = (b * ho * ho * 147 * 2 * 2) / 1e9
            report(name, sec, {"max_abs_err": f"{err:.2e}",
                               "tfs": f"{b*ho*ho*147*64*2/sec/1e12:.1f}"})
        except Exception as e:
            report(name, 0.0, {"FAILED": type(e).__name__})
            print(f"  {e}", flush=True)


if __name__ == "__main__":
    main()
