"""ROOFLINE §3 item-5 adjudication probe: RAFT correlation-lookup variants.

The shipped Pallas kernel (ops/correlation_pallas.py) iterates every pyramid
scanline with dense hat weights — at level 0 only ~(2r+2) of hl=28 scanlines
carry nonzero weight per query, so up to ~3x of the pass-1 FMAs are zeros.
Per-lane row gathers (the true 2-tap bilinear) are not a TPU thing, but the
queries are THEMSELVES scanline-ordered: a q-block of 4 consecutive query
scanlines needs only [min(cy)-r-1, max(cy)+r+1] corr scanlines, and for
RAFT's bounded per-iteration flow updates that window is far smaller than
hl. Variants measured at bench shapes (pairs x 28x28 fmap, r=4, 4 levels):

  base      the shipped kernel (grid = pairs)
  qblock    same math, q split into 7 blocks of 112 lanes (4 scanlines)
  qskip     qblock + per-scanline @pl.when skip when the whole (k, qb) hat
            weight block is zero (dynamic row windowing)

All variants are checked exact vs the XLA dense oracle. Coords distributions
probed: "raft" (grid + N(0,2) flow — the steady-state GRU regime) and
"wild" (uniform random over the map — worst case for skipping).

Usage: python tools/lookupprobe.py [--pairs 256] [--hw 28] [--iters 5]
"""

from __future__ import annotations

import argparse
import functools
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


def _blocked_kernel(*refs, sizes, radius, qb, skip):
    """q-blocked lookup: one program = (pair, q-block). corr level blocks are
    full scanmaps; cx/cy/out blocks are the q-slice. The last ref is a
    (k, max_wl, qb) f32 VMEM scratch accumulator for the skip variant."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n_levels = len(sizes)
    corr_refs = refs[:n_levels]
    cx_ref, cy_ref, o_ref, acc_ref = (
        refs[n_levels], refs[n_levels + 1], refs[n_levels + 2],
        refs[n_levels + 3])
    k = 2 * radius + 1
    cx = cx_ref[0, 0]  # (qb,)
    cy = cy_ref[0, 0]

    off = 0
    for lvl, cref in enumerate(corr_refs):
        hl, wl = sizes[lvl]
        scale = 1.0 / (2 ** lvl)
        off_grid = (jax.lax.broadcasted_iota(jnp.int32, (k, qb), 0)
                    .astype(jnp.float32) - radius)
        cyq = cy[None, :] * scale + off_grid
        cxq = cx[None, :] * scale + off_grid
        corr2d = cref[0]

        if skip and hl >= 8:
            # statically-unrolled scanlines, each FMA predicated on its hat
            # weights being nonzero anywhere in the q-block (pl.when) —
            # skipped rows cost a reduce + branch, not (k, wl, qb) FMAs.
            # Accumulate in a VMEM scratch (values can't carry across
            # pl.when).
            acc_ref[:, :wl, :] = jnp.zeros((k, wl, qb), jnp.float32)
            for y in range(hl):
                wy_y = jnp.maximum(0.0, 1.0 - jnp.abs(y - cyq))
                needed = jnp.max(wy_y) > 0.0

                @pl.when(needed)
                def _(y=y, wy_y=wy_y):
                    corr_y = corr2d[y * wl:(y + 1) * wl].astype(jnp.float32)
                    acc_ref[:, :wl, :] += wy_y[:, None, :] * corr_y[None, :, :]

            tmp = acc_ref[:, :wl, :]
        else:
            tmp = jnp.zeros((k, wl, qb), jnp.float32)
            for y in range(hl):
                corr_y = corr2d[y * wl:(y + 1) * wl].astype(jnp.float32)
                wy_y = jnp.maximum(0.0, 1.0 - jnp.abs(y - cyq))
                tmp = tmp + wy_y[:, None, :] * corr_y[None, :, :]
        tmp = jnp.swapaxes(tmp, 0, 1)
        out = jnp.zeros((k, k, qb), jnp.float32)
        for x in range(wl):
            wx_x = jnp.maximum(0.0, 1.0 - jnp.abs(x - cxq))
            out = out + wx_x[:, None, :] * tmp[x][None, :, :]
        o_ref[0, :, off:off + k * k] = (
            out.reshape(k * k, qb).T.astype(o_ref.dtype))
        off += k * k


def blocked_lookup(pyramid_t, coords, radius=4, qb=128, skip=False,
                   interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = coords.shape
    q = h * w
    # Mosaic lane blocks must be 128-divisible: pad the query axis. Padded
    # lanes replicate the last real query (edge pad) so the skip variant's
    # dynamic [lo, hi) row window is not widened by zeros.
    qp = ((q + qb - 1) // qb) * qb
    nqb = qp // qb
    k = 2 * radius + 1
    hw = []
    hh, ww = h, w
    for _lvl in pyramid_t:
        hw.append((hh, ww))
        hh, ww = max(hh // 2, 1), max(ww // 2, 1)
    n_levels = len(pyramid_t)
    if qp != q:
        pyramid_t = tuple(
            jnp.pad(lvl, ((0, 0), (0, 0), (0, qp - q)), mode="edge")
            for lvl in pyramid_t)
    cx = coords[..., 0].reshape(b, 1, q)
    cy = coords[..., 1].reshape(b, 1, q)
    if qp != q:
        cx = jnp.pad(cx, ((0, 0), (0, 0), (0, qp - q)), mode="edge")
        cy = jnp.pad(cy, ((0, 0), (0, 0), (0, qp - q)), mode="edge")

    in_specs = [
        pl.BlockSpec((1, lvl.shape[1], qb), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM)
        for lvl in pyramid_t
    ] + [
        pl.BlockSpec((1, 1, qb), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, qb), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(_blocked_kernel, sizes=hw, radius=radius, qb=qb,
                          skip=skip),
        grid=(b, nqb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, qb, n_levels * k * k),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp, n_levels * k * k),
                                       pyramid_t[0].dtype),
        scratch_shapes=[pltpu.VMEM((k, max(s[1] for s in hw), qb),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*pyramid_t, cx, cy)
    return out[:, :q].reshape(b, h, w, n_levels * k * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=256)
    ap.add_argument("--hw", type=int, default=28)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--qb", type=int, default=128)
    ap.add_argument("--loop", type=int, default=20,
                    help="chained lookups per timed fetch (GRU iterations)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from videotgb_tpu.ops.correlation_pallas import (
        build_corr_pyramid_t, lookup_corr_pyramid_t, _dense_from_t)

    b, hw = args.pairs, args.hw
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((b, hw, hw, 256)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((b, hw, hw, 256)), jnp.bfloat16)
    pyr = jax.jit(lambda a, c: tuple(build_corr_pyramid_t(a, c)))(f1, f2)
    pyr = jax.tree.map(jax.block_until_ready, pyr)

    gy, gx = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    base = np.stack([gx, gy], -1)[None].astype(np.float32)

    coord_sets = {
        "raft": jnp.asarray(
            base + rng.normal(0, 2.0, (b, hw, hw, 2)).astype(np.float32)),
        "wild": jnp.asarray(
            rng.uniform(0, hw - 1, (b, hw, hw, 2)).astype(np.float32)),
    }

    oracle = jax.jit(lambda p, c: _dense_from_t(p, c, 4))

    # the real pipeline runs the lookup once per GRU iteration (20x) inside
    # one scan with evolving coords; a single timed call is fetch-dominated
    # (~25 ms tunnel). Chain --loop lookups with coord drift so XLA can't
    # CSE them, fetch once.
    n_loop = args.loop

    def chained(lookup_fn):
        def run(p, c):
            def body(i, carry):
                c_i, acc = carry
                out = lookup_fn(p, c_i)
                return (c_i + 0.13, acc + jnp.sum(out.astype(jnp.float32)))
            _, acc = jax.lax.fori_loop(0, n_loop, body, (c, jnp.float32(0)))
            return acc
        return jax.jit(run)

    for cname, coords in coord_sets.items():
        print(f"--- coords = {cname} (x{n_loop} chained lookups)")
        fns = {
            "base": chained(lambda p, c: lookup_corr_pyramid_t(p, c)),
            "qblock": chained(
                lambda p, c: blocked_lookup(p, c, qb=args.qb)),
            "qskip": chained(
                lambda p, c: blocked_lookup(p, c, qb=args.qb, skip=True)),
        }
        raw = {
            "base": jax.jit(lambda p, c: lookup_corr_pyramid_t(p, c)),
            "qblock": jax.jit(lambda p, c: blocked_lookup(p, c, qb=args.qb)),
            "qskip": jax.jit(
                lambda p, c: blocked_lookup(p, c, qb=args.qb, skip=True)),
        }
        pyr2 = jax.tree.map(lambda x: x[:2], pyr)
        ref = np.asarray(oracle(pyr2, coords[:2]).astype(jnp.float32))
        for name, fn in fns.items():
            try:
                got = np.asarray(raw[name](pyr2, coords[:2])
                                 .astype(jnp.float32))
                err = float(np.max(np.abs(got - ref)))
                sec = timed(lambda c, fn=fn: fn(pyr, c), coords,
                            iters=args.iters)
                report(name, sec, {"max_abs_err": f"{err:.2e}"})
            except Exception as e:
                report(name, 0.0, {"FAILED": type(e).__name__})
                print(f"  {e}", flush=True)


if __name__ == "__main__":
    main()
