"""Fused Pallas TPU kernel for RAFT's correlation-pyramid lookup.

The XLA dense hat-matmul lookup (ops/correlation.py lookup_corr_pyramid_dense)
is exact but lowers to per-pixel batched matmuls of shape (9,28)x(28,28) —
~100k tiny MXU ops per GRU iteration plus forced layout copies between the two
separable steps. Profiling the flagship pipeline (tools/traceprobe.py raft)
showed this lookup at ~312 ms of RAFT's 404 ms loop at batch 128.

This kernel restructures the same math for the VPU by keeping the QUERY axis
in lanes: the correlation pyramid is stored (B, Hl*Wl, Q) with q minor, so
each separable hat contraction becomes a chain of full-width vector FMAs —
no tiny matmuls, no relayouts, everything VMEM-resident per pair:

  tmp[x, j, q] = sum_y  hat_y[y, j, q] * corr[y, x, q]      (fori over y)
  out[i, j, q] = sum_x  hat_x[x, i, q] * tmp[x, j, q]       (fori over x)

with hat(d) = max(0, 1 - |d|), which reproduces grid_sample's bilinear
zero-padding semantics exactly (reference: raft_utils/corr.py:12-60,
raft_utils/utils.py:58 bilinear_sampler). Channel order matches the
reference's quirk: k = i*(2r+1)+j where the MAJOR axis i offsets x
(corr.py:38-42); output is [level-major | i | j].

Gradients fall back to the XLA dense formulation via custom_vjp (identical
math), so training through the lookup stays exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videotgb_tpu.ops.correlation import lookup_corr_pyramid_dense


def build_corr_pyramid_t(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4
) -> list[jax.Array]:
    """Query-minor correlation pyramid: [(B, Hl*Wl, Q)] * num_levels.

    Same volume as ops.correlation.build_corr_pyramid (one MXU matmul +
    strided mean pooling, torch avg_pool2d floor semantics) but transposed so
    the lookup kernel reads queries in lanes."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bkc,bqc->bkq", f2, f1, preferred_element_type=jnp.float32)
    corr = (corr / jnp.sqrt(jnp.float32(c))).astype(fmap1.dtype)
    q = h * w
    pyramid = [corr]
    hh, ww = h, w
    for _ in range(num_levels - 1):
        if hh == 1 and ww == 1:
            # resolution exhausted (tiny test shapes): repeat the 1x1 level
            # instead of floor-halving to 0 — a 0-size block is invalid in
            # Mosaic and the reference never runs at these shapes (torch
            # avg_pool2d would floor to 0x0 too). Channel count stays static.
            pyramid.append(pyramid[-1])
            continue
        cur = pyramid[-1].reshape(b, hh, ww, q)
        ph, pw = (2 if hh >= 2 else 1), (2 if ww >= 2 else 1)
        nh, nw = max(hh // 2, 1), max(ww // 2, 1)
        cur = cur[:, :nh * ph, :nw * pw]
        cur = cur.reshape(b, nh, ph, nw, pw, q).mean(axis=(2, 4))
        hh, ww = nh, nw
        pyramid.append(cur.reshape(b, hh * ww, q).astype(fmap1.dtype))
    return pyramid


def _lookup_kernel(*refs, sizes, radius):
    """One program = one pair. refs = (*corr_levels, cx, cy, out)."""
    n_levels = len(sizes)
    corr_refs = refs[:n_levels]
    cx_ref, cy_ref, o_ref = refs[n_levels], refs[n_levels + 1], refs[n_levels + 2]
    k = 2 * radius + 1
    cx = cx_ref[0, 0]  # (Q,) f32
    cy = cy_ref[0, 0]
    q = cx.shape[0]

    off = 0
    for lvl, cref in enumerate(corr_refs):
        hl, wl = sizes[lvl]
        corr2d = cref[0]  # (hl*wl, q); rows y*wl..(y+1)*wl are scanline y
        scale = 1.0 / (2 ** lvl)

        # window-center grids (k, q): Mosaic iota is integer-only, cast after
        off_grid = (jax.lax.broadcasted_iota(jnp.int32, (k, q), 0)
                    .astype(jnp.float32) - radius)
        cyq = cy[None, :] * scale + off_grid
        cxq = cx[None, :] * scale + off_grid

        # static unroll (hl/wl are trace-time constants): Mosaic has no
        # dynamic_slice on loaded values, and constant-index slices fold;
        # scanline y is a static row slice (a sublane-splitting reshape to
        # (hl, wl, q) is an unsupported bf16 shape cast).
        # The window dim k stays MAJOR throughout: the tiled trailing dims
        # are always (wl|hl, q) — a (.., 9, q) layout would pad sublanes
        # 9 -> 16 and waste 44% of every FMA.
        tmp = jnp.zeros((k, wl, q), jnp.float32)
        for y in range(hl):
            corr_y = corr2d[y * wl:(y + 1) * wl].astype(jnp.float32)  # (wl, q)
            wy_y = jnp.maximum(0.0, 1.0 - jnp.abs(y - cyq))  # (k, q)
            # (k, 1, q) * (1, wl, q) -> (k, wl, q)
            tmp = tmp + wy_y[:, None, :] * corr_y[None, :, :]
        tmp = jnp.swapaxes(tmp, 0, 1)  # (wl, k, q): major-dim x slicing
        out = jnp.zeros((k, k, q), jnp.float32)
        for x in range(wl):
            wx_x = jnp.maximum(0.0, 1.0 - jnp.abs(x - cxq))  # (k_i, q)
            # (k_i, 1, q) * (1, k_j, q) -> (k_i, k_j, q)
            out = out + wx_x[:, None, :] * tmp[x][None, :, :]
        # write channels-minor: the (q, k*k) transpose happens in VMEM here
        # instead of as a post-kernel XLA relayout over HBM
        o_ref[0, :, off:off + k * k] = (
            out.reshape(k * k, q).T.astype(o_ref.dtype))
        off += k * k


def _lookup_pallas(pyramid_t, coords, radius, interpret=False):
    b, h, w, _ = coords.shape
    q = h * w
    k = 2 * radius + 1
    # (Hl, Wl) per level follows the build's floor-halving from (h, w)
    hw = []
    hh, ww = h, w
    for _lvl in pyramid_t:
        hw.append((hh, ww))
        hh, ww = max(hh // 2, 1), max(ww // 2, 1)
    n_levels = len(pyramid_t)
    cx = coords[..., 0].reshape(b, 1, q)
    cy = coords[..., 1].reshape(b, 1, q)

    in_specs = [
        pl.BlockSpec((1, lvl.shape[1], q), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for lvl in pyramid_t
    ] + [
        pl.BlockSpec((1, 1, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, sizes=hw, radius=radius),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q, n_levels * k * k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # output in the pyramid's dtype: the motion encoder consumes bf16 in
        # serving, so the f32->bf16 convert + extra HBM pass disappear
        out_shape=jax.ShapeDtypeStruct((b, q, n_levels * k * k),
                                       pyramid_t[0].dtype),
        compiler_params=pltpu.CompilerParams(
            # an f32 level-0 block alone is H*W*Q*4 bytes (~2.5 MB at 28^2,
            # double-buffered); the default 16 MB scoped limit is too tight
            # for large pair batches
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*pyramid_t, cx, cy)
    return out.reshape(b, h, w, n_levels * k * k)


def _dense_from_t(pyramid_t, coords, radius):
    """XLA reference path on the transposed pyramid (CPU fallback + vjp)."""
    b = coords.shape[0]
    h, w = coords.shape[1], coords.shape[2]
    std = []
    hh, ww = h, w
    for lvl in pyramid_t:
        std.append(lvl.reshape(b, hh, ww, -1).transpose(0, 3, 1, 2))
        hh, ww = max(hh // 2, 1), max(ww // 2, 1)
    return lookup_corr_pyramid_dense(std, coords, radius)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lookup_fused(pyramid_t, coords, radius):
    return _lookup_pallas(pyramid_t, coords, radius)


def _lookup_fused_fwd(pyramid_t, coords, radius):
    return _lookup_pallas(pyramid_t, coords, radius), (pyramid_t, coords)


def _lookup_fused_bwd(radius, res, g):
    pyramid_t, coords = res
    _, vjp = jax.vjp(lambda p, c: _dense_from_t(p, c, radius), pyramid_t, coords)
    return vjp(g)


_lookup_fused.defvjp(_lookup_fused_fwd, _lookup_fused_bwd)


def lookup_corr_pyramid_t(
    pyramid_t, coords: jax.Array, radius: int = 4,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Windowed bilinear lookup on a query-minor pyramid.

    coords (B, H, W, 2) pixel (x, y); returns (B, H, W, L*(2r+1)^2) f32,
    bit-matching lookup_corr_pyramid_dense's channel order. Pallas on TPU
    backends, XLA dense elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if not use_pallas:
        return _dense_from_t(tuple(pyramid_t), coords, radius)
    return _lookup_fused(tuple(pyramid_t), coords, radius)


def lookup_corr_pyramid_interpret(pyramid_t, coords, radius: int = 4):
    """Interpret-mode kernel execution for CPU tests (exact kernel math,
    no Mosaic compile)."""
    return _lookup_pallas(tuple(pyramid_t), coords, radius, interpret=True)
