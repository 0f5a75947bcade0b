"""RAFT all-pairs correlation volume: build, pyramid, windowed bilinear lookup.

This is the reference's only native-code hook — the optional alt_cuda_corr
CUDA extension (reference: src/models/components/raft_utils/corr.py:5-9,63-91,
disabled by default). The default torch path builds a (B*H*W, 1, H, W)
4-level pyramid via matmul + avg_pool and looks it up with grid_sample in a
radius-4 window (corr.py:12-60, bilinear_sampler at raft_utils/utils.py:58).

TPU design (SURVEY.md section 7.3 item 2): the volume build is one big MXU
matmul; the pyramid is strided mean-pooling; the lookup decomposes into four
integer-corner gathers + lerp, which XLA lowers to efficient dynamic-gathers.
Out-of-range taps contribute zero (grid_sample zero-padding semantics).

Layout is channels-last: fmaps (B, H, W, C); coords (B, H, W, 2) as (x, y)
pixel coordinates; lookup output (B, H, W, levels*(2r+1)^2), level-major then
dy-major then dx (matching the reference's concat order so converted weights
of the motion encoder's 1x1 conv line up).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_corr_pyramid(
    fmap1: jax.Array, fmap2: jax.Array, num_levels: int = 4
) -> list[jax.Array]:
    """fmaps (B, H, W, C) -> [ (B, H*W, H/2^i, W/2^i) ] * num_levels."""
    b, h, w, c = fmap1.shape
    # operands keep their compute dtype (bf16 halves the MXU cost of the
    # (HW)^2 volume); accumulation is f32 via preferred_element_type
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bqc,bkc->bqk", f1, f2, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b, h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        c_ = pyramid[-1]
        bh, q, hh, ww = c_.shape
        if hh == 1 and ww == 1:
            # resolution exhausted (tiny test shapes): repeat the 1x1 level —
            # floor-halving to 0x0 breaks downstream kernels and the
            # reference never runs here (torch avg_pool2d floors to 0 too)
            pyramid.append(c_)
            continue
        # torch avg_pool2d(2, 2) floors odd dims: crop the trailing row/col
        ph, pw = (2 if hh >= 2 else 1), (2 if ww >= 2 else 1)
        nh, nw = max(hh // 2, 1), max(ww // 2, 1)
        c_ = c_[:, :, :nh * ph, :nw * pw]
        c_ = c_.reshape(bh, q, nh, ph, nw, pw).mean(axis=(3, 5))
        pyramid.append(c_)
    return pyramid


def _bilinear_lookup_level(
    corr: jax.Array, cx: jax.Array, cy: jax.Array
) -> jax.Array:
    """corr (B, Q, Hl, Wl); cx/cy (B, Q, K) float pixel coords.
    Returns (B, Q, K) bilinear samples with zero padding outside."""
    b, q, hl, wl = corr.shape
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    tx = cx - x0
    ty = cy - y0

    def tap(xi: jax.Array, yi: jax.Array) -> jax.Array:
        valid = (xi >= 0) & (xi <= wl - 1) & (yi >= 0) & (yi <= hl - 1)
        xi_c = jnp.clip(xi, 0, wl - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, hl - 1).astype(jnp.int32)
        flat = corr.reshape(b, q, hl * wl)
        idx = yi_c * wl + xi_c
        vals = jnp.take_along_axis(flat, idx, axis=-1)
        return jnp.where(valid, vals, 0.0)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)
    return (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )


def lookup_corr_pyramid_dense(
    pyramid: list[jax.Array], coords: jax.Array, radius: int = 4
) -> jax.Array:
    """MXU-native lookup: the bilinear window sample decomposed into two
    dense hat-weight matmuls per level — zero gathers.

    bilinear-with-zero-padding is separable:
      out[q, i, j] = sum_{y,x} hat(x - px[q,i]) * hat(y - py[q,j]) * corr[q,y,x]
    with hat(d) = max(0, 1 - |d|) vanishing outside [-1, 1], which reproduces
    grid_sample's zero padding exactly. The weights are computed from iota
    comparisons (dense (Q, 9, W) / (Q, 9, H)) and contracted on the MXU —
    ~200 MFLOP per level vs. thousands of serialized TPU gathers for the
    take_along_axis formulation (the reference's only-native-op hot spot,
    SURVEY.md section 2.6).

    Tap ordering matches the reference exactly: flattened k = i*(2r+1)+j with
    the major axis i offsetting x (corr.py:38-42 quirk, see lookup_corr_pyramid).
    """
    b, h, w, _ = coords.shape
    q = h * w
    r = radius
    k = 2 * r + 1
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)  # (k,)
    cx = coords[..., 0].reshape(b, q)
    cy = coords[..., 1].reshape(b, q)

    outs = []
    for i, corr in enumerate(pyramid):
        scale = 1.0 / (2 ** i)
        hl, wl = corr.shape[2], corr.shape[3]
        px = cx[:, :, None] * scale + offs[None, None, :]  # (B, Q, k)
        py = cy[:, :, None] * scale + offs[None, None, :]
        xs = jnp.arange(wl, dtype=jnp.float32)
        ys = jnp.arange(hl, dtype=jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[None, None, None, :] - px[..., None]))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, None, None, :] - py[..., None]))
        # corr (B,Q,H,W) x wx (B,Q,k,W) -> (B,Q,H,k) ; then wy -> (B,Q,k,k)
        tmp = jnp.einsum("bqhw,bqiw->bqhi", corr, wx,
                         preferred_element_type=jnp.float32)
        lvl = jnp.einsum("bqjh,bqhi->bqij", wy, tmp,
                         preferred_element_type=jnp.float32)
        outs.append(lvl.reshape(b, q, k * k))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(b, h, w, out.shape[-1])


def lookup_corr_pyramid(
    pyramid: list[jax.Array], coords: jax.Array, radius: int = 4
) -> jax.Array:
    """coords (B, H, W, 2) as (x, y); returns (B, H, W, L*(2r+1)^2)."""
    b, h, w, _ = coords.shape
    q = h * w
    r = radius
    # Window offset order matches the reference exactly (corr.py:38-42):
    # delta = stack(meshgrid(dy, dx))[..., (dy, dx)] is added to (x, y)-ordered
    # coords, so the flattened window's MAJOR axis offsets x and the minor
    # axis offsets y. Weight parity of the motion encoder's 1x1 conv depends
    # on this channel ordering.
    major, minor = jnp.meshgrid(
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        jnp.arange(-r, r + 1, dtype=jnp.float32),
        indexing="ij",
    )
    dx = major.reshape(-1)  # added to x (reference quirk)
    dy = minor.reshape(-1)  # added to y

    cx = coords[..., 0].reshape(b, q, 1)
    cy = coords[..., 1].reshape(b, q, 1)
    outs = []
    for i, corr in enumerate(pyramid):
        scale = 1.0 / (2 ** i)
        px = cx * scale + dx[None, None, :]
        py = cy * scale + dy[None, None, :]
        outs.append(_bilinear_lookup_level(corr, px, py))
    out = jnp.concatenate(outs, axis=-1)  # (B, Q, L*K)
    return out.reshape(b, h, w, out.shape[-1])


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """General grid_sample(align_corners=True, zeros padding) for NHWC images.

    img (B, H, W, C); coords (B, Ho, Wo, 2) pixel (x, y) -> (B, Ho, Wo, C).
    """
    b, h, w, c = img.shape
    _, ho, wo, _ = coords.shape
    cx = coords[..., 0].reshape(b, ho * wo)
    cy = coords[..., 1].reshape(b, ho * wo)
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    tx = (cx - x0)[..., None]
    ty = (cy - y0)[..., None]

    flat = img.reshape(b, h * w, c)

    def tap(xi, yi):
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))[..., None]
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = (yi_c * w + xi_c)[..., None]
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return jnp.where(valid, vals, 0.0)

    out = (
        tap(x0, y0) * (1 - tx) * (1 - ty)
        + tap(x0 + 1, y0) * tx * (1 - ty)
        + tap(x0, y0 + 1) * (1 - tx) * ty
        + tap(x0 + 1, y0 + 1) * tx * ty
    )
    return out.reshape(b, ho, wo, c)
