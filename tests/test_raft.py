"""RAFT + correlation op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.models.raft import RAFT, RAFTConfig, convex_upsample
from videotgb_tpu.ops.correlation import (
    bilinear_sample,
    build_corr_pyramid,
    lookup_corr_pyramid,
)


def _np_bilinear(img, x, y):
    """zero-padding bilinear sample of img (H, W) at float (x, y)."""
    h, w = img.shape
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    tx, ty = x - x0, y - y0
    def tap(xi, yi):
        if 0 <= xi <= w - 1 and 0 <= yi <= h - 1:
            return img[yi, xi]
        return 0.0
    return (tap(x0, y0) * (1 - tx) * (1 - ty) + tap(x0 + 1, y0) * tx * (1 - ty)
            + tap(x0, y0 + 1) * (1 - tx) * ty + tap(x0 + 1, y0 + 1) * tx * ty)


def test_bilinear_sample_matches_numpy(rng):
    img = rng.standard_normal((1, 5, 6, 1)).astype(np.float32)
    pts = [(0.0, 0.0), (2.3, 1.7), (5.0, 4.0), (5.6, 4.5), (-0.4, 2.0)]
    coords = jnp.asarray(np.array(pts).reshape(1, 1, len(pts), 2))
    out = bilinear_sample(jnp.asarray(img), coords)
    for i, (x, y) in enumerate(pts):
        expected = _np_bilinear(img[0, :, :, 0], x, y)
        assert float(out[0, 0, i, 0]) == pytest.approx(expected, abs=1e-5), (x, y)


def test_corr_pyramid_shapes_and_values(rng):
    b, h, w, c = 2, 8, 8, 16
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, num_levels=3)
    assert [p.shape for p in pyr] == [(b, 64, 8, 8), (b, 64, 4, 4), (b, 64, 2, 2)]
    # spot-check: corr[b, q, i, j] = <f1[q], f2[i,j]> / sqrt(c)
    q = 3 * w + 5
    expected = float(np.dot(np.asarray(f1)[1, 3, 5], np.asarray(f2)[1, 2, 6]) / np.sqrt(c))
    assert float(pyr[0][1, q, 2, 6]) == pytest.approx(expected, rel=1e-5)
    # level-1 is 2x2 mean pool over last two dims
    manual = np.asarray(pyr[0]).reshape(b, 64, 4, 2, 4, 2).mean((3, 5))
    np.testing.assert_allclose(np.asarray(pyr[1]), manual, rtol=1e-5)


def test_lookup_identity_coords_center_tap(rng):
    b, h, w, c = 1, 8, 8, 4
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, num_levels=2)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([gx, gy], -1)[None]
    out = lookup_corr_pyramid(pyr, coords, radius=1)
    assert out.shape == (b, h, w, 2 * 9)
    # center tap of level 0 window (dy=0, dx=0 -> index 4) equals corr at the
    # query's own position
    q = 2 * w + 3
    assert float(out[0, 2, 3, 4]) == pytest.approx(float(pyr[0][0, q, 2, 3]), rel=1e-5)


def test_fused_lookup_kernel_matches_dense(rng):
    """The Pallas q-minor lookup (interpret mode on CPU) must reproduce the
    XLA dense hat-matmul path bit-for-bit in channel order and to float
    tolerance in value (it is the TPU serving path inside the GRU scan)."""
    from videotgb_tpu.ops.correlation import lookup_corr_pyramid_dense
    from videotgb_tpu.ops.correlation_pallas import (
        build_corr_pyramid_t,
        lookup_corr_pyramid_interpret,
        lookup_corr_pyramid_t,
    )

    b, h, w, c = 2, 8, 8, 16
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, num_levels=3)
    pyr_t = build_corr_pyramid_t(f1, f2, num_levels=3)
    # transposed build == standard build
    for lvl, (a, bt) in enumerate(zip(pyr, pyr_t)):
        hl, wl = a.shape[2], a.shape[3]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bt).reshape(b, hl, wl, h * w)
            .transpose(0, 3, 1, 2), rtol=1e-5, atol=1e-5, err_msg=f"lvl{lvl}")

    coords = jnp.asarray(
        rng.uniform(-2, 9, (b, h, w, 2)).astype(np.float32))
    dense = lookup_corr_pyramid_dense(pyr, coords, radius=2)
    fused = lookup_corr_pyramid_interpret(pyr_t, coords, radius=2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)
    # the auto dispatcher's CPU fallback agrees too
    auto = lookup_corr_pyramid_t(pyr_t, coords, radius=2)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)


def test_corr_pyramid_degenerate_small_maps_clamp_at_1x1(rng):
    """At tiny feature maps (h=w=4, num_levels=4) floor-halving used to
    produce a 0-size level, which Mosaic rejects outright ('vector types
    must have positive constant sizes') — hit by BENCH_PRESET=tiny on a real
    TPU. Levels must clamp at 1x1 (repeating the last valid level) in BOTH
    builds, and the kernel math must still match the dense path."""
    from videotgb_tpu.ops.correlation import lookup_corr_pyramid_dense
    from videotgb_tpu.ops.correlation_pallas import (
        build_corr_pyramid_t,
        lookup_corr_pyramid_interpret,
    )

    b, h, w, c = 2, 4, 4, 8
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, num_levels=4)
    pyr_t = build_corr_pyramid_t(f1, f2, num_levels=4)
    assert [p.shape[2:] for p in pyr] == [(4, 4), (2, 2), (1, 1), (1, 1)]
    assert [p.shape[1] for p in pyr_t] == [16, 4, 1, 1]
    for lvl, (a, bt) in enumerate(zip(pyr, pyr_t)):
        hl, wl = a.shape[2], a.shape[3]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bt).reshape(b, hl, wl, h * w)
            .transpose(0, 3, 1, 2), rtol=1e-5, atol=1e-5, err_msg=f"lvl{lvl}")

    coords = jnp.asarray(rng.uniform(-1, 5, (b, h, w, 2)).astype(np.float32))
    dense = lookup_corr_pyramid_dense(pyr, coords, radius=2)
    fused = lookup_corr_pyramid_interpret(pyr_t, coords, radius=2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                               rtol=1e-4, atol=1e-4)


def test_raft_fused_lookup_end_to_end_matches_dense(rng):
    """Full RAFT forward with fused_lookup=True (interpretable CPU kernel not
    used here — the t-layout + dense fallback) equals the standard path."""
    import dataclasses

    cfg = RAFTConfig.tiny()
    img1 = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    img2 = jnp.asarray(jnp.roll(img1, 3, axis=2))
    model_a = RAFT(dataclasses.replace(cfg, fused_lookup=False))
    model_b = RAFT(dataclasses.replace(cfg, fused_lookup=True))
    params = model_a.init(jax.random.key(0), img1, img2)
    fa = np.asarray(model_a.apply(params, img1, img2))
    fb = np.asarray(model_b.apply(params, img1, img2))
    np.testing.assert_allclose(fb, fa, rtol=1e-4, atol=1e-4)


def test_convex_upsample_constant_flow():
    # constant flow + any mask -> upsampled flow = 8 * constant everywhere
    b, h, w = 1, 3, 4
    flow = jnp.ones((b, h, w, 2)) * jnp.array([0.5, -0.25])
    mask = jnp.asarray(np.random.default_rng(0).standard_normal((b, h, w, 64 * 9)),
                       jnp.float32)
    up = convex_upsample(flow, mask)
    assert up.shape == (b, 8 * h, 8 * w, 2)
    # interior pixels: every 3x3 patch of a constant field is constant
    interior = np.asarray(up[:, 8:-8, 8:-8])
    np.testing.assert_allclose(interior[..., 0], 8 * 0.5, rtol=1e-4)
    np.testing.assert_allclose(interior[..., 1], 8 * -0.25, rtol=1e-4)


def test_raft_forward_shapes_and_finite(rng):
    cfg = RAFTConfig.tiny()
    model = RAFT(cfg)
    img1 = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    img2 = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.key(0), img1, img2)
    flow = model.apply(params, img1, img2)
    assert flow.shape == (1, 64, 64, 2)
    assert bool(jnp.all(jnp.isfinite(flow)))


def test_raft_zero_motion_small_flow(rng):
    # identical frames should give near-zero flow even with random params
    cfg = RAFTConfig.tiny()
    model = RAFT(cfg)
    img = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.key(0), img, img)
    flow = model.apply(params, img, img)
    shifted = model.apply(
        params, img, jnp.roll(img, 4, axis=2))
    # same-image flow magnitude should not explode; this is a sanity bound,
    # not an accuracy claim (random weights)
    assert float(jnp.mean(jnp.abs(flow))) < float(jnp.mean(jnp.abs(shifted))) + 50.0


def test_raft_bf16_close_to_f32(rng):
    """Serving runs RAFT convs in bf16 (reference Lightning precision=bf16);
    flow must stay close to the f32 reference on the same weights."""
    import dataclasses

    cfg = RAFTConfig(iters=6)
    model32 = RAFT(cfg)
    model16 = RAFT(dataclasses.replace(cfg, dtype=jnp.bfloat16))
    img1 = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)), jnp.float32)
    img2 = jnp.asarray(jnp.roll(img1, 3, axis=2))
    params = model32.init(jax.random.key(0), img1, img2)
    f32 = np.asarray(model32.apply(params, img1, img2))
    f16 = np.asarray(model16.apply(params, img1, img2))
    scale = np.abs(f32).mean() + 1e-3
    rel = np.abs(f16 - f32).mean() / scale
    assert rel < 0.15, rel


def test_raft_consecutive_matches_pairwise(rng):
    """consecutive() dedups the feature encoder over shared frames; it must
    be exactly the stacked pairwise __call__ result (instance norm is
    per-image, so sharing fnet outputs changes nothing)."""
    cfg = RAFTConfig.tiny()
    model = RAFT(cfg)
    frames = jnp.asarray(rng.integers(0, 255, (2, 4, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.key(0), frames[:, 0], frames[:, 1])
    fast = np.asarray(model.apply(params, frames, method=model.consecutive))
    assert fast.shape == (2, 3, 64, 64, 2)
    for i in range(3):
        ref = np.asarray(model.apply(params, frames[:, i], frames[:, i + 1]))
        np.testing.assert_allclose(fast[:, i], ref, atol=1e-5)
