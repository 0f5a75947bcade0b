"""RAFT optical flow, TPU-native (frozen feature extractor for the TGB).

Re-implements the reference's RAFT fork (reference:
src/models/components/xraft.py, raft_utils/{extractor,update,corr,utils}.py)
as NHWC flax modules:

* BasicEncoder (extractor.py:116-190): 7x7/s2 stem + 3 stages of residual
  blocks (64 -> 96 -> 128, stride 8 total) + 1x1 head; instance-norm for the
  feature net, frozen batch-norm for the context net (RAFT is frozen and
  freeze_bn()'d in every recipe — xraft.py:75-77 — so BN is an affine with
  running stats).
* Correlation pyramid + radius-4 lookup from videotgb_tpu.ops.correlation.
* BasicUpdateBlock (update.py:86-144): motion encoder, separable ConvGRU,
  flow head, and the 64*9 convex-upsampling mask; the 20 GRU iterations run
  as a lax.scan with the correlation lookup inside (xraft.py:133-153).
* Convex upsampling x8 (xraft.py:88-100) via 3x3 patch extraction + softmax
  mask.

forward(image1, image2) takes uint8/float RGB in [0, 255], NHWC, H and W
divisible by 8 (the data pipeline pads — InputPadder semantics, xraft.py:30-48)
and returns upsampled flow (B, H, W, 2).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.ops.correlation import build_corr_pyramid, lookup_corr_pyramid_dense
from videotgb_tpu.ops.correlation_pallas import (
    build_corr_pyramid_t,
    lookup_corr_pyramid_t,
)


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    fnet_dim: int = 256
    iters: int = 20
    # None = auto: the fused Pallas lookup (ops/correlation_pallas.py) on TPU
    # backends, the XLA dense hat-matmul path on CPU. Both are exact.
    fused_lookup: bool | None = None
    dtype: Any = jnp.float32  # flow quality is precision-sensitive
    param_dtype: Any = jnp.float32

    @classmethod
    def tiny(cls) -> "RAFTConfig":
        return cls(iters=2)


def _conv(features, kernel, stride=1, name=None, dtype=jnp.float32,
          param_dtype=jnp.float32):
    pad = [(k // 2, k // 2) for k in (kernel if isinstance(kernel, tuple) else (kernel, kernel))]
    k = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    return nn.Conv(features, kernel_size=k, strides=(stride, stride),
                   padding=pad, dtype=dtype, param_dtype=param_dtype, name=name)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False) over NHWC spatial dims. Statistics are
    f32 regardless of compute dtype (torch autocast keeps norms in f32).

    Single read pass: E[x] and E[x^2] reduce together in one f32 fusion —
    jnp.var's mean-then-deviations form is two sequential passes over the
    (B, H, W, C) stream (models/common.py LayerNorm carries the measured
    rationale; at 112x112x64 these are the biggest tensors in the model)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        meansq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        return ((x32 - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: y = (x - mean) / sqrt(var+eps) * scale + bias.
    Running stats are parameters filled by the checkpoint converter; the
    affine math runs in f32 and casts back to the compute dtype."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class _Norm(nn.Module):
    kind: str
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.kind == "instance":
            return InstanceNorm(name="norm")(x)
        if self.kind == "batch":
            return FrozenBatchNorm(self.features, name="norm")(x)
        return x


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.relu(_Norm(self.norm_fn, self.planes, name="norm1")(
            _conv(self.planes, 3, self.stride, name="conv1", dtype=self.dtype)(x)))
        y = nn.relu(_Norm(self.norm_fn, self.planes, name="norm2")(
            _conv(self.planes, 3, 1, name="conv2", dtype=self.dtype)(y)))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _Norm(self.norm_fn, self.planes, name="norm3")(
                nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, name="downsample")(x))
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int
    norm_fn: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x.astype(self.dtype))
        x = _Norm(self.norm_fn, 64, name="norm1")(x)
        x = nn.relu(x)
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride, dtype=self.dtype,
                              name=f"layer{i+1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, dtype=self.dtype,
                              name=f"layer{i+1}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv2")(x)


class BasicMotionEncoder(nn.Module):
    config: RAFTConfig

    @nn.compact
    def __call__(self, flow: jax.Array, corr: jax.Array) -> jax.Array:
        dt = self.config.dtype
        corr = corr.astype(dt)
        flow_c = flow.astype(dt)
        cor = nn.relu(nn.Conv(256, (1, 1), dtype=dt, name="convc1")(corr))
        cor = nn.relu(_conv(192, 3, name="convc2", dtype=dt)(cor))
        flo = nn.relu(_conv(128, 7, name="convf1", dtype=dt)(flow_c))
        flo = nn.relu(_conv(64, 3, name="convf2", dtype=dt)(flo))
        out = nn.relu(_conv(126, 3, name="conv", dtype=dt)(jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow_c], axis=-1)  # 128 channels


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        h = h.astype(self.dtype)
        x = x.astype(self.dtype)
        for suffix, kernel in (("1", (1, 5)), ("2", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(_conv(self.hidden_dim, kernel, name=f"convz{suffix}", dtype=self.dtype)(hx))
            r = nn.sigmoid(_conv(self.hidden_dim, kernel, name=f"convr{suffix}", dtype=self.dtype)(hx))
            q = jnp.tanh(_conv(self.hidden_dim, kernel, name=f"convq{suffix}", dtype=self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class BasicUpdateBlock(nn.Module):
    config: RAFTConfig

    @nn.compact
    def __call__(
        self, net: jax.Array, inp: jax.Array, corr: jax.Array, flow: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        dt = self.config.dtype
        motion = BasicMotionEncoder(self.config, name="encoder")(flow, corr)
        net = SepConvGRU(self.config.hidden_dim, dtype=dt, name="gru")(
            net, jnp.concatenate([inp.astype(dt), motion], axis=-1))
        delta = _conv(2, 3, name="flow_head_conv2", dtype=dt)(
            nn.relu(_conv(256, 3, name="flow_head_conv1", dtype=dt)(net)))
        mask = nn.Conv(64 * 9, (1, 1), dtype=dt, name="mask_conv2")(
            nn.relu(_conv(256, 3, name="mask_conv1", dtype=dt)(net)))
        return net, 0.25 * mask, delta


class _UpdateIteration(nn.Module):
    """One GRU refinement step, shaped for nn.scan: params are broadcast
    across iterations (RAFT shares update weights, xraft.py:133-153), and the
    whole loop compiles once instead of 20 unrolled copies."""

    config: RAFTConfig
    fused: bool = False

    @nn.compact
    def __call__(self, carry, _):
        dt = self.config.dtype
        net, coords1, mask, inp, coords0, pyramid = carry
        if self.fused:
            corr = lookup_corr_pyramid_t(pyramid, coords1,
                                         self.config.corr_radius)
        else:
            corr = lookup_corr_pyramid_dense(
                list(pyramid), coords1, self.config.corr_radius)
        flow = coords1 - coords0
        motion = BasicMotionEncoder(self.config, name="encoder")(flow, corr)
        net = SepConvGRU(self.config.hidden_dim, dtype=dt, name="gru")(
            net, jnp.concatenate([inp.astype(dt), motion], axis=-1))
        delta = _conv(2, 3, name="flow_head_conv2", dtype=dt)(
            nn.relu(_conv(256, 3, name="flow_head_conv1", dtype=dt)(net)))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=dt, name="mask_conv2")(
            nn.relu(_conv(256, 3, name="mask_conv1", dtype=dt)(net)))
        # flow updates accumulate in f32 regardless of the conv dtype
        return (net, coords1 + delta.astype(jnp.float32), mask, inp, coords0,
                pyramid), None


def convex_upsample(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """flow (B, H, W, 2), mask (B, H, W, 64*9) -> (B, 8H, 8W, 2)
    (xraft.py:88-100): softmax over 9 taps of 8x-scaled 3x3 flow patches."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhoods of 8*flow
    padded = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [padded[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, patches)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """Returns the final upsampled flow (B, H, W, 2), matching
    forward(..., test_mode=True) (xraft.py:102-158).

    Entry points:
      * ``__call__(image1, image2)`` — reference-shaped pairwise API;
      * ``consecutive(frames)`` — (B, L, H, W, 3) -> all L-1 consecutive-pair
        flows. The feature encoder runs ONCE over the B*L unique frames
        instead of twice per pair (consecutive pairs share every interior
        frame — 2L-2 vs L encoder images); instance norm is per-image so the
        shared-frame feature maps are bit-identical to the pairwise path.
    """

    config: RAFTConfig = RAFTConfig()

    def setup(self) -> None:
        cfg = self.config
        self.fnet = BasicEncoder(cfg.fnet_dim, "instance", dtype=cfg.dtype)
        self.cnet = BasicEncoder(cfg.hidden_dim + cfg.context_dim, "batch",
                                 dtype=cfg.dtype)
        self._fused = (cfg.fused_lookup if cfg.fused_lookup is not None
                       else jax.default_backend() not in ("cpu",))
        # 20 shared-weight GRU iterations as a single scanned program
        # (compile-time stays constant in iteration count)
        self.update_block = nn.scan(
            _UpdateIteration,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=cfg.iters,
        )(cfg, self._fused)

    @staticmethod
    def _normalize(image: jax.Array) -> jax.Array:
        return 2.0 * (image.astype(jnp.float32) / 255.0) - 1.0

    def _refine(self, fmap1: jax.Array, fmap2: jax.Array,
                image1: jax.Array) -> jax.Array:
        """Correlation pyramid + context net + scanned GRU refinement.
        ``image1`` is the already-normalized first image of each pair."""
        cfg = self.config
        if self._fused:
            pyramid = build_corr_pyramid_t(fmap1, fmap2, cfg.corr_levels)
        else:
            pyramid = build_corr_pyramid(fmap1, fmap2, cfg.corr_levels)

        cnet = self.cnet(image1)
        net = jnp.tanh(cnet[..., : cfg.hidden_dim]).astype(cfg.dtype)
        inp = nn.relu(cnet[..., cfg.hidden_dim :]).astype(cfg.dtype)

        b, h8, w8 = fmap1.shape[:3]
        gy, gx = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (b, h8, w8, 2))

        mask0 = jnp.zeros((b, h8, w8, 64 * 9), cfg.dtype)
        carry0 = (net, coords0, mask0, inp, coords0, tuple(pyramid))
        (net, coords1, mask, *_), _ = self.update_block(carry0, None)
        return convex_upsample(coords1 - coords0, mask.astype(jnp.float32))

    def __call__(self, image1: jax.Array, image2: jax.Array) -> jax.Array:
        image1 = self._normalize(image1)
        image2 = self._normalize(image2)
        # one batched pass over both images (the reference's
        # fnet([image1, image2]), xraft.py:118) — instance norm is per-image
        # so results are identical, and the conv pipeline runs once at 2x
        # batch instead of twice
        both = self.fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = jnp.split(both, 2, axis=0)
        return self._refine(fmap1, fmap2, image1)

    def consecutive(self, frames: jax.Array) -> jax.Array:
        """(B, L, H, W, 3) uint8/float RGB -> (B, L-1, H, W, 2) flows between
        consecutive frames, exactly pairwise-equal to
        ``__call__(frames[:, i], frames[:, i+1])`` stacked over i."""
        b, l = frames.shape[:2]
        imgs = self._normalize(frames)
        flat = imgs.reshape(b * l, *imgs.shape[2:])
        fmaps = self.fnet(flat).reshape(b, l, *self.fnet_out_shape(imgs))
        fmap1 = fmaps[:, :-1].reshape(b * (l - 1), *fmaps.shape[2:])
        fmap2 = fmaps[:, 1:].reshape(b * (l - 1), *fmaps.shape[2:])
        image1 = imgs[:, :-1].reshape(b * (l - 1), *imgs.shape[2:])
        flow = self._refine(fmap1, fmap2, image1)
        return flow.reshape(b, l - 1, *flow.shape[1:])

    def fnet_out_shape(self, imgs: jax.Array) -> tuple[int, int, int]:
        h, w = imgs.shape[-3] // 8, imgs.shape[-2] // 8
        return (h, w, self.config.fnet_dim)
