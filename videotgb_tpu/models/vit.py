"""BLIP-2's frozen EVA ViT-g vision tower, TPU-native.

Functional equivalent of the reference's HF fork Blip2VisionModel
(reference: src/models/components/xblip2.py:89-563): conv patch embedding
(14x14/s14 on 224 -> 256 patches) + learned CLS token + learned position
embeddings, 39 pre-LN transformer layers (hidden 1408, 16 heads, MLP 6144,
gelu), final post-layernorm. The tower is frozen in every recipe
(LSTP_SF_blip2_module.py:664-668), so it runs in bf16 inference mode and the
batch dimension (B*nframe frames) is the only sharded axis; attention uses the
Pallas flash kernel (257 tokens/frame).

InstructBLIP's vision tower is identical modulo weights
(xinstructblip.py Blip2VisionModel equivalent), so both backbones share this.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.models.common import (
    LayerNorm,
    Mlp,
    MultiHeadAttention,
    default_kernel_init,
)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1408
    num_layers: int = 39
    num_heads: int = 16
    intermediate_size: int = 6144
    layer_norm_eps: float = 1e-6
    # "gelu" = HF-exact erf (parity default). Production bf16 serving uses
    # "gelu_new" (tanh approx): the approximation error (<=3e-4) is below
    # bf16 rounding (ulp(1)=3.9e-3) yet erf costs ~12% of the whole tower
    # on v5e (measured 68 ms of 556 ms at batch 128).
    act: str = "gelu"
    # nn.scan over layers: one compiled layer body instead of num_layers
    # unrolled copies (compile time/HLO size ~1/depth); params gain a
    # leading "layers" axis (training.convert stacks checkpoints to match)
    scan_layers: bool = False
    # "int8": serving-only W8A8 dynamic quantization of the qkv/o/MLP
    # matmuls (ops.quant) — ~2x MXU rate on v5e; attention score/value
    # einsums stay bf16 (flash kernel). The tower is frozen in every recipe,
    # so there is no training interaction.
    quant: Any = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(image_size=56, patch_size=14, hidden_size=64, num_layers=2,
                   num_heads=4, intermediate_size=128)


class ViTEmbeddings(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values (B, H, W, 3) -> (B, 1+P, hidden)."""
        cfg = self.config
        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=True,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                default_kernel_init, (None, None, "conv_in", "embed")
            ),
            name="patch_embed",
        )(pixel_values)
        b = patches.shape[0]
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "cls_token",
            nn.with_partitioning(default_kernel_init, (None, None, "embed")),
            (1, 1, cfg.hidden_size),
            cfg.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.hidden_size)), patches],
            axis=1,
        )
        pos = self.param(
            "position_embedding",
            nn.with_partitioning(default_kernel_init, (None, "seq", "embed")),
            (1, cfg.seq_len, cfg.hidden_size),
            cfg.param_dtype,
        )
        return x + pos.astype(cfg.dtype)


class ViTLayer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array,
                 bias: jax.Array | None = None) -> jax.Array:
        cfg = self.config
        h = LayerNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype, name="ln1")(x)
        attn, _ = MultiHeadAttention(
            num_heads=cfg.num_heads,
            head_dim=cfg.hidden_size // cfg.num_heads,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            bias_grad=False,  # pad-token mask only
            quant=cfg.quant,
            name="attn",
        )(h, bias=bias)
        x = x + attn
        h = LayerNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype, name="ln2")(x)
        x = x + Mlp(
            cfg.intermediate_size, act=cfg.act, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, quant=cfg.quant, name="mlp",
        )(h)
        return x


class _ScanViTLayer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, carry, _):
        x, bias = carry
        return (ViTLayer(self.config, name="layer")(x, bias), bias), None


class ViTModel(nn.Module):
    """Returns last_hidden_state (B, 257, hidden) after post-layernorm.

    The token axis is padded ONCE to a multiple of 8 after the embeddings
    (257 -> 264 for 224px/14) with the pad keys masked by an additive bias.
    Without this, every layer's flash-attention call re-pads q/k/v and the
    (S=257)-shaped tensors force unaligned relayouts — measured at ~11% of
    the whole tower's runtime on v5e. Real-token outputs are bit-identical:
    the per-layer flash path applied exactly this pad+mask internally.
    """

    config: ViTConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        x = ViTEmbeddings(cfg, name="embeddings")(pixel_values.astype(cfg.dtype))
        seq = x.shape[1]
        pad = (-seq) % 8
        bias = None
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            bias = jnp.where(jnp.arange(seq + pad) < seq, 0.0, -1e30)
            bias = bias.astype(jnp.float32)[None, None, None, :]
        if cfg.scan_layers:
            scan = nn.scan(
                _ScanViTLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _), _ = scan(cfg, name="layers")((x, bias), None)
        else:
            for i in range(cfg.num_layers):
                x = ViTLayer(cfg, name=f"layer_{i}")(x, bias)
        if pad:
            x = x[:, :seq]
        return LayerNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype,
                         name="post_layernorm")(x)
