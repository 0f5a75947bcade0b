"""Temporal Grounding Bridge (TGB): RoPE-BERT span predictor over optical flow.

The centerpiece of VideoTGB (reference: src/models/components/xropebert.py).
A 12-layer BERT-base-initialized encoder that reads one 768-d token per flow
frame and predicts a (start, end) span over the frames, conditioned on the
question text via cross-attention:

* ``TemporalOFEmbedding`` (xropebert.py:66-129): each frame's 2-channel flow
  field is patch-embedded with a 16x16/s16 conv to (196, 768) and collapsed to
  a single 768-d token by a learned Linear(196 -> 1); learned BOS/EOS tokens
  wrap the sequence (EOS scattered at the true length), plus learned
  frame-position embeddings, LN, dropout.
* Self-attention applies interleaved RoPE to Q and K over the *frame axis*
  (xropebert.py:334-360) — this is the temporal-extrapolation mechanism: the
  flow sequence may exceed training length at inference.
* Layers >= ``fusion_layer`` (=6) add cross-attention into the question-token
  embeddings, with RoPE applied separately to Q (frame positions) and K (text
  positions) (xropebert.py:270-274). ``mode`` selects the layer range:
  text/vision = [0, 6), fusion = [6, 12), multi_modal = [0, 12)
  (xropebert.py:621-634).
* The MRC head Linear(768, 2) over tokens [1:-1] (BOS/EOS stripped) yields
  per-frame start/end logits (xropebert.py:953, 1164).

Flow enters channels-last (B, L, H, W, 2) — TPU conv layout.
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
    dense,
    embed,
)
from videotgb_tpu.ops.attention import make_padding_bias
from videotgb_tpu.ops.rope import roformer_rope, roformer_sincos_table


@dataclasses.dataclass(frozen=True)
class TGBConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    fusion_layer: int = 6
    encoder_width: int = 768  # width of the text stream fed to cross-attn
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    patch_size: int = 16
    flow_size: int = 224
    hidden_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self) -> int:
        return (self.flow_size // self.patch_size) ** 2

    @classmethod
    def tiny(cls) -> "TGBConfig":
        return cls(vocab_size=384, hidden_size=32, num_layers=4, num_heads=2,
                   intermediate_size=64, fusion_layer=2, encoder_width=32,
                   flow_size=32, max_position_embeddings=128)


class TemporalOFEmbedding(nn.Module):
    config: TGBConfig

    @nn.compact
    def __call__(
        self, flow: jax.Array, flow_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """flow (B, L, H, W, 2), flow_mask (B, L+2) -> (B, L+2, hidden)."""
        cfg = self.config
        b, l = flow.shape[:2]
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.with_partitioning(
                default_kernel_init, (None, None, "conv_in", "embed")
            ),
            name="projection",
        )(flow.reshape(b * l, *flow.shape[2:]).astype(cfg.dtype))
        x = x.reshape(b * l, cfg.num_patches, cfg.hidden_size)
        # collapse 196 patches -> one token per frame: Linear over the patch
        # axis (xropebert.py:79-82,113-115)
        x = dense(1, (None, None), dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                  name="fc")(x.transpose(0, 2, 1))
        x = x.reshape(b, l, cfg.hidden_size)

        bos = self.param(
            "bos",
            nn.with_partitioning(nn.initializers.truncated_normal(0.02), ("embed",)),
            (cfg.hidden_size,), cfg.param_dtype,
        ).astype(cfg.dtype)
        eos = self.param(
            "eos",
            nn.with_partitioning(nn.initializers.truncated_normal(0.02), ("embed",)),
            (cfg.hidden_size,), cfg.param_dtype,
        ).astype(cfg.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(bos, (b, 1, cfg.hidden_size)), x,
             jnp.zeros((b, 1, cfg.hidden_size), cfg.dtype)], axis=1
        )
        ends = jnp.sum(flow_mask.astype(jnp.int32), axis=1) - 1  # (B,)
        onehot = jax.nn.one_hot(ends, l + 2, dtype=cfg.dtype)  # (B, L+2)
        x = x * (1 - onehot)[..., None] + onehot[..., None] * eos

        pos = embed(cfg.max_position_embeddings, cfg.hidden_size,
                    dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="frame_pos_embed")(jnp.arange(l + 2)[None])
        x = x + pos
        x = LayerNorm(cfg.layer_norm_eps, cfg.dtype, cfg.param_dtype, name="ln")(x)
        return nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)


class TGBLayer(nn.Module):
    config: TGBConfig
    has_cross_attention: bool

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        self_bias: jax.Array | None,
        text: jax.Array | None,
        text_bias: jax.Array | None,
        sincos_self: jax.Array,
        sincos_cross: jax.Array | None,
    ) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        rope_self = lambda t: roformer_rope(t, sincos_self)
        attn_out, _ = MultiHeadAttention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, bias_grad=False,
            name="self_attn", **kw
        )(x, bias=self_bias, rope_q=rope_self, rope_k=rope_self)
        x = LayerNorm(cfg.layer_norm_eps, name="self_ln", **kw)(x + attn_out)

        if self.has_cross_attention:
            rope_cross = lambda t: roformer_rope(t, sincos_cross)
            cross_out, _ = MultiHeadAttention(
                num_heads=cfg.num_heads, head_dim=cfg.head_dim, bias_grad=False,
                name="cross_attn", **kw
            )(x, x_kv=text, bias=text_bias, rope_q=rope_self, rope_k=rope_cross)
            x = LayerNorm(cfg.layer_norm_eps, name="cross_ln", **kw)(x + cross_out)

        x = LayerNorm(cfg.layer_norm_eps, name="ffn_ln", **kw)(
            x + Mlp(cfg.intermediate_size, act="gelu", name="mlp", **kw)(x)
        )
        return x


class TGBModel(nn.Module):
    """forward(flow, flow_mask, question_ids, question_mask, mode) ->
    (sequence_output (B, L+2, hidden), span_logits (B, L, 2))."""

    config: TGBConfig

    @nn.compact
    def __call__(
        self,
        flow: jax.Array,  # (B, L, H, W, 2)
        flow_mask: jax.Array,  # (B, L+2), 1 = valid
        question_ids: jax.Array,  # (B, T)
        question_mask: jax.Array | None = None,  # (B, T)
        mode: str = "fusion",
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, l = flow.shape[:2]

        from videotgb_tpu.parallel.sharding import constrain_batch

        x = TemporalOFEmbedding(cfg, name="temporal_embeddings")(
            flow, flow_mask, deterministic
        )
        x = constrain_batch(x)
        # question text through the shared BERT word/token-type embeddings
        # (xropebert.py:174-207; positions come from RoPE, not here)
        tok = embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings", **kw)(
            question_ids
        )
        type_emb = embed(cfg.type_vocab_size, cfg.hidden_size,
                         name="token_type_embeddings", **kw)(
            jnp.zeros_like(question_ids)
        )
        text = LayerNorm(cfg.layer_norm_eps, name="text_ln", **kw)(tok + type_emb)
        text = nn.Dropout(cfg.hidden_dropout)(text, deterministic=deterministic)
        text = constrain_batch(text)

        self_bias = make_padding_bias(flow_mask)
        text_bias = (
            make_padding_bias(question_mask) if question_mask is not None else None
        )
        sincos_self = roformer_sincos_table(l + 2, cfg.head_dim)
        sincos_cross = roformer_sincos_table(question_ids.shape[1], cfg.head_dim)

        if mode in ("text", "vision"):
            layer_range = range(0, cfg.fusion_layer)
        elif mode == "fusion":
            layer_range = range(cfg.fusion_layer, cfg.num_layers)
        elif mode == "multi_modal":
            layer_range = range(0, cfg.num_layers)
        else:
            raise ValueError(f"invalid mode: {mode}")

        # NOTE: flax creates params lazily per called layer, so initialize
        # with mode="multi_modal" (all layers) and apply with any mode.
        for i in layer_range:
            x = TGBLayer(cfg, has_cross_attention=(i >= cfg.fusion_layer),
                         name=f"layer_{i}")(
                x, self_bias, text, text_bias, sincos_self, sincos_cross
            )
            x = constrain_batch(x)

        logits = dense(2, ("embed", None), name="mrc_head", **kw)(x[:, 1:-1])
        return x, logits.astype(jnp.float32)


# --------------------------------------------------- ALBERT-shared variant
@dataclasses.dataclass(frozen=True)
class AlbertTGBConfig:
    """RopeAlbertModel hyperparameters (reference:
    src/models/components/xropealbert.py — the alternate parameter-shared
    TGB, LSTP_TG_blip2_module.py:94). Differences from the RoPE-BERT TGB:

    * one layer group's weights are reused at every depth (ALBERT sharing);
    * every layer applies BOTH self- and cross-attention (no fusion gating —
      mode only selects the depth range, xropealbert.py:611-619);
    * self-attention carries NO RoPE; cross-attention rotates q by frame
      positions and k by text positions from fixed sinusoidal tables
      (xropealbert.py:496-508, 579-604);
    * text enters at ``embedding_size`` with learned absolute position
      embeddings, then maps into hidden via embedding_hidden_mapping_in
      (xropealbert.py:585, 601);
    * the MRC head is Linear -> ReLU -> Linear (xropealbert.py:801-805).
    """

    vocab_size: int = 30000
    embedding_size: int = 128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_hidden_groups: int = 1
    inner_group_num: int = 1
    # depth split for the mode ranges (the reference hardcodes 6,
    # xropealbert.py:611-616)
    fusion_layer: int = 6
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    patch_size: int = 16
    flow_size: int = 224
    act: str = "gelu_new"  # AlbertConfig default hidden_act
    hidden_dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_patches(self) -> int:
        return (self.flow_size // self.patch_size) ** 2


class AlbertTGBLayer(nn.Module):
    """One shared ALBERT layer: post-LN self-attn (no RoPE) -> post-LN
    cross-attn (RoPE q/k) -> post-LN FFN (xropealbert.py:469-524)."""

    config: AlbertTGBConfig

    @nn.compact
    def __call__(self, x, self_bias, text, text_bias, sincos_self, sincos_cross):
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        attn_out, _ = MultiHeadAttention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, bias_grad=False,
            name="self_attn", **kw)(x, bias=self_bias)
        x = LayerNorm(cfg.layer_norm_eps, name="self_ln", **kw)(x + attn_out)
        cross_out, _ = MultiHeadAttention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, bias_grad=False,
            name="cross_attn", **kw)(
            x, x_kv=text, bias=text_bias,
            rope_q=lambda t: roformer_rope(t, sincos_self),
            rope_k=lambda t: roformer_rope(t, sincos_cross))
        x = LayerNorm(cfg.layer_norm_eps, name="cross_ln", **kw)(x + cross_out)
        return LayerNorm(cfg.layer_norm_eps, name="ffn_ln", **kw)(
            x + Mlp(cfg.intermediate_size, act=cfg.act, name="mlp", **kw)(x))


class AlbertTGBModel(nn.Module):
    """forward(flow, flow_mask, question_ids, question_mask, mode) ->
    (sequence_output (B, L+2, hidden), span_logits (B, L, 2)); numeric match
    of the mounted RopeAlbertModel (tests/test_parity.py)."""

    config: AlbertTGBConfig

    @nn.compact
    def __call__(
        self,
        flow: jax.Array,  # (B, L, H, W, 2)
        flow_mask: jax.Array,  # (B, L+2)
        question_ids: jax.Array,  # (B, T)
        question_mask: jax.Array | None = None,
        mode: str = "fusion",
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        l = flow.shape[1]
        t = question_ids.shape[1]

        x = TemporalOFEmbedding(cfg, name="temporal_embeddings")(
            flow, flow_mask, deterministic)

        # text at embedding_size with learned absolute positions
        # (RopeAlbertEmbeddings, xropealbert.py:256-321), then the ALBERT
        # factorized-embedding mapping into hidden (xropealbert.py:601)
        tok = embed(cfg.vocab_size, cfg.embedding_size,
                    name="word_embeddings", **kw)(question_ids)
        typ = embed(cfg.type_vocab_size, cfg.embedding_size,
                    name="token_type_embeddings", **kw)(
            jnp.zeros_like(question_ids))
        pos = embed(cfg.max_position_embeddings, cfg.embedding_size,
                    name="position_embeddings", **kw)(jnp.arange(t)[None])
        text = LayerNorm(cfg.layer_norm_eps, name="text_ln", **kw)(
            tok + typ + pos)
        text = nn.Dropout(cfg.hidden_dropout)(text, deterministic=deterministic)
        # distinct logical axes — duplicate names would resolve to an invalid
        # PartitionSpec('fsdp','fsdp') when sharded
        text = dense(cfg.hidden_size, (None, "embed"),
                     name="embedding_hidden_mapping_in", **kw)(text)

        self_bias = make_padding_bias(flow_mask)
        text_bias = (make_padding_bias(question_mask)
                     if question_mask is not None else None)
        sincos_self = roformer_sincos_table(l + 2, cfg.head_dim)
        sincos_cross = roformer_sincos_table(t, cfg.head_dim)

        if mode in ("text", "vision"):
            layer_range = range(0, cfg.fusion_layer)
        elif mode == "fusion":
            layer_range = range(cfg.fusion_layer, cfg.num_layers)
        elif mode == "multi_modal":
            layer_range = range(0, cfg.num_layers)
        else:
            raise ValueError(f"invalid mode: {mode}")

        # the same module instances are called at every depth -> shared
        # params (ALBERT); each depth step runs the whole inner group
        # (xropealbert.py:621-639)
        groups = [
            [AlbertTGBLayer(cfg, name=f"group_{g}_inner_{j}")
             for j in range(cfg.inner_group_num)]
            for g in range(cfg.num_hidden_groups)
        ]
        layers_per_group = cfg.num_layers // cfg.num_hidden_groups
        for i in layer_range:
            for layer in groups[i // layers_per_group]:
                x = layer(x, self_bias, text, text_bias,
                          sincos_self, sincos_cross)

        h = dense(cfg.hidden_size, ("embed", "mlp"),
                  name="mrc_head_in", **kw)(x[:, 1:-1])
        logits = dense(2, ("embed", None), name="mrc_head_out",
                       **kw)(nn.relu(h))
        return x, logits.astype(jnp.float32)
