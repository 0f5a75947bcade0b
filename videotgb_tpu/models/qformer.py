"""Q-Former: the querying transformer that compresses ViT patches to 32 tokens.

TPU-native equivalent of the reference's HF forks Blip2QFormerModel
(reference: src/models/components/xblip2.py:566-1050) and the
instruction-aware InstructBlipQFormerModel (xinstructblip.py:999-1254):

* 32 learned query tokens self-attend (optionally together with tokenized
  instruction text — the InstructBLIP variant), and every
  ``cross_attention_frequency`` (=2) layers the *query positions only*
  cross-attend into the frozen ViT's 257 patch embeddings;
* the FFN is split: query positions run through their own
  intermediate_query/output_query weights, text positions through the
  standard intermediate/output weights (BLIP's design, kept for checkpoint
  parity);
* output is the query slice (B, 32, hidden), which the parent model projects
  into the LLM embedding space.

Everything is fixed-shape: text is padded to a static length and masked, so
the mixed query+text sequence jits once.
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
    embed,
)
from videotgb_tpu.ops.attention import make_padding_bias


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_query_tokens: int = 32
    cross_attention_frequency: int = 2
    encoder_hidden_size: int = 1408  # ViT width
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, encoder_hidden_size: int = 64) -> "QFormerConfig":
        return cls(vocab_size=384, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, num_query_tokens=8,
                   encoder_hidden_size=encoder_hidden_size)


class QFormerLayer(nn.Module):
    config: QFormerConfig
    has_cross_attention: bool

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        self_bias: jax.Array | None,
        encoder_hidden_states: jax.Array | None,
        encoder_bias: jax.Array | None,
        query_length: int,
    ) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        attn_out, _ = MultiHeadAttention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, bias_grad=False,
            name="self_attn", **kw
        )(x, bias=self_bias)
        x = LayerNorm(cfg.layer_norm_eps, name="self_ln", **kw)(x + attn_out)

        query = x[:, :query_length]
        if self.has_cross_attention and encoder_hidden_states is not None:
            cross_out, _ = MultiHeadAttention(
                num_heads=cfg.num_heads, head_dim=cfg.head_dim, bias_grad=False,
                name="cross_attn", **kw
            )(query, x_kv=encoder_hidden_states, bias=encoder_bias)
            query = LayerNorm(cfg.layer_norm_eps, name="cross_ln", **kw)(query + cross_out)

        # split FFN: query path has its own weights (xblip2.py:843-866)
        query = LayerNorm(cfg.layer_norm_eps, name="ffn_query_ln", **kw)(
            query + Mlp(cfg.intermediate_size, act="gelu", name="mlp_query", **kw)(query)
        )
        if x.shape[1] > query_length:
            text = x[:, query_length:]
            text = LayerNorm(cfg.layer_norm_eps, name="ffn_text_ln", **kw)(
                text + Mlp(cfg.intermediate_size, act="gelu", name="mlp_text", **kw)(text)
            )
            return jnp.concatenate([query, text], axis=1)
        return query


class QFormerModel(nn.Module):
    """``input_ids=None`` gives the BLIP2 variant; passing instruction token
    ids gives the InstructBLIP variant."""

    config: QFormerConfig

    @nn.compact
    def __call__(
        self,
        query_embeds: jax.Array,  # (B, Q, hidden)
        encoder_hidden_states: jax.Array,  # (B, P, encoder_hidden)
        encoder_attention_mask: jax.Array | None = None,  # (B, P)
        input_ids: jax.Array | None = None,  # (B, T) instruction tokens
        attention_mask: jax.Array | None = None,  # (B, T) for the text part
    ) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        b, q_len = query_embeds.shape[:2]

        x = query_embeds.astype(cfg.dtype)
        self_mask = jnp.ones((b, q_len), jnp.float32)
        if input_ids is not None:
            tok = embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings", **kw)(
                input_ids
            )
            pos = self.param(
                "position_embeddings",
                nn.with_partitioning(default_kernel_init, ("seq", "embed")),
                (cfg.max_position_embeddings, cfg.hidden_size),
                cfg.param_dtype,
            )
            tok = tok + pos[None, : tok.shape[1]].astype(cfg.dtype)
            x = jnp.concatenate([x, tok], axis=1)
            text_mask = (
                attention_mask.astype(jnp.float32)
                if attention_mask is not None
                else jnp.ones(input_ids.shape, jnp.float32)
            )
            self_mask = jnp.concatenate([self_mask, text_mask], axis=1)

        x = LayerNorm(cfg.layer_norm_eps, name="embeddings_ln", **kw)(x)

        self_bias = make_padding_bias(self_mask)
        if encoder_attention_mask is None:
            encoder_bias = None
        else:
            encoder_bias = make_padding_bias(encoder_attention_mask)

        for i in range(cfg.num_layers):
            x = QFormerLayer(
                cfg,
                has_cross_attention=(i % cfg.cross_attention_frequency == 0),
                name=f"layer_{i}",
            )(x, self_bias, encoder_hidden_states.astype(cfg.dtype), encoder_bias, q_len)

        return x[:, :q_len]
