"""Flan-T5 encoder-decoder, TPU-native, with functional KV-cache decode.

The reference drives HF's T5 through Blip2ForConditionalGeneration
(reference: src/models/components/xblip2.py:1539-1835, language model loaded
at :1553-1556). This is a from-scratch JAX implementation of the same
architecture (T5 v1.1 / flan variant):

* RMS "T5LayerNorm" (no mean subtraction, no bias), pre-norm residual blocks,
  final layer norms, all dense layers bias-free;
* attention scores are UNscaled (scale=1.0 — T5 folds the scale into init);
* bucketed relative position bias, computed once from layer 0's embedding and
  shared by all layers (bidirectional buckets in the encoder, causal in the
  decoder);
* gated-gelu FFN (wi_0 * gelu-gate wi_1);
* separate lm_head (flan-t5 does not tie embeddings).

Decode threads an explicit per-layer cache pytree
``{"self": {k,v}, "cross": {k,v}}`` through lax loops (see ops.decode);
cross K/V are computed once at prefill from the encoder output.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.models.common import (
    KVCache,
    MultiHeadAttention,
    RMSNorm,
    dense,
    embed,
    init_kv_cache,
)
from videotgb_tpu.ops.attention import NEG_INF, make_causal_bias, make_padding_bias

LayerCache = dict[str, KVCache]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    num_heads: int = 32
    d_ff: int = 5120
    num_encoder_layers: int = 24
    num_decoder_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dropout: float = 0.1
    tie_word_embeddings: bool = False
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    eos_token_id: int = 1
    lora_rank: int = 0
    lora_alpha: float = 32.0
    # nn.scan over blocks (stacked params, one compiled body) and optional
    # rematerialization for training memory
    scan_layers: bool = False
    remat: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @classmethod
    def flan_t5_xl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=384, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                   num_encoder_layers=2, num_decoder_layers=2)


def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool,
    num_buckets: int,
    max_distance: int,
) -> jax.Array:
    """T5's log-spaced distance bucketing (HF modeling_t5 semantics).
    relative_position = key_pos - query_pos."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + jnp.where(n < 0, num_buckets, 0)
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    config: T5Config
    bidirectional: bool

    @nn.compact
    def __call__(self, q_positions: jax.Array, k_positions: jax.Array) -> jax.Array:
        """-> (1, heads, len(q_positions), len(k_positions)) float32 bias."""
        cfg = self.config
        rel = k_positions[None, :] - q_positions[:, None]
        buckets = relative_position_bucket(
            rel, self.bidirectional,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        table = self.param(
            "rel_embedding",
            nn.with_partitioning(nn.initializers.normal(1.0), (None, "heads")),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            cfg.param_dtype,
        )
        bias = jnp.take(table, buckets, axis=0)  # (q, k, heads)
        return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


class T5Block(nn.Module):
    config: T5Config
    is_decoder: bool

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        self_bias: jax.Array | None,
        encoder_hidden: jax.Array | None = None,
        cross_bias: jax.Array | None = None,
        cache: LayerCache | None = None,
        cache_index: jax.Array | None = None,
        cross_prefill: bool = False,
    ) -> tuple[jax.Array, LayerCache | None]:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        mha_kw = dict(
            num_heads=cfg.num_heads, head_dim=cfg.d_kv, out_features=cfg.d_model,
            use_bias=False, scale=1.0, lora_rank=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha, **kw,
        )
        new_cache: LayerCache = {}

        h = RMSNorm(cfg.layer_norm_eps, name="self_ln", **kw)(x)
        attn, self_kv = MultiHeadAttention(name="self_attn", **mha_kw)(
            h, bias=self_bias,
            cache=None if cache is None else cache["self"],
            cache_index=cache_index,
        )
        if self_kv is not None:
            new_cache["self"] = self_kv
        x = x + attn

        if self.is_decoder:
            h = RMSNorm(cfg.layer_norm_eps, name="cross_ln", **kw)(x)
            use_cached_cross = cache is not None and not cross_prefill
            attn, cross_kv = MultiHeadAttention(name="cross_attn", **mha_kw)(
                h, x_kv=encoder_hidden, bias=cross_bias,
                cache=cache["cross"] if use_cached_cross else None,
                cross_cached=use_cached_cross,
                return_kv=cache is not None and cross_prefill,
            )
            if cache is not None:
                new_cache["cross"] = cross_kv if cross_prefill else cache["cross"]
            x = x + attn

        h = RMSNorm(cfg.layer_norm_eps, name="ffn_ln", **kw)(x)
        hidden = dense(cfg.d_ff, ("embed", "mlp"), use_bias=False, name="wi_0", **kw)(h)
        gate = dense(cfg.d_ff, ("embed", "mlp"), use_bias=False, name="wi_1", **kw)(h)
        # flan-T5's gated act is gelu_new (tanh approximation)
        h = nn.gelu(hidden, approximate=True) * gate
        x = x + dense(cfg.d_model, ("mlp", "embed"), use_bias=False, name="wo", **kw)(h)
        return x, (new_cache or None)


class _ScanT5Encoder(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x, bias):
        from videotgb_tpu.parallel.sharding import constrain_batch

        block_cls = nn.remat(T5Block) if self.config.remat else T5Block
        x, _ = block_cls(self.config, is_decoder=False, name="block")(x, bias)
        return constrain_batch(x), None


class _ScanT5Decoder(nn.Module):
    config: T5Config
    cross_prefill: bool = False

    @nn.compact
    def __call__(self, x, cache, self_bias, encoder_hidden, cross_bias,
                 cache_index):
        from videotgb_tpu.parallel.sharding import constrain_batch

        block_cls = nn.remat(T5Block) if self.config.remat else T5Block
        x, new_cache = block_cls(self.config, is_decoder=True, name="block")(
            x, self_bias, encoder_hidden, cross_bias,
            cache=cache, cache_index=cache_index,
            cross_prefill=self.cross_prefill,
        )
        if cache is None:
            new_cache = 0  # scan needs a concrete per-step output
        return constrain_batch(x), new_cache


def _scan_transform(module_cls, length: int, in_axes):
    return nn.scan(
        module_cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=in_axes,
        length=length,
        metadata_params={nn.PARTITION_NAME: "layers"},
    )


class T5Model(nn.Module):
    """Methods: embed / encode / decode / __call__ (teacher-forced loss pass).

    With ``scan_layers`` the encoder/decoder stacks compile once (stacked
    params under encoder_layers/decoder_layers; convert.stack_layers maps
    per-layer checkpoints) and decode caches carry a leading layer axis.
    """

    config: T5Config

    def setup(self) -> None:
        cfg = self.config
        self.shared = embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="shared")
        self.enc_rel_bias = RelativePositionBias(cfg, bidirectional=True)
        self.dec_rel_bias = RelativePositionBias(cfg, bidirectional=False)
        if not cfg.scan_layers:
            self.encoder_blocks = [
                T5Block(cfg, is_decoder=False, name=f"encoder_{i}")
                for i in range(cfg.num_encoder_layers)
            ]
            self.decoder_blocks = [
                T5Block(cfg, is_decoder=True, name=f"decoder_{i}")
                for i in range(cfg.num_decoder_layers)
            ]
        else:
            dec_axes = (0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast)
            self.encoder_scan = _scan_transform(
                _ScanT5Encoder, cfg.num_encoder_layers, (nn.broadcast,)
            )(cfg, name="encoder_layers")
            self.decoder_scan = _scan_transform(
                _ScanT5Decoder, cfg.num_decoder_layers, dec_axes
            )(cfg, cross_prefill=False, name="decoder_layers")
            # the prefill variant shares the same parameter scope
            self.decoder_scan_prefill = _scan_transform(
                _ScanT5Decoder, cfg.num_decoder_layers, dec_axes
            )(cfg, cross_prefill=True, name="decoder_layers_prefill")
            nn.share_scope(self.decoder_scan_prefill, self.decoder_scan)
        self.encoder_final_ln = RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype,
                                        name="encoder_final_ln")
        self.decoder_final_ln = RMSNorm(cfg.layer_norm_eps, dtype=cfg.dtype,
                                        param_dtype=cfg.param_dtype,
                                        name="decoder_final_ln")
        if not cfg.tie_word_embeddings:
            self.lm_head = dense(cfg.vocab_size, ("embed", "vocab"),
                                 use_bias=False, dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype, name="lm_head")

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.shared(input_ids)

    def _active_pp(self):
        """pp>1 mesh in scope (trace time), except during init."""
        if self.is_initializing():
            return None
        from videotgb_tpu.parallel.pipeline import active_pp_mesh

        return active_pp_mesh()

    def _pipeline_stack(self, mesh, collection: str, is_decoder: bool,
                        tree: tuple):
        """Pipeline-parallel layer stack (mirrors LlamaModel._pipeline_forward):
        the scanned tower's stacked params split into contiguous stages over
        the mesh's pp axis, microbatches streamed between neighbours.
        Numerically identical to the sequential scan; used for the no-cache
        (training / scoring / encode) passes — decode keeps the sequential
        path. tree = (x, *side_inputs); every element is broadcast to a
        leading batch dim so it streams with the microbatch."""
        from videotgb_tpu.parallel.pipeline import pipeline_apply

        cfg = self.config
        b = tree[0].shape[0]
        stacked = self.variables["params"][collection]["block"]
        tree = tuple(
            t if t.shape[0] == b else jnp.broadcast_to(t, (b, *t.shape[1:]))
            for t in tree
        )
        block = T5Block(cfg, is_decoder=is_decoder, parent=None)

        def layer_fn(p, t):
            h2, _ = block.apply({"params": p}, t[0], *t[1:])
            return (h2, *t[1:])

        out = pipeline_apply(layer_fn, stacked, tree, mesh)
        return out[0]

    def encode(
        self, inputs_embeds: jax.Array, attention_mask: jax.Array
    ) -> jax.Array:
        """inputs_embeds (B, S, d_model) — callers may prepend visual tokens."""
        cfg = self.config
        s = inputs_embeds.shape[1]
        positions = jnp.arange(s)
        bias = self.enc_rel_bias(positions, positions) + make_padding_bias(attention_mask)
        from videotgb_tpu.parallel.sharding import constrain_batch

        x = constrain_batch(inputs_embeds.astype(cfg.dtype))
        if cfg.scan_layers:
            pp_mesh = self._active_pp()
            piped = False
            if pp_mesh is not None:
                try:  # ValueError = batch/layers don't divide -> sequential
                    x = self._pipeline_stack(pp_mesh, "encoder_layers",
                                             False, (x, bias))
                    piped = True
                except ValueError:
                    piped = False
            if not piped:
                x, _ = self.encoder_scan(x, bias)
        else:
            for block in self.encoder_blocks:
                x, _ = block(x, bias)
                x = constrain_batch(x)
        return self.encoder_final_ln(x)

    def _logits(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        if cfg.tie_word_embeddings:
            x = x * (cfg.d_model ** -0.5)
            return self.shared.attend(x).astype(jnp.float32)
        return self.lm_head(x).astype(jnp.float32)

    def decode(
        self,
        decoder_input_ids: jax.Array,
        encoder_hidden: jax.Array,
        encoder_mask: jax.Array,
        decoder_mask: jax.Array | None = None,
        caches: list[LayerCache] | None = None,
        cache_index: jax.Array | None = None,
        cache_positions_valid: jax.Array | None = None,
        cross_prefill: bool = False,
    ) -> tuple[jax.Array, list[LayerCache] | None]:
        """Teacher-forced when caches is None; incremental otherwise.

        With caches, self-attention spans the whole cache buffer; the valid
        prefix mask must be supplied via ``cache_positions_valid`` (B, S_max).
        The first cached call must pass ``cross_prefill=True`` so every
        decoder layer's cross K/V get computed and stored.
        """
        cfg = self.config
        b, s = decoder_input_ids.shape
        from videotgb_tpu.parallel.sharding import constrain_batch

        x = constrain_batch(self.shared(decoder_input_ids).astype(cfg.dtype))
        cross_bias = make_padding_bias(encoder_mask)

        if caches is None:
            positions = jnp.arange(s)
            self_bias = (
                self.dec_rel_bias(positions, positions)
                + make_causal_bias(s, s)
            )
            if decoder_mask is not None:
                self_bias = self_bias + make_padding_bias(decoder_mask)
            new_caches = None
            if cfg.scan_layers:
                pp_mesh = self._active_pp()
                piped = False
                if pp_mesh is not None:
                    try:
                        x = self._pipeline_stack(
                            pp_mesh, "decoder_layers", True,
                            (x, self_bias, encoder_hidden, cross_bias))
                        piped = True
                    except ValueError:
                        piped = False
                if not piped:
                    x, _ = self.decoder_scan(x, None, self_bias,
                                             encoder_hidden, cross_bias, None)
            else:
                for block in self.decoder_blocks:
                    x, _ = block(x, self_bias, encoder_hidden, cross_bias)
                    x = constrain_batch(x)
        else:
            first_self_k = (caches["self"]["k"] if cfg.scan_layers
                            else caches[0]["self"]["k"])
            s_max = first_self_k.shape[-2]
            q_pos = cache_index + jnp.arange(s)
            k_pos = jnp.arange(s_max)
            self_bias = self.dec_rel_bias(q_pos, k_pos)
            causal = jnp.where(
                k_pos[None, :] <= q_pos[:, None], 0.0, NEG_INF
            )[None, None]
            self_bias = self_bias + causal
            if cache_positions_valid is not None:
                self_bias = self_bias + make_padding_bias(cache_positions_valid)
            if cfg.scan_layers:
                scan_fn = (self.decoder_scan_prefill if cross_prefill
                           else self.decoder_scan)
                x, new_caches = scan_fn(x, caches, self_bias, encoder_hidden,
                                        cross_bias, cache_index)
            else:
                new_caches = []
                for block, cache in zip(self.decoder_blocks, caches):
                    x, new_cache = block(
                        x, self_bias, encoder_hidden, cross_bias,
                        cache=cache, cache_index=cache_index,
                        cross_prefill=cross_prefill,
                    )
                    new_caches.append(new_cache)
        x = self.decoder_final_ln(x)
        return self._logits(x), new_caches

    def init_caches(
        self, batch: int, max_len: int, encoder_len: int
    ) -> list[LayerCache] | LayerCache:
        """Zeroed decode caches; the first decode(cross_prefill=True) call
        fills every layer's cross K/V from the encoder output. With
        scan_layers the caches are one stacked pytree (leading layer axis)."""
        cfg = self.config

        def one():
            return {
                "self": init_kv_cache(batch, cfg.num_heads, max_len, cfg.d_kv,
                                      cfg.dtype),
                "cross": init_kv_cache(batch, cfg.num_heads, encoder_len,
                                       cfg.d_kv, cfg.dtype),
            }

        if cfg.scan_layers:
            return jax.tree.map(
                lambda x: jnp.broadcast_to(
                    x, (cfg.num_decoder_layers, *x.shape)).copy(),
                one(),
            )
        return [one() for _ in range(cfg.num_decoder_layers)]

    def __call__(
        self,
        encoder_embeds: jax.Array,
        encoder_mask: jax.Array,
        decoder_input_ids: jax.Array,
        decoder_mask: jax.Array | None = None,
    ) -> jax.Array:
        encoder_hidden = self.encode(encoder_embeds, encoder_mask)
        logits, _ = self.decode(decoder_input_ids, encoder_hidden, encoder_mask,
                                decoder_mask)
        return logits
