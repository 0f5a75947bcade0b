"""LLaMA/Vicuna-7B decoder-only LM, TPU-native with tensor-parallel sharding.

The reference loads Vicuna-7B through InstructBlipForConditionalGeneration's
AutoModelForCausalLM (reference: src/models/components/xinstructblip.py:1255,
LLM at :1268-1290 region). From-scratch JAX implementation of the LLaMA-1
architecture Vicuna fine-tunes: pre-RMSNorm blocks, half-split RoPE, SwiGLU
MLP, bias-free dense layers, separate lm_head.

7B on a v5e-8 slice is served with heads and MLP hidden sharded over the tp
axis ("heads"/"mlp" logical axes -> tp, SURVEY.md section 7.3 item 5); KV
caches inherit the head sharding.

Accepts ``inputs_embeds`` so the BLIP2/InstructBLIP wrapper can prepend the
Q-Former's visual tokens to the token embeddings
(reference: LSTP_SF_blip2_module.py:341-352).
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
from videotgb_tpu.ops.rope import llama_rope


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    intermediate_size: int = 11008
    rms_norm_eps: float = 1e-6
    rope_base: float = 10000.0
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    lora_rank: int = 0
    lora_alpha: float = 32.0
    # nn.scan over blocks (stacked params) + optional remat (training memory)
    scan_layers: bool = False
    remat: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def vicuna_7b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        return cls(vocab_size=384, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64)


def _pp_mesh():
    """The active mesh when it has a pp axis > 1 (else None)."""
    from videotgb_tpu.parallel.pipeline import active_pp_mesh

    return active_pp_mesh()


class LlamaBlock(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        positions: jax.Array,
        bias: jax.Array | None,
        cache: KVCache | None = None,
        cache_index: jax.Array | None = None,
    ) -> tuple[jax.Array, KVCache | None]:
        cfg = self.config
        kw = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        def rope(t: jax.Array) -> jax.Array:
            # t: (B, H, S, D) -> rope expects (B, S, H, D)
            return llama_rope(
                t.transpose(0, 2, 1, 3), positions, cfg.rope_base
            ).transpose(0, 2, 1, 3)

        h = RMSNorm(cfg.rms_norm_eps, name="input_ln", **kw)(x)
        attn, new_cache = MultiHeadAttention(
            num_heads=cfg.num_heads, head_dim=cfg.head_dim, use_bias=False,
            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
            bias_grad=False,  # causal + padding mask only
            name="attn", **kw,
        )(h, bias=bias, rope_q=rope, rope_k=rope, cache=cache, cache_index=cache_index)
        x = x + attn

        h = RMSNorm(cfg.rms_norm_eps, name="post_ln", **kw)(x)
        gate = dense(cfg.intermediate_size, ("embed", "mlp"), use_bias=False,
                     name="gate_proj", **kw)(h)
        up = dense(cfg.intermediate_size, ("embed", "mlp"), use_bias=False,
                   name="up_proj", **kw)(h)
        x = x + dense(cfg.hidden_size, ("mlp", "embed"), use_bias=False,
                      name="down_proj", **kw)(nn.silu(gate) * up)
        return x, new_cache


class _ScanLlamaBlock(nn.Module):
    config: LlamaConfig

    @nn.compact
    def __call__(self, x, cache, positions, bias, cache_index):
        from videotgb_tpu.parallel.sharding import constrain_batch

        block_cls = nn.remat(LlamaBlock) if self.config.remat else LlamaBlock
        x, new_cache = block_cls(self.config, name="layer")(
            x, positions, bias, cache=cache, cache_index=cache_index)
        if cache is None:
            new_cache = 0  # concrete per-step scan output
        return constrain_batch(x), new_cache


class LlamaModel(nn.Module):
    config: LlamaConfig

    def setup(self) -> None:
        cfg = self.config
        self.embed_tokens = embed(cfg.vocab_size, cfg.hidden_size,
                                  dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                                  name="embed_tokens")
        if cfg.scan_layers:
            self.blocks_scan = nn.scan(
                _ScanLlamaBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
                length=cfg.num_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, name="layers")
        else:
            self.blocks = [LlamaBlock(cfg, name=f"layer_{i}")
                           for i in range(cfg.num_layers)]
        self.final_ln = RMSNorm(cfg.rms_norm_eps, dtype=cfg.dtype,
                                param_dtype=cfg.param_dtype, name="final_ln")
        self.lm_head = dense(cfg.vocab_size, ("embed", "vocab"), use_bias=False,
                             dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             name="lm_head")

    def embed(self, input_ids: jax.Array) -> jax.Array:
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        input_ids: jax.Array | None = None,
        inputs_embeds: jax.Array | None = None,
        attention_mask: jax.Array | None = None,  # (B, S) padding mask
        positions: jax.Array | None = None,  # (B, S) absolute positions
        caches: list[KVCache] | None = None,
        cache_index: jax.Array | None = None,
        cache_positions_valid: jax.Array | None = None,  # (B, S_max)
    ) -> tuple[jax.Array, list[KVCache] | None]:
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        x = inputs_embeds.astype(cfg.dtype)
        b, s = x.shape[:2]

        if positions is None:
            base = 0 if cache_index is None else cache_index
            positions = jnp.broadcast_to(base + jnp.arange(s)[None], (b, s))

        cfg_scan = cfg.scan_layers
        if caches is None:
            bias = make_causal_bias(s, s)
            if attention_mask is not None:
                bias = bias + make_padding_bias(attention_mask)
            new_caches = None
            pp_mesh = (_pp_mesh()
                       if cfg_scan and not self.is_initializing() else None)
            piped = False
            if pp_mesh is not None:
                try:  # ValueError = batch/layers not divisible -> sequential
                    x = self._pipeline_forward(pp_mesh, x, positions, bias)
                    piped = True
                except ValueError:
                    piped = False
            if piped:
                pass
            elif cfg_scan:
                x, _ = self.blocks_scan(x, None, positions, bias, None)
            else:
                from videotgb_tpu.parallel.sharding import constrain_batch

                for block in self.blocks:
                    x, _ = block(x, positions, bias)
                    x = constrain_batch(x)
        else:
            first_k = caches["k"] if cfg_scan else caches[0]["k"]
            s_max = first_k.shape[-2]
            q_pos = cache_index + jnp.arange(s)
            k_pos = jnp.arange(s_max)
            bias = jnp.where(k_pos[None, :] <= q_pos[:, None], 0.0, NEG_INF)[None, None]
            if cache_positions_valid is not None:
                bias = bias + make_padding_bias(cache_positions_valid)
            if cfg_scan:
                x, new_caches = self.blocks_scan(x, caches, positions, bias,
                                                 cache_index)
            else:
                new_caches = []
                for block, cache in zip(self.blocks, caches):
                    x, nc = block(x, positions, bias, cache=cache, cache_index=cache_index)
                    new_caches.append(nc)

        x = self.final_ln(x)
        return self.lm_head(x).astype(jnp.float32), new_caches

    def _pipeline_forward(self, mesh, x, positions, bias):
        """Pipeline-parallel layer stack: the scanned tower's stacked params
        split into contiguous stages over the mesh's pp axis, microbatches
        streamed between neighbours (parallel.pipeline GPipe pipelined scan).
        Numerically identical to the sequential scan; active when a pp>1 mesh
        context surrounds the train step and caches are off (training /
        scoring passes — decode keeps the sequential path)."""
        from videotgb_tpu.parallel.pipeline import pipeline_apply

        cfg = self.config
        b = x.shape[0]
        stacked = self.variables["params"]["layers"]["layer"]
        bias_b = jnp.broadcast_to(bias, (b, *bias.shape[1:]))

        block = LlamaBlock(cfg, parent=None)  # detached functional block

        def layer_fn(p, tree):
            h, pos, bb = tree
            h2, _ = block.apply({"params": p}, h, pos, bb)
            return (h2, pos, bb)

        x, _, _ = pipeline_apply(layer_fn, stacked, (x, positions, bias_b),
                                 mesh)
        return x

    def init_caches(self, batch: int, max_len: int):
        cfg = self.config
        if cfg.scan_layers:
            one = init_kv_cache(batch, cfg.num_heads, max_len, cfg.head_dim,
                                cfg.dtype)
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x, (cfg.num_layers, *x.shape)).copy(),
                one)
        return [
            init_kv_cache(batch, cfg.num_heads, max_len, cfg.head_dim, cfg.dtype)
            for _ in range(cfg.num_layers)
        ]
