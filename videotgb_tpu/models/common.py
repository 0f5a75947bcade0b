"""Shared flax building blocks with logical-axis sharding annotations.

Every dense/embed kernel carries logical axis names ("embed", "mlp", "heads",
"kv", "vocab") that videotgb_tpu.parallel.sharding maps onto the (dp, fsdp,
tp) mesh — this is where the framework's tensor/FSDP parallelism plugs into
every model family, replacing the reference's replicate-everything DDP.

Attention is a single module reused by all towers (ViT, Q-Former, T5, LLaMA,
TGB) with hooks for: cross-attention K/V sources, RoPE (either flavour),
additive bias, T5-style unscaled scores, and an explicit functional KV cache
(a {"k","v"} dict threaded through decode loops — no mutable collections, so
jit decode stays purely functional).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.ops.attention import dot_product_attention, flash_attention

Dtype = Any
KVCache = dict[str, jax.Array]  # {"k": (B,H,Smax,D), "v": (B,H,Smax,D)}

default_kernel_init = nn.initializers.normal(stddev=0.02)


class QuantDense(nn.Module):
    """Drop-in nn.Dense with the matmul on the int8 MXU (ops.quant W8A8
    dynamic). Identical parameter structure/names to nn.Dense, so existing
    checkpoints and converters load unchanged; serving-only (no custom vjp)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from videotgb_tpu.ops.quant import int8_matmul

        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        y = int8_matmul(x.astype(self.dtype), kernel.astype(self.dtype),
                        out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


def dense(
    features: int,
    axes: tuple[str | None, ...],
    use_bias: bool = True,
    dtype: Dtype = jnp.float32,
    param_dtype: Dtype = jnp.float32,
    kernel_init: Callable = default_kernel_init,
    name: str | None = None,
    quant: str | None = None,
) -> nn.Module:
    if quant == "int8":
        return QuantDense(
            features,
            use_bias=use_bias,
            dtype=dtype,
            param_dtype=param_dtype,
            kernel_init=nn.with_partitioning(kernel_init, axes),
            name=name,
        )
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        kernel_init=nn.with_partitioning(kernel_init, axes),
        name=name,
    )


def embed(
    num: int,
    features: int,
    dtype: Dtype = jnp.float32,
    param_dtype: Dtype = jnp.float32,
    name: str | None = None,
) -> nn.Embed:
    return nn.Embed(
        num,
        features,
        dtype=dtype,
        param_dtype=param_dtype,
        embedding_init=nn.with_partitioning(default_kernel_init, ("vocab", "embed")),
        name=name,
    )


class RMSNorm(nn.Module):
    """T5LayerNorm / LLaMA RMSNorm: no mean subtraction, no bias."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param(
            "scale",
            nn.with_partitioning(nn.initializers.ones, ("embed",)),
            (x.shape[-1],),
            self.param_dtype,
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        return (normed * scale.astype(jnp.float32)).astype(self.dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm with sharding-annotated scale/bias (flat params)."""

    eps: float = 1e-12
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param(
            "scale", nn.with_partitioning(nn.initializers.ones, ("embed",)),
            (dim,), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.with_partitioning(nn.initializers.zeros, ("embed",)),
            (dim,), self.param_dtype,
        )
        # Single read pass: E[x] and E[x^2] reduce together in one f32
        # fusion (two-pass mean/var materializes an f32 copy of the bf16
        # stream — measured ~0.9 ms/layer of reduce+copy fat in ViT-g on
        # v5e). f32 accumulation keeps the E[x^2]-E[x]^2 cancellation well
        # under the 2e-4 parity-test tolerance at LN-input scales.
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        meansq = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        out = (x32 - mean) * (inv * scale.astype(jnp.float32)) \
            + bias.astype(jnp.float32)
        return out.astype(self.dtype)


def init_kv_cache(
    batch: int, heads: int, max_len: int, head_dim: int, dtype: Dtype
) -> KVCache:
    return {
        "k": jnp.zeros((batch, heads, max_len, head_dim), dtype),
        "v": jnp.zeros((batch, heads, max_len, head_dim), dtype),
    }


class MultiHeadAttention(nn.Module):
    """Unified attention used by every tower.

    Cross-attention passes ``x_kv`` (keys/values source, possibly a different
    width — the TGB's cross-attn reads encoder_width inputs, reference
    xropebert.py:226-231). RoPE hooks receive/return (B, H, S, D).
    """

    num_heads: int
    head_dim: int
    out_features: int | None = None
    use_bias: bool = True
    scale: float | None = None  # None -> 1/sqrt(head_dim); T5 passes 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_flash: bool = True
    # False = the additive bias is a constant mask (padding/causal): the
    # fused flash backward skips materializing its cotangent. Keep True for
    # learned biases (T5 relative-position).
    bias_grad: bool = True
    # LoRA on q/v projections (peft parity: r=8, alpha=32 on the LLM towers,
    # reference LSTP_Blip2_IVT_module.py:184-188)
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_targets: tuple = ("q", "v")
    # "int8" routes the q/k/v/o projections through the int8 MXU (serving)
    quant: str | None = None

    @nn.compact
    def __call__(
        self,
        x_q: jax.Array,
        x_kv: jax.Array | None = None,
        bias: jax.Array | None = None,
        rope_q: Callable[[jax.Array], jax.Array] | None = None,
        rope_k: Callable[[jax.Array], jax.Array] | None = None,
        cache: KVCache | None = None,
        cache_index: jax.Array | None = None,
        cross_cached: bool = False,
        return_kv: bool = False,
    ) -> tuple[jax.Array, KVCache | None]:
        """Returns (out (B,Sq,out_features), updated cache or None).

        Cache semantics:
          * self-attn decode (``cache`` given): new K/V written at
            [cache_index : +Sq], attends over the whole cache buffer (caller's
            bias must mask invalid positions).
          * cross-attn read (``cross_cached=True``): cache holds the fully
            precomputed encoder K/V; x_kv is ignored.
          * cross-attn prefill (``return_kv=True``, no cache): the freshly
            projected K/V are returned as a cache for later reads.
        """
        features = x_q.shape[-1]
        out_features = self.out_features or features
        x_kv = x_q if x_kv is None else x_kv

        def proj(x, name):
            y = dense(
                self.num_heads * self.head_dim,
                ("embed", "heads"),
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=name,
                quant=self.quant,
            )(x)
            if self.lora_rank > 0 and name in self.lora_targets:
                from videotgb_tpu.models.lora import LoRADelta

                y = y + LoRADelta(
                    self.num_heads * self.head_dim, self.lora_rank,
                    self.lora_alpha, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"{name}_lora",
                )(x)
            return y.reshape(*y.shape[:-1], self.num_heads, self.head_dim).transpose(
                0, 2, 1, 3
            )

        q = proj(x_q, "q")
        if cache is not None and cross_cached:
            k, v = cache["k"], cache["v"]
            new_cache = cache
        else:
            k = proj(x_kv, "k")
            v = proj(x_kv, "v")
            if rope_k is not None:
                k = rope_k(k)
            new_cache = None
            if cache is not None:
                idx = 0 if cache_index is None else cache_index
                ck = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, 0, idx, 0)
                )
                cv = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, 0, idx, 0)
                )
                new_cache = {"k": ck, "v": cv}
                k, v = ck, cv
            elif return_kv:
                new_cache = {"k": k, "v": v}
        if rope_q is not None:
            q = rope_q(q)

        scale = self.scale if self.scale is not None else self.head_dim ** -0.5
        small = q.shape[2] * k.shape[2] <= 128 * 128
        if self.use_flash and not small:
            ctx = flash_attention(q, k, v, bias=bias, scale=scale,
                                  bias_needs_grad=self.bias_grad)
        else:
            ctx = dot_product_attention(q, k, v, bias=bias, scale=scale)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(
            *x_q.shape[:-1], self.num_heads * self.head_dim
        )
        out = dense(
            out_features,
            ("heads", "embed"),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="o",
            quant=self.quant,
        )(ctx)
        return out, new_cache


class Mlp(nn.Module):
    """Transformer FFN. ``gated=True`` gives the flan-T5/LLaMA two-matrix gate."""

    hidden: int
    act: str = "gelu"
    gated: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    quant: str | None = None  # "int8" -> serving W8A8 matmuls

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        # "gelu" = exact erf (HF nn.GELU); "gelu_new" = tanh approximation
        # (HF NewGELUActivation, used by flan-T5)
        act = {
            "gelu": lambda x: nn.gelu(x, approximate=False),
            "gelu_new": lambda x: nn.gelu(x, approximate=True),
            "relu": nn.relu,
            "silu": nn.silu,
        }[self.act]
        kw = dict(use_bias=self.use_bias, dtype=self.dtype,
                  param_dtype=self.param_dtype, quant=self.quant)
        h = act(dense(self.hidden, ("embed", "mlp"), name="wi", **kw)(x))
        if self.gated:
            h = h * dense(self.hidden, ("embed", "mlp"), name="wi_1", **kw)(x)
        return dense(features, ("mlp", "embed"), name="wo", **kw)(h)


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    """Base hyperparameters shared by the transformer towers."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads
