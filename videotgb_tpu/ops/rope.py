"""Rotary position embeddings, both flavours used by the framework.

* RoFormer/interleaved — used by the Temporal Grounding Bridge's RoPE-BERT
  (reference: src/models/components/xropebert.py:334-377, table built at
  :142-173). Pairs are adjacent lanes (q0,q1), (q2,q3), ...; the sin/cos
  table is stored [sin | cos] halves but expanded to interleaved on apply.
  This rotation over the *frame axis* is what gives the TGB its temporal
  length extrapolation (the paper's title claim, SURVEY.md section 5.7).

* LLaMA/half-split — used by the Vicuna-7B decoder: pairs are
  (q_i, q_{i+d/2}), the standard GPT-NeoX layout.

Both are pure jnp; XLA fuses them into the surrounding attention matmuls,
so no Pallas kernel is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roformer_sincos_table(max_len: int, dim: int, base: float = 10000.0) -> jax.Array:
    """[sin(pos*f_0..f_{d/2-1}) | cos(...)] table, shape (max_len, dim).

    Matches BertSinusoidalPositionalEmbedding._init_weight
    (xropebert.py:149-163): inv_freq_k = base^(-2k/dim), sin half then cos half.
    """
    half = dim // 2
    inv_freq = base ** (-2.0 * jnp.arange(half, dtype=jnp.float32) / dim)
    angles = jnp.arange(max_len, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def roformer_rope(x: jax.Array, sincos: jax.Array) -> jax.Array:
    """Apply interleaved rotary embedding.

    x: (..., seq, dim); sincos: (seq, dim) from :func:`roformer_sincos_table`.
    Port of RopeBertSelfAttention.apply_rotary_position_embeddings
    (xropebert.py:334-360): sin/cos halves are duplicated into
    [s0,s0,s1,s1,...], rotate-half is [-x1,x0,-x3,x2,...].
    """
    dim = x.shape[-1]
    half = dim // 2
    sin, cos = sincos[..., :half], sincos[..., half:]
    # [s0,s0,s1,s1,...]
    sin_pos = jnp.stack([sin, sin], axis=-1).reshape(*sincos.shape[:-1], dim)
    cos_pos = jnp.stack([cos, cos], axis=-1).reshape(*sincos.shape[:-1], dim)
    x_pairs = x.reshape(*x.shape[:-1], half, 2)
    rotated = jnp.stack([-x_pairs[..., 1], x_pairs[..., 0]], axis=-1).reshape(x.shape)
    return (x * cos_pos + rotated * sin_pos).astype(x.dtype)


def llama_rope(
    x: jax.Array,
    positions: jax.Array,
    base: float = 10000.0,
) -> jax.Array:
    """Half-split rotary embedding (LLaMA/Vicuna layout).

    x: (batch, seq, heads, dim); positions: (batch, seq) absolute positions
    (so KV-cache decode passes the cache offset).
    """
    dim = x.shape[-1]
    half = dim // 2
    inv_freq = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (b, s, half)
    sin = jnp.sin(angles)[:, :, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
