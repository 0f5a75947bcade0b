"""LoRA adapters for the frozen LLM towers.

The reference wraps the LLM with peft LoRA in the IVT stage-3 recipes
(reference: src/models/LSTP_Blip2_IVT_module.py:184-188 — r=8, alpha=32,
dropout 0.1, task SEQ_2_SEQ_LM targeting T5's q/v projections;
LSTP_Vicuna_IVT_module.py:182-186 — CAUSAL_LM targeting q_proj/v_proj).

Here LoRA is a first-class low-rank delta on the attention q/v projections:
``y = W x + (alpha / r) * B (A x)``, with A ~ N(0, 0.02), B = 0, so the
wrapped model starts exactly at the base model. The adapter params live under
their own names ("lora_a"/"lora_b") so the optimizer freeze-mask
(training.optim.trainable_mask) can select exactly them — the TPU analogue of
peft's requires_grad surgery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from videotgb_tpu.models.common import Dtype


class LoRADelta(nn.Module):
    """The low-rank delta only (added to a base projection's output)."""

    features: int
    rank: int
    alpha: float = 32.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.param(
            "lora_a",
            nn.with_partitioning(nn.initializers.normal(0.02), ("embed", None)),
            (x.shape[-1], self.rank),
            self.param_dtype,
        )
        b = self.param(
            "lora_b",
            nn.with_partitioning(nn.initializers.zeros, (None, "heads")),
            (self.rank, self.features),
            self.param_dtype,
        )
        scale = self.alpha / self.rank
        h = jnp.einsum("...d,dr->...r", x.astype(self.dtype), a.astype(self.dtype))
        return scale * jnp.einsum("...r,rf->...f", h, b.astype(self.dtype))


def lora_param_filter(path: tuple[str, ...]) -> bool:
    """True for LoRA adapter params (used by optimizer masks)."""
    return any(str(p).startswith("lora_") for p in path)
