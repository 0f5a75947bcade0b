"""Optimizer factory: AdamW + cosine-warmup schedule + parameter freezing.

The reference configures torch AdamW via hydra partials and HF's
get_cosine_schedule_with_warmup from trainer.max_steps with a 5% warmup ratio
(reference: src/models/LSTP_SF_blip2_module.py:613-659), and freezes towers
by flipping requires_grad (:663-668). Here freezing is an optax mask: frozen
subtrees get set_to_zero updates, so optimizer state for them is never
allocated (the memory win matters for the frozen ViT-g/LLM on TPU).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import optax


def cosine_warmup_schedule(
    lr: float, total_steps: int, warmup_ratio: float = 0.05
) -> optax.Schedule:
    """Linear warmup then cosine decay to 0 (HF get_cosine_schedule_with_warmup)."""
    warmup_steps = max(int(total_steps * warmup_ratio), 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=0.0,
    )


def path_freeze_filter(
    freeze_prefixes: Sequence[str] = (),
    train_prefixes: Sequence[str] | None = None,
    train_lora_only: bool = False,
) -> Callable[[tuple, Any], bool]:
    """Returns f(path, leaf) -> True if trainable.

    * ``train_prefixes`` given: only those subtrees train (IV recipe:
      qformer + projections only).
    * else: everything except ``freeze_prefixes`` (SF recipe: freeze
      vision_model).
    * ``train_lora_only``: additionally train any LoRA adapter params wherever
      they live (IVT recipes).
    """

    def joined(path: tuple) -> str:
        return "/".join(str(getattr(p, "key", p)) for p in path)

    def is_lora(path: tuple) -> bool:
        return any(str(getattr(p, "key", p)).endswith("_lora") or
                   str(getattr(p, "key", p)).startswith("lora_") for p in path)

    def fn(path: tuple, leaf: Any) -> bool:
        name = joined(path)
        if train_lora_only and is_lora(path):
            return True
        if train_prefixes is not None:
            return any(name.startswith(p) for p in train_prefixes)
        return not any(name.startswith(p) for p in freeze_prefixes)

    return fn


def trainable_mask(params: Any, filter_fn: Callable[[tuple, Any], bool]) -> Any:
    return jax.tree_util.tree_map_with_path(filter_fn, params)


def make_optimizer(
    params: Any,
    lr: float | optax.Schedule,
    weight_decay: float = 0.0,
    filter_fn: Callable[[tuple, Any], bool] | None = None,
    max_grad_norm: float | None = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> tuple[optax.GradientTransformation, Any]:
    """Returns (tx, trainable_mask_tree)."""
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay))
    tx = optax.chain(*chain)
    if filter_fn is None:
        return tx, jax.tree.map(lambda _: True, params)
    mask = trainable_mask(params, filter_fn)
    label = jax.tree.map(lambda t: "train" if t else "freeze", mask)
    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label
    )
    return tx, mask
