"""Deterministic RNG-key plumbing.

The reference calls lightning's seed_everything (reference: src/train.py:46-47);
in JAX randomness is explicit, so we thread a fold-in counter stream through
train steps: every step derives fresh, device-independent keys."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RngStream:
    """A named, counted PRNG stream. ``next_key()`` is host-side (eager);
    inside jit use ``fold(step)``."""

    seed: int
    _count: int = 0

    def base_key(self) -> jax.Array:
        return jax.random.key(self.seed)

    def next_key(self) -> jax.Array:
        self._count += 1
        return jax.random.fold_in(self.base_key(), self._count)

    def fold(self, step: jax.Array | int, name: str | None = None) -> jax.Array:
        key = jax.random.fold_in(self.base_key(), jnp.asarray(step, jnp.uint32))
        if name:
            key = jax.random.fold_in(key, _stable_hash(name))
        return key


def _stable_hash(name: str) -> int:
    h = 2166136261
    for ch in name.encode():
        h = (h ^ ch) * 16777619 & 0xFFFFFFFF
    return h


def split_dict(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
