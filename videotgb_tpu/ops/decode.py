"""Autoregressive decode loops: greedy, temperature/top-p sampling, beam search.

Replaces HF ``generate`` (used by the reference at e.g. xblip2.py:1774 and
eval/utils/model.py:427-441) with jit-compiled lax.while_loop decoders over
the functional KV caches of models.t5 / models.llama:

* model-agnostic: the caller passes ``step_fn(tokens, caches, index)`` ->
  (logits (B, V), caches) — T5 and LLaMA wrappers live in models.blip2 /
  models.instructblip;
* repetition penalty (HF semantics: divide positive logits / multiply
  negative logits of seen tokens) — reference config
  configs/model/LSTP_SF_blip2.yaml:37-44 uses repetition_penalty 1.5;
* per-sequence early stop on EOS and on *stop sequences* (token-id suffix
  match) — the JAX port of KeywordsStoppingCriteria
  (eval/utils/builder_utils.py:320-346);
* beam search (num_beams, length_penalty) with cache reordering by beam
  gather each step.

Everything is fixed-shape: the output buffer is (B, max_new_tokens) padded
with pad_token_id after EOS.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

StepFn = Callable[[jax.Array, Any, jax.Array], tuple[jax.Array, Any]]
NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    max_new_tokens: int = 128
    eos_token_id: int = 1
    pad_token_id: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    num_beams: int = 1
    length_penalty: float = 1.0
    do_sample: bool = False


def apply_repetition_penalty(
    logits: jax.Array, generated: jax.Array, penalty: float
) -> jax.Array:
    """generated (B, T) token ids (pad entries allowed; they just penalize
    pad, which is masked by EOS handling anyway)."""
    if penalty == 1.0:
        return logits
    b, v = logits.shape
    seen = jnp.zeros((b, v), jnp.bool_)
    seen = seen.at[jnp.arange(b)[:, None], generated].set(True)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep smallest set with cumulative prob >= top_p (always keep top-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(logits >= cutoff, logits, NEG_INF)


def _check_stop_sequences(
    tokens: jax.Array, t: jax.Array, stop_sequences: tuple[tuple[int, ...], ...]
) -> jax.Array:
    """tokens (B, T_max) buffer; position t just written. True where any stop
    sequence is a suffix of tokens[:, :t+1]."""
    b = tokens.shape[0]
    hit = jnp.zeros((b,), jnp.bool_)
    for seq in stop_sequences:
        n = len(seq)
        seq_arr = jnp.asarray(seq, tokens.dtype)
        # window tokens[t-n+1 : t+1] via dynamic slice per sample
        start = jnp.maximum(t - n + 1, 0)
        window = jax.lax.dynamic_slice_in_dim(tokens, start, n, axis=1)
        match = jnp.all(window == seq_arr[None, :], axis=-1) & (t >= n - 1)
        hit = hit | match
    return hit


def decode(
    step_fn: StepFn,
    caches: Any,
    start_tokens: jax.Array,  # (B,) first decoder input token
    config: DecodeConfig,
    start_index: jax.Array | int = 0,
    key: jax.Array | None = None,
    stop_sequences: tuple[tuple[int, ...], ...] = (),
) -> jax.Array:
    """Greedy / sampling decode. Returns (B, max_new_tokens) generated ids
    (the tokens *after* start_tokens), padded with pad_token_id."""
    b = start_tokens.shape[0]
    cfg = config
    tokens = jnp.full((b, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
    finished = jnp.zeros((b,), jnp.bool_)
    key = key if key is not None else jax.random.key(0)
    start_index = jnp.asarray(start_index, jnp.int32)

    def cond(state):
        t, _, _, finished, _, _ = state
        return (t < cfg.max_new_tokens) & ~jnp.all(finished)

    def body(state):
        t, cur, caches, finished, tokens, key = state
        logits, caches = step_fn(cur[:, None], caches, start_index + t)
        logits = logits.astype(jnp.float32)
        logits = apply_repetition_penalty(logits, tokens, cfg.repetition_penalty)
        if cfg.do_sample:
            key, sub = jax.random.split(key)
            scaled = logits / jnp.maximum(cfg.temperature, 1e-6)
            scaled = _top_p_filter(scaled, cfg.top_p)
            nxt = jax.random.categorical(sub, scaled, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt).astype(jnp.int32)
        tokens = tokens.at[:, t].set(nxt)
        newly_done = (nxt == cfg.eos_token_id)
        if stop_sequences:
            newly_done = newly_done | _check_stop_sequences(tokens, t, stop_sequences)
        finished = finished | newly_done
        return t + 1, nxt, caches, finished, tokens, key

    state = (jnp.int32(0), start_tokens.astype(jnp.int32), caches, finished, tokens, key)
    final_state = jax.lax.while_loop(cond, body, state)
    return final_state[4]


def beam_search(
    step_fn: StepFn,
    caches: Any,
    start_tokens: jax.Array,  # (B,)
    config: DecodeConfig,
    start_index: jax.Array | int = 0,
    cache_batch_axis: int = 0,
) -> jax.Array:
    """Beam search. Caches must already be laid out with batch B*num_beams
    (tile the batch before building them). Returns (B, max_new_tokens).

    ``cache_batch_axis``: which axis of every cache leaf carries the batch
    (1 for scan_layers models whose caches stack a leading layer axis)."""
    cfg = config
    b = start_tokens.shape[0]
    k = cfg.num_beams
    bk = b * k
    start_index = jnp.asarray(start_index, jnp.int32)

    tokens = jnp.full((bk, cfg.max_new_tokens), cfg.pad_token_id, jnp.int32)
    # beam 0 active, others -inf so the first expansion seeds distinct tokens
    scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (k - 1)), (b,))  # (bk,)
    finished = jnp.zeros((bk,), jnp.bool_)
    cur = jnp.repeat(start_tokens.astype(jnp.int32), k)

    def cond(state):
        t, _, _, finished, _, _ = state
        return (t < cfg.max_new_tokens) & ~jnp.all(finished)

    def body(state):
        t, cur, caches, finished, tokens, scores = state
        logits, caches = step_fn(cur[:, None], caches, start_index + t)
        logits = logits.astype(jnp.float32)
        logits = apply_repetition_penalty(logits, tokens, cfg.repetition_penalty)
        logp = jax.nn.log_softmax(logits, axis=-1)  # (bk, V)
        v = logp.shape[-1]
        # finished beams only extend with pad at no cost
        pad_only = jnp.full((v,), NEG_INF).at[cfg.pad_token_id].set(0.0)
        logp = jnp.where(finished[:, None], pad_only[None, :], logp)

        cand = scores[:, None] + logp  # (bk, V)
        cand = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # (b, k)
        beam_idx = top_idx // v  # source beam within group
        tok_idx = top_idx % v
        flat_src = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)  # (bk,)

        # reorder everything by chosen source beam
        tokens = tokens[flat_src]
        finished = finished[flat_src]
        caches = jax.tree.map(
            lambda c: jnp.take(c, flat_src, axis=cache_batch_axis), caches)
        nxt = tok_idx.reshape(-1).astype(jnp.int32)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt)
        tokens = tokens.at[:, t].set(nxt)
        finished = finished | (nxt == cfg.eos_token_id)
        scores = top_scores.reshape(-1)
        return t + 1, nxt, caches, finished, tokens, scores

    state = (jnp.int32(0), cur, caches, finished, tokens, scores)
    t, cur, caches, finished, tokens, scores = jax.lax.while_loop(cond, body, state)

    # finalize: length-penalized best beam per sample
    lengths = jnp.sum(tokens != cfg.pad_token_id, axis=-1).astype(jnp.float32)
    norm = scores / jnp.maximum(lengths, 1.0) ** cfg.length_penalty
    best = jnp.argmax(norm.reshape(b, k), axis=-1)  # (b,)
    return tokens.reshape(b, k, -1)[jnp.arange(b), best]
