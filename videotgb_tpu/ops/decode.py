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


def _insert_hypothesis(d_scores, d_tokens, d_count, accept, score, hyp, k):
    """Conditionally insert one hypothesis per sample into the k-slot done
    set, replacing the current worst (HF BeamHypotheses.add: keep the best k
    by length-penalized score; empty slots hold NEG_INF so argmin fills them
    first)."""
    worst = jnp.argmin(d_scores, axis=1)  # (b,)
    worst_score = jnp.min(d_scores, axis=1)
    accept = accept & ((d_count < k) | (score > worst_score))
    slot = jax.nn.one_hot(worst, k, dtype=jnp.bool_) & accept[:, None]
    d_scores = jnp.where(slot, score[:, None], d_scores)
    d_tokens = jnp.where(slot[..., None], hyp[:, None, :], d_tokens)
    d_count = jnp.minimum(d_count + accept.astype(jnp.int32), k)
    return d_scores, d_tokens, d_count


def beam_search(
    step_fn: StepFn,
    caches: Any,
    start_tokens: jax.Array,  # (B,)
    config: DecodeConfig,
    start_index: jax.Array | int = 0,
    cache_batch_axis: int = 0,
    penalty_length_offset: int = 1,
) -> jax.Array:
    """Beam search with HF done-hypotheses semantics (transformers
    BeamSearchScorer / BeamHypotheses, early_stopping=False — the decode
    config the reference evaluates with, configs/model/LSTP_SF_blip2.yaml:37-44):

    * each step ranks the top 2k candidates of (beam score + logp);
    * candidates ending in EOS that rank within the top k retire into a
      per-sample done set, scored sum_logprobs / cur_len**length_penalty at
      the step they finish (NOT kept alive to the horizon);
    * the k best non-EOS candidates continue as live beams;
    * a sample stops once k hypotheses are done and the best live
      continuation can no longer beat the worst done score;
    * at the horizon, live beams of unfinished samples join the done set and
      the best *done* hypothesis is returned — so a beam that finished early
      with a better normalized score wins over any live beam.

    Caches must already be laid out with batch B*num_beams (tile the batch
    before building them). Returns (B, max_new_tokens), EOS written at the
    finishing position, pad after.

    ``cache_batch_axis``: which axis of every cache leaf carries the batch
    (1 for scan_layers models whose caches stack a leading layer axis).
    ``penalty_length_offset``: normalization offset such that a hypothesis
    finishing at step t is scored sum_logprobs / (t + offset)**length_penalty.
    transformers >= 4.33 normalizes by generated length only
    (cur_len + 1 - decoder_prompt_len) for BOTH encoder-decoder and
    decoder-only models, so the offset is 1 in either case.
    """
    cfg = config
    b = start_tokens.shape[0]
    k = cfg.num_beams
    bk = b * k
    T = cfg.max_new_tokens
    start_index = jnp.asarray(start_index, jnp.int32)
    batch_iota = jnp.arange(b)

    tokens = jnp.full((bk, T), cfg.pad_token_id, jnp.int32)
    # beam 0 active, others -inf so the first expansion seeds distinct tokens
    scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (k - 1)), (b,))  # (bk,)
    cur = jnp.repeat(start_tokens.astype(jnp.int32), k)
    d_scores = jnp.full((b, k), NEG_INF, jnp.float32)
    d_tokens = jnp.full((b, k, T), cfg.pad_token_id, jnp.int32)
    d_count = jnp.zeros((b,), jnp.int32)
    b_done = jnp.zeros((b,), jnp.bool_)

    def cond(state):
        t = state[0]
        return (t < T) & ~jnp.all(state[8])

    def body(state):
        t, cur, caches, tokens, scores, d_scores, d_tokens, d_count, b_done = state
        logits, caches = step_fn(cur[:, None], caches, start_index + t)
        logits = logits.astype(jnp.float32)
        logits = apply_repetition_penalty(logits, tokens, cfg.repetition_penalty)
        logp = jax.nn.log_softmax(logits, axis=-1)  # (bk, V)
        v = logp.shape[-1]
        cand = (scores[:, None] + logp).reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, 2 * k)  # (b, 2k)
        src2k = top_idx // v  # source beam within group
        tok2k = (top_idx % v).astype(jnp.int32)
        is_eos = tok2k == cfg.eos_token_id
        pen = jnp.float32(t + penalty_length_offset) ** cfg.length_penalty

        # retire EOS candidates ranked within the top k (HF skips lower ranks)
        for j in range(k):
            src_j = batch_iota * k + src2k[:, j]
            hyp_j = tokens[src_j].at[:, t].set(cfg.eos_token_id)  # (b, T)
            d_scores, d_tokens, d_count = _insert_hypothesis(
                d_scores, d_tokens, d_count,
                is_eos[:, j] & ~b_done, top_scores[:, j] / pen, hyp_j, k)

        # the k best non-EOS candidates continue (2k candidates share at
        # most k EOS entries — one per source beam — so k always remain)
        rank_live = jnp.cumsum((~is_eos).astype(jnp.int32), axis=1) - 1
        sel = []
        for s in range(k):
            j_s = jnp.argmax((~is_eos) & (rank_live == s), axis=1)  # (b,)
            take = lambda a: jnp.take_along_axis(a, j_s[:, None], axis=1)[:, 0]
            sel.append((take(top_scores), take(src2k), take(tok2k)))
        new_scores = jnp.stack([s[0] for s in sel], axis=1)  # (b, k)
        src_sel = jnp.stack([s[1] for s in sel], axis=1)
        tok_sel = jnp.stack([s[2] for s in sel], axis=1)

        # finished samples freeze: beams stay in place extending with pad
        beam_iota = jnp.arange(k)[None, :]
        src_sel = jnp.where(b_done[:, None], beam_iota, src_sel)
        tok_sel = jnp.where(b_done[:, None], cfg.pad_token_id, tok_sel)
        new_scores = jnp.where(b_done[:, None], scores.reshape(b, k), new_scores)

        flat_src = (batch_iota[:, None] * k + src_sel).reshape(-1)  # (bk,)
        tokens = tokens[flat_src]
        caches = jax.tree.map(
            lambda c: jnp.take(c, flat_src, axis=cache_batch_axis), caches)
        nxt = tok_sel.reshape(-1).astype(jnp.int32)
        tokens = tokens.at[:, t].set(nxt)
        scores = new_scores.reshape(-1)

        # HF early-stop heuristic (early_stopping=False): stop once the best
        # *live* beam's score, normalized at the current length, can no
        # longer beat the worst of k done hypotheses (transformers
        # _check_early_stop_heuristic uses running_beam_scores[:, :1] — the
        # surviving non-EOS beams, not the raw top candidate)
        best_possible = new_scores[:, 0] / pen
        b_done = b_done | ((d_count >= k) & (jnp.min(d_scores, axis=1) >= best_possible))
        return t + 1, nxt, caches, tokens, scores, d_scores, d_tokens, d_count, b_done

    state = (jnp.int32(0), cur, caches, tokens, scores,
             d_scores, d_tokens, d_count, b_done)
    (t, _, _, tokens, scores, d_scores, d_tokens, d_count, b_done) = (
        jax.lax.while_loop(cond, body, state))

    # finalize: live beams of unfinished samples join the done set. In HF's
    # vectorized beam search, hitting max_length counts as a stopping
    # criterion *inside* the last step, so horizon hypotheses normalize by
    # the same (cur_len + 1 - decoder_prompt_len) = T as that step's EOS
    # retirements — hence t - 1 + offset, not t + offset.
    pen = jnp.float32(t - 1 + penalty_length_offset) ** cfg.length_penalty
    scores_bk = scores.reshape(b, k)
    tokens_bk = tokens.reshape(b, k, T)
    for s in range(k):
        d_scores, d_tokens, d_count = _insert_hypothesis(
            d_scores, d_tokens, d_count, ~b_done, scores_bk[:, s] / pen,
            tokens_bk[:, s], k)
    best = jnp.argmax(d_scores, axis=1)  # (b,)
    return d_tokens[batch_iota, best]
