"""Metrics as functional, psum-reducible pytrees.

Ports the reference's torchmetrics gadgets (reference: src/gadgets/my_metrics.py)
to pure functions over accumulator dicts. States are jnp arrays, so under GSPMD
a batch-sharded update reduces globally for free; for explicit multi-host
reduction use :func:`all_reduce_state` inside a shard_map/pmap context.

  Accuracy  — my_metrics.py:6-38   (argmax / top-k over -100-masked targets)
  IoU       — my_metrics.py:40-111 (span mean-IoU + IoU>=0.3 / >=0.5 rates)
  MeanMetric— my_metrics.py:114-129 (running scalar mean; torchmetrics MeanMetric)
  rouge_n   — my_metrics.py:131-179 (token-recall pseudo-label scorer; host-side)
  bleu1     — torchmetrics BLEUScore(n_gram=1) used as val/score
              (reference: LSTP_SF_blip2_module.py:107-119)
"""

from __future__ import annotations

import collections
import math
from typing import Iterable, Mapping

import jax
import jax.numpy as jnp

State = dict[str, jax.Array]
IGNORE_INDEX = -100


# ---------------------------------------------------------------- mean metric
def mean_init() -> State:
    return {"total": jnp.zeros(()), "count": jnp.zeros(())}


def mean_update(state: State, value: jax.Array, weight: jax.Array | float = 1.0) -> State:
    return {
        "total": state["total"] + jnp.asarray(value, jnp.float32) * weight,
        "count": state["count"] + jnp.asarray(weight, jnp.float32),
    }


def mean_compute(state: State) -> jax.Array:
    return state["total"] / jnp.maximum(state["count"], 1.0)


# ------------------------------------------------------------------- accuracy
def accuracy_init() -> State:
    return {"correct": jnp.zeros(()), "total": jnp.zeros(())}


def accuracy_update(state: State, logits: jax.Array, target: jax.Array, topk: int = 1) -> State:
    """logits (N, C) or predictions (N,); targets (N,) with -100 = ignore."""
    valid = target != IGNORE_INDEX
    if logits.ndim == 2:
        if topk == 1:
            preds = jnp.argmax(logits, axis=-1)
            hit = preds == target
        else:
            top = jax.lax.top_k(logits, topk)[1]
            hit = jnp.any(top == target[:, None], axis=-1)
    else:
        hit = logits == target
    return {
        "correct": state["correct"] + jnp.sum(jnp.where(valid, hit, False)),
        "total": state["total"] + jnp.sum(valid),
    }


def accuracy_compute(state: State) -> jax.Array:
    return state["correct"] / jnp.maximum(state["total"], 1.0)


# ------------------------------------------------------------------ span IoU
def iou_init() -> State:
    return {
        "correct": jnp.zeros(()),
        "correct_3": jnp.zeros(()),
        "correct_5": jnp.zeros(()),
        "total": jnp.zeros(()),
    }


def span_iou(
    start_pred: jax.Array,
    end_pred: jax.Array,
    start_target: jax.Array,
    end_target: jax.Array,
) -> jax.Array:
    """Elementwise span IoU with the reference's exact branch structure
    (my_metrics.py:89-107): exact match -> 1; disjoint (start_pred >= end_target
    or end_pred <= start_target) -> 0; else inclusive-interval IoU."""
    exact = (start_pred == start_target) & (end_pred == end_target)
    disjoint = (start_pred >= end_target) | (end_pred <= start_target)
    ll = jnp.minimum(start_pred, start_target)
    lr = jnp.maximum(start_pred, start_target)
    rr = jnp.maximum(end_pred, end_target)
    rl = jnp.minimum(end_pred, end_target)
    inter = jnp.maximum(rl - lr + 1, 0).astype(jnp.float32)
    union = (rr - ll + 1).astype(jnp.float32)
    iou = inter / jnp.maximum(union, 1.0)
    return jnp.where(exact, 1.0, jnp.where(disjoint, 0.0, iou))


def iou_update(
    state: State,
    start_logits: jax.Array,
    end_logits: jax.Array,
    start_target: jax.Array,
    end_target: jax.Array,
) -> State:
    """start/end_logits (B, L); targets (B,) with -100 = ignore."""
    valid = (start_target != IGNORE_INDEX) & (end_target != IGNORE_INDEX)
    start_pred = jnp.argmax(start_logits, axis=-1)
    end_pred = jnp.argmax(end_logits, axis=-1)
    iou = span_iou(start_pred, end_pred, start_target, end_target)
    iou = jnp.where(valid, iou, 0.0)
    return {
        "correct": state["correct"] + jnp.sum(iou),
        "correct_3": state["correct_3"] + jnp.sum(jnp.where(valid, iou >= 0.3, False)),
        "correct_5": state["correct_5"] + jnp.sum(jnp.where(valid, iou >= 0.5, False)),
        "total": state["total"] + jnp.sum(valid),
    }


def iou_compute(state: State) -> tuple[jax.Array, jax.Array, jax.Array]:
    total = jnp.maximum(state["total"], 1.0)
    return state["correct"] / total, state["correct_3"] / total, state["correct_5"] / total


# ----------------------------------------------------------------- reduction
def all_reduce_state(state: State, axis_names) -> State:
    """psum every accumulator across mesh axes (inside shard_map/pmap)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_names), state)


# ------------------------------------------------------- host-side text metrics
def rouge_n(
    gold: str | list[str],
    pred: str | list[str],
    ignore: tuple[str, ...] | None = (",", "."),
) -> float | list[float]:
    """Token-recall scorer used to build pseudo span labels.

    Faithful port of my_metrics.py:131-179 including its batch-size division
    quirk in the list branch (each pairwise score is divided by len(gold));
    the downstream monotone-stack span extraction is invariant to that uniform
    scale, see videotgb_tpu.ops.span.
    """
    if isinstance(gold, list):
        scores = []
        for g, p in zip(gold, pred):
            g_tokens, p_tokens = g.split(), p.split()
            hit, total = 0, 0
            for token in g_tokens:
                if ignore is not None and token in ignore:
                    continue
                if token in p_tokens:
                    hit += 1
                total += 1
            score = hit / total if total else 0.0
            if len(gold) > 0:
                score /= len(gold)
            scores.append(score)
        return scores
    g_tokens, p_tokens = gold.split(), pred.split()
    hit, total = 0, 0
    for token in g_tokens:
        if ignore is not None and token in ignore:
            continue
        if token in p_tokens:
            hit += 1
        total += 1
    return hit / total if total else 0.0


def bleu1(preds: Iterable[str], targets: Iterable[Iterable[str] | str]) -> float:
    """Corpus BLEU with unigram precision only (torchmetrics
    BLEUScore(n_gram=1) semantics), the reference's val/test "score"."""
    pred_len = 0
    target_len = 0
    numerator = 0
    denominator = 0
    for pred, refs in zip(preds, targets):
        if isinstance(refs, str):
            refs = [refs]
        pred_tokens = pred.split()
        ref_token_lists = [r.split() for r in refs]
        pred_len += len(pred_tokens)
        # closest reference length
        if ref_token_lists:
            target_len += min(
                (abs(len(r) - len(pred_tokens)), len(r)) for r in ref_token_lists
            )[1]
        pred_counts = collections.Counter(pred_tokens)
        max_ref_counts: collections.Counter = collections.Counter()
        for r in ref_token_lists:
            for tok, cnt in collections.Counter(r).items():
                max_ref_counts[tok] = max(max_ref_counts[tok], cnt)
        numerator += sum(min(cnt, max_ref_counts[tok]) for tok, cnt in pred_counts.items())
        denominator += len(pred_tokens)
    if denominator == 0 or numerator == 0:
        return 0.0
    precision = numerator / denominator
    brevity = 1.0 if pred_len > target_len else math.exp(1 - target_len / max(pred_len, 1))
    return brevity * precision


# ------------------------------------------------------------- metric bundles
class MetricBag:
    """A named collection of metric states with uniform reset/compute, the
    stand-in for the per-module torchmetrics attributes
    (reference: LSTP_SF_blip2_module.py:107-119)."""

    INITS = {"mean": mean_init, "accuracy": accuracy_init, "iou": iou_init}
    COMPUTES = {"mean": mean_compute, "accuracy": accuracy_compute, "iou": iou_compute}

    def __init__(self, spec: Mapping[str, str]):
        self.spec = dict(spec)
        self.states: dict[str, State] = {}
        self.reset()

    def reset(self) -> None:
        self.states = {name: self.INITS[kind]() for name, kind in self.spec.items()}

    def compute(self) -> dict[str, object]:
        return {
            name: jax.tree.map(float, self.COMPUTES[self.spec[name]](state))
            for name, state in self.states.items()
        }
