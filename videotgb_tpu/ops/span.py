"""Pseudo-label span extraction: largest rectangle under the score histogram.

The self-refinement recipe scores each of the 32 candidate frames by how well
the frozen MLLM answers from that frame alone (rouge_n recall), then converts
the per-frame score profile into a (start, end) span via the monotone-stack
largest-rectangle algorithm (reference: LSTP_SF_blip2_module.py:196-217):

    score <- score - min(score); pad a 0 sentinel on both sides
    classic largest-rectangle-in-histogram; the widest*highest rectangle's
    footprint [stack_top, i-2] (original indices) becomes the span.

The algorithm is invariant to uniform scaling of the scores, which makes the
reference's rouge_n batch-size-division quirk harmless (see
training.metrics.rouge_n).

Two implementations, golden-tested against each other:
  * :func:`largest_rectangle_span_np` — host-side numpy for the staged data
    pipeline (pseudo_label.json production);
  * :func:`largest_rectangle_span`    — lax.fori_loop/while_loop version that
    runs inside the jitted SF train step (O(F) with an explicit stack; F=32,
    negligible next to the generate pass it postprocesses).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def largest_rectangle_span_np(scores: np.ndarray) -> tuple[int, int]:
    """Reference-faithful host implementation. scores: (F,) floats."""
    scores = np.asarray(scores, dtype=np.float32)
    f = len(scores)
    best = 0.0
    start, end = 0, f - 1
    padded = np.concatenate([[0.0], scores - scores.min(), [0.0]])
    stack: list[int] = []
    for i in range(len(padded)):
        while stack and padded[stack[-1]] > padded[i]:
            top = stack.pop()
            area = (i - stack[-1] - 1) * padded[top]
            if area > best:
                best = area
                start, end = stack[-1], i - 2
        stack.append(i)
    return start, end


def largest_rectangle_span(scores: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Batched jit version. scores: (B, F) -> (starts (B,), ends (B,)) int32."""

    def single(score: jax.Array) -> tuple[jax.Array, jax.Array]:
        f = score.shape[0]
        n = f + 2
        padded = jnp.concatenate(
            [jnp.zeros((1,)), score - jnp.min(score), jnp.zeros((1,))]
        ).astype(jnp.float32)
        # state: stack (n,), sp, best, start, end
        stack0 = jnp.zeros((n,), jnp.int32)
        state0 = (stack0, jnp.int32(0), jnp.float32(0), jnp.int32(0), jnp.int32(f - 1))

        def outer(i, state):
            def pop_cond(s):
                stack, sp, *_ = s
                return (sp > 0) & (padded[stack[sp - 1]] > padded[i])

            def pop_body(s):
                stack, sp, best, start, end = s
                top = stack[sp - 1]
                sp = sp - 1
                left = jnp.where(sp > 0, stack[sp - 1], -1)
                area = (i - left - 1).astype(jnp.float32) * padded[top]
                better = area > best
                best = jnp.where(better, area, best)
                start = jnp.where(better, left, start)
                end = jnp.where(better, i - 2, end)
                return stack, sp, best, start, end

            stack, sp, best, start, end = jax.lax.while_loop(pop_cond, pop_body, state)
            stack = stack.at[sp].set(i)
            return stack, sp + 1, best, start, end

        _, _, _, start, end = jax.lax.fori_loop(0, n, outer, state0)
        return start, end

    starts, ends = jax.vmap(single)(scores.astype(jnp.float32))
    return starts, ends


def rescale_index(
    idx: jax.Array, src_len: jax.Array | int, dst_len: jax.Array | int
) -> jax.Array:
    """Map an index between frame domains: int(idx * (dst-1) / (src-1)).

    Used both to map 32-frame pseudo spans into the flow-length domain
    (LSTP_SF_blip2_module.py:221-227) and flow-domain spans back into the
    32-frame domain (:296). Guards src_len == 1.
    """
    src = jnp.maximum(jnp.asarray(src_len, jnp.int32) - 1, 1)
    dst = jnp.asarray(dst_len, jnp.int32) - 1
    return (jnp.asarray(idx, jnp.int32) * dst) // src
