"""Question-conditioned frame selection as a fixed-size vectorized gather.

The reference selects frames with a python loop per sample (reference:
LSTP_SF_blip2_module.py:266-314 and eval/utils/model.py:102-151):

  1. draw top_k=2 (start, end) candidates from the TGB span logits with
     Gumbel-softmax (tau=0.5) + argmax;
  2. sanitize each candidate (start/end beyond the flow length, or the
     degenerate (0,0) pair, fall back to the full span);
  3. rescale flow-domain indices into the 32-frame domain and take the union
     of the [start, end] ranges;
  4. if empty -> all frames; while shorter than nframe -> duplicate every
     element; if longer -> uniform midpoint re-sampling via
     np.linspace(0, len, nframe+1) interval midpoints.

XLA requires static shapes, so steps 3-4 are re-derived here as closed-form
index arithmetic over a boolean frame mask (SURVEY.md section 7.1):
duplicating every element d times and indexing position p of the duplicated
list equals indexing position p // 2**d of the original, so the whole
"duplicate then midpoint-sample" dance is a single gather with computed
indices. `select_frames_reference_np` keeps the loop version as the golden
oracle and both are exhaustively cross-checked in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gumbel_span_sample(
    start_logits: jax.Array,
    end_logits: jax.Array,
    key: jax.Array,
    top_k: int = 2,
    tau: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """Draw top_k independent Gumbel-perturbed argmax (start, end) pairs.

    start/end_logits: (B, L). Returns (starts, ends) each (B, top_k) int32.

    The reference takes argmax of gumbel_softmax(logits, tau)
    (LSTP_SF_blip2_module.py:273-279); since softmax is monotone the argmax
    equals argmax(logits + gumbel_noise) and tau cancels — kept as an argument
    for recipe-config parity only.
    """
    del tau
    b, _ = start_logits.shape
    noise_shape = (top_k, 2, *start_logits.shape)
    gumbel = jax.random.gumbel(key, noise_shape, dtype=jnp.float32)
    starts = jnp.argmax(start_logits[None].astype(jnp.float32) + gumbel[:, 0], axis=-1)
    ends = jnp.argmax(end_logits[None].astype(jnp.float32) + gumbel[:, 1], axis=-1)
    return starts.T.astype(jnp.int32), ends.T.astype(jnp.int32)  # (B, top_k)


def _linspace_intervals(md: jax.Array, nframe: int) -> jax.Array:
    """int(np.linspace(0, md, nframe+1)) as integer arithmetic."""
    x = jnp.arange(nframe + 1, dtype=jnp.int32)
    return (x * md) // nframe


def select_frames_from_spans(
    starts: jax.Array,
    ends: jax.Array,
    video_length: jax.Array,
    num_frames: int,
    nframe: int,
    inclusive_end: bool = True,
    rescale: str = "minus1",
) -> jax.Array:
    """Vectorized steps 2-4. starts/ends: (B, K) flow-domain; video_length (B,).

    Returns (B, nframe) int32 indices into the num_frames candidate frames.

    ``inclusive_end``: the training path unions range(s, e+1)
    (LSTP_SF_blip2_module.py:297) while the standalone inference path unions
    range(s, e) — exclusive (eval/utils/model.py:352). Default matches
    training.

    ``rescale``: the flow->frame index mapping. "minus1" is the BLIP2/SF rule
    int(idx*(F-1)/(L-1)) (LSTP_SF_blip2_module.py:296, eval/utils/model.py:350);
    "ratio" is the Vicuna-family rule int(idx/L*F) (LSTP_module.py:245,
    eval/utils/model.py:135, demo/utils/model.py:115). The ratio rule is
    evaluated in float32 with the reference's torch operation order
    (long/int -> f32 division, then f32 multiply, then trunc) so results are
    bit-identical even where the two-step rounding differs from exact
    integer arithmetic.
    """
    if rescale not in ("minus1", "ratio"):
        raise ValueError(f"unknown rescale rule: {rescale!r}")
    starts = starts.astype(jnp.int32)
    ends = ends.astype(jnp.int32)
    length = video_length.astype(jnp.int32)[:, None]  # (B, 1)

    invalid = (starts >= length) | (ends >= length) | ((starts == 0) & (ends == 0))
    starts = jnp.where(invalid, 0, starts)
    ends = jnp.where(invalid, length - 1, ends)

    if rescale == "minus1":
        # flow domain -> frame domain: int(idx * (F-1) / (L-1)); integer
        # floor matches the reference's f32 trunc for all in-range values
        # (quotients stay > 2^-12 away from integers, f32 eps ~ 2^-23*k)
        denom = jnp.maximum(length - 1, 1)
        s = (starts * (num_frames - 1)) // denom
        e = (ends * (num_frames - 1)) // denom
    else:
        lf = length.astype(jnp.float32)
        s = jnp.floor(starts.astype(jnp.float32) / lf * num_frames).astype(jnp.int32)
        e = jnp.floor(ends.astype(jnp.float32) / lf * num_frames).astype(jnp.int32)

    frame_ids = jnp.arange(num_frames, dtype=jnp.int32)  # (F,)
    # union over K spans; an inverted/empty span contributes nothing,
    # matching python range()
    upper = (
        frame_ids[None, None, :] <= e[:, :, None]
        if inclusive_end
        else frame_ids[None, None, :] < e[:, :, None]
    )
    mask = jnp.any((frame_ids[None, None, :] >= s[:, :, None]) & upper, axis=1)
    empty = ~jnp.any(mask, axis=-1, keepdims=True)
    mask = mask | empty  # empty union -> all frames

    m = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (B,)
    # sorted selected indices first, sentinel after
    cand = jnp.sort(jnp.where(mask, frame_ids[None, :], num_frames + frame_ids[None, :]), axis=-1)
    cand = jnp.where(cand >= num_frames, 0, cand)  # sentinels never gathered

    # doublings until m * 2^d >= nframe
    max_d = max(int(np.ceil(np.log2(max(nframe, 1)))) + 1, 1)
    d = jnp.zeros_like(m)
    md = m
    for _ in range(max_d):
        need = md < nframe
        d = jnp.where(need, d + 1, d)
        md = jnp.where(need, md * 2, md)

    intv = jax.vmap(_linspace_intervals, in_axes=(0, None))(md, nframe)  # (B, nframe+1)
    pos = (intv[:, :-1] + intv[:, 1:] - 1) // 2  # (B, nframe)
    orig_pos = pos // (2 ** d)[:, None]
    return jnp.take_along_axis(cand, orig_pos, axis=-1)


def select_frames(
    start_logits: jax.Array,
    end_logits: jax.Array,
    video_length: jax.Array,
    key: jax.Array,
    num_frames: int,
    nframe: int,
    top_k: int = 2,
    tau: float = 0.5,
    inclusive_end: bool = True,
    rescale: str = "minus1",
) -> jax.Array:
    """Full selection op: Gumbel span sampling + fixed-size gather indices."""
    starts, ends = gumbel_span_sample(start_logits, end_logits, key, top_k, tau)
    return select_frames_from_spans(starts, ends, video_length, num_frames,
                                    nframe, inclusive_end=inclusive_end,
                                    rescale=rescale)


def select_frames_reference_np(
    starts: np.ndarray,
    ends: np.ndarray,
    video_length: int,
    num_frames: int,
    nframe: int,
    inclusive_end: bool = True,
    rescale: str = "minus1",
) -> list[int]:
    """Golden oracle: faithful port of the reference python loop
    (LSTP_SF_blip2_module.py:283-313; rescale="ratio" follows
    LSTP_module.py:245 / eval/utils/model.py:135 in torch's f32 operation
    order). starts/ends: (K,) for one sample."""
    cand_index: set[int] = set()
    for cand_start, cand_end in zip(starts, ends):
        cand_start, cand_end = int(cand_start), int(cand_end)
        if (
            cand_start >= video_length
            or cand_end >= video_length
            or (cand_start == 0 and cand_end == 0)
        ):
            cand_start, cand_end = 0, video_length - 1
        if rescale == "minus1":
            denom = max(video_length - 1, 1)
            s = int(cand_start * (num_frames - 1) / denom)
            e = int(cand_end * (num_frames - 1) / denom)
        else:
            # torch long/int -> f32 division, then f32 multiply, then trunc
            s = int(np.float32(np.float32(cand_start) / np.float32(video_length))
                    * np.float32(num_frames))
            e = int(np.float32(np.float32(cand_end) / np.float32(video_length))
                    * np.float32(num_frames))
        cand_index |= set(range(s, e + 1 if inclusive_end else e))
    cand = sorted(cand_index)
    if not cand:
        cand = list(range(num_frames))
    while len(cand) < nframe:
        cand = [xx for x in cand for xx in (x, x)]
    if len(cand) > nframe:
        intv = np.linspace(start=0, stop=len(cand), num=nframe + 1).astype(int)
        cand = [cand[(intv[x] + intv[x + 1] - 1) // 2] for x in range(len(intv) - 1)]
    assert len(cand) == nframe
    return cand
