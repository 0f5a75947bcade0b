"""Fused Pallas TPU kernel: TGB span scoring -> Gumbel top-k -> frame indices.

The BASELINE north star asks for the flow-conditioned frame selection
(scoring + top-k over N candidate frames) as a single Pallas kernel. This
kernel fuses everything downstream of the TGB's MRC logits into one VMEM
program, fully vectorized over the batch:

  1. on-chip Gumbel noise from the TPU PRNG (pltpu.prng_random_bits);
  2. top_k independent perturbed-argmax (start, end) draws;
  3. span sanitization + flow->frame rescale + range-union mask
     (LSTP_SF_blip2_module.py:266-314 semantics, see ops.select);
  4. the duplicate/midpoint re-sampling collapsed to index arithmetic, with
     the sorted-gather re-expressed as masked reductions over cumulative
     ranks — no sort, no gather, pure VPU work.

``noise_scale=0`` disables the perturbation, making the kernel bit-exact
against the XLA reference path (tested in interpret mode on CPU and compiled
on TPU); with noise it is distribution-equivalent but draws from the TPU
hardware PRNG rather than Threefry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _select_kernel(
    seed_ref,  # SMEM (1,)
    start_ref,  # (B, L)
    end_ref,  # (B, L)
    len_ref,  # SMEM (B,)
    out_ref,  # (B, nframe)
    *,
    top_k: int,
    num_frames: int,
    nframe: int,
    noise_scale: float,
    inclusive_end: bool,
    rescale: str,
):
    b, l = start_ref.shape
    if noise_scale != 0.0:  # hardware PRNG only on TPU
        pltpu.prng_seed(seed_ref[0])

    length = jnp.stack([len_ref[i] for i in range(b)]).reshape(b, 1)
    denom = jnp.maximum(length - 1, 1)  # (B, 1)

    frame_ids = jax.lax.broadcasted_iota(jnp.int32, (b, num_frames), 1)
    mask = jnp.zeros((b, num_frames), jnp.bool_)

    def gumbel(shape):
        bits = pltpu.prng_random_bits(shape)
        u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + 0.5
        u = jnp.clip(u, 1e-7, 1.0 - 1e-7)
        return -jnp.log(-jnp.log(u))

    for _ in range(top_k):
        s_scores = start_ref[:].astype(jnp.float32)
        e_scores = end_ref[:].astype(jnp.float32)
        if noise_scale != 0.0:
            s_scores = s_scores + noise_scale * gumbel((b, l))
            e_scores = e_scores + noise_scale * gumbel((b, l))
        cand_start = jnp.argmax(s_scores, axis=1, keepdims=True).astype(jnp.int32)
        cand_end = jnp.argmax(e_scores, axis=1, keepdims=True).astype(jnp.int32)

        invalid = (
            (cand_start >= length) | (cand_end >= length)
            | ((cand_start == 0) & (cand_end == 0))
        )
        cand_start = jnp.where(invalid, 0, cand_start)
        cand_end = jnp.where(invalid, length - 1, cand_end)
        if rescale == "minus1":
            s = (cand_start * (num_frames - 1)) // denom  # (B, 1)
            e = (cand_end * (num_frames - 1)) // denom
        else:  # Vicuna rule int(idx/L*F) in the reference's f32 op order
            lf = length.astype(jnp.float32)
            s = jnp.floor(cand_start.astype(jnp.float32) / lf
                          * num_frames).astype(jnp.int32)
            e = jnp.floor(cand_end.astype(jnp.float32) / lf
                          * num_frames).astype(jnp.int32)
        upper = frame_ids <= e if inclusive_end else frame_ids < e
        mask = mask | ((frame_ids >= s) & upper)

    empty = ~jnp.any(mask, axis=1, keepdims=True)
    mask = mask | empty

    mask_i = mask.astype(jnp.int32)
    m = jnp.sum(mask_i, axis=1, keepdims=True)  # (B, 1)
    d = jnp.zeros_like(m)
    md = m
    for _ in range(max(nframe.bit_length(), 1)):
        need = md < nframe
        d = jnp.where(need, d + 1, d)
        md = jnp.where(need, md * 2, md)

    # exclusive prefix-sum as a strictly-lower-triangular matmul (cumsum has
    # no Pallas TPU lowering; F<=128 so fp32 accumulation is exact)
    jj = jax.lax.broadcasted_iota(jnp.int32, (num_frames, num_frames), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (num_frames, num_frames), 1)
    strict_lower = (jj < kk).astype(jnp.float32)
    ranks = jax.lax.dot_general(
        mask_i.astype(jnp.float32), strict_lower,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (B, F) rank of each set bit

    x = jax.lax.broadcasted_iota(jnp.int32, (b, nframe), 1)
    intv_lo = (x * md) // nframe
    intv_hi = ((x + 1) * md) // nframe
    pos = (intv_lo + intv_hi - 1) // 2
    orig = pos >> d  # (B, nframe) rank to fetch from the selected list

    # selected[orig[x]] via masked reduction: for each output slot, sum the
    # frame id whose rank matches (exactly one per valid slot)
    hit = mask_i[:, None, :] * (ranks[:, None, :] == orig[:, :, None])
    out_ref[:] = jnp.sum(frame_ids[:, None, :] * hit, axis=2).astype(jnp.int32)


def select_frames_pallas(
    start_logits: jax.Array,  # (B, L)
    end_logits: jax.Array,
    video_length: jax.Array,  # (B,)
    seed: jax.Array | int,
    num_frames: int = 32,
    nframe: int = 4,
    top_k: int = 2,
    noise_scale: float = 1.0,
    inclusive_end: bool = False,
    rescale: str = "minus1",
    interpret: bool = False,
) -> jax.Array:
    """Fused selection -> (B, nframe) int32 frame indices."""
    b, l = start_logits.shape
    if rescale not in ("minus1", "ratio"):
        raise ValueError(f"unknown rescale rule: {rescale!r}")
    kernel = functools.partial(
        _select_kernel, top_k=top_k, num_frames=num_frames, nframe=nframe,
        noise_scale=noise_scale, inclusive_end=inclusive_end, rescale=rescale,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nframe), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      start_logits.astype(jnp.float32), end_logits.astype(jnp.float32),
      video_length.astype(jnp.int32))
