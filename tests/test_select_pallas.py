"""Fused Pallas selection kernel: interpret-mode parity on CPU (the
noise-free path is bit-exact vs the XLA reference; the TPU-PRNG noise path is
exercised on device — see the on-device checks in bench/TPU sessions)."""

import jax
import jax.numpy as jnp
import numpy as np

from videotgb_tpu.ops.select import select_frames_from_spans
from videotgb_tpu.ops.select_pallas import select_frames_pallas


def test_pallas_select_matches_xla_reference_deterministic(rng):
    B, L, F, NF = 8, 64, 32, 4
    sl = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    el = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    vl = jnp.asarray(rng.integers(2, 64, (B,)), jnp.int32)
    got = select_frames_pallas(sl, el, vl, seed=0, num_frames=F, nframe=NF,
                               noise_scale=0.0, inclusive_end=False,
                               interpret=True)
    starts = jnp.tile(jnp.argmax(sl, axis=1)[:, None], (1, 2))
    ends = jnp.tile(jnp.argmax(el, axis=1)[:, None], (1, 2))
    expected = select_frames_from_spans(starts, ends, vl, F, NF,
                                        inclusive_end=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_pallas_select_inclusive_end_variant(rng):
    B, L, F, NF = 4, 16, 8, 2
    sl = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    el = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    vl = jnp.full((B,), L, jnp.int32)
    got = select_frames_pallas(sl, el, vl, seed=0, num_frames=F, nframe=NF,
                               noise_scale=0.0, inclusive_end=True,
                               interpret=True)
    starts = jnp.tile(jnp.argmax(sl, axis=1)[:, None], (1, 2))
    ends = jnp.tile(jnp.argmax(el, axis=1)[:, None], (1, 2))
    expected = select_frames_from_spans(starts, ends, vl, F, NF,
                                        inclusive_end=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_pallas_select_degenerate_and_short_videos():
    # peaked logits at (0, 0) -> sanitized to the full span
    B, L, F, NF = 2, 8, 8, 4
    sl = jnp.full((B, L), -10.0).at[:, 0].set(10.0)
    el = jnp.full((B, L), -10.0).at[:, 0].set(10.0)
    vl = jnp.array([1, 5], jnp.int32)
    got = select_frames_pallas(sl, el, vl, seed=0, num_frames=F, nframe=NF,
                               noise_scale=0.0, inclusive_end=True,
                               interpret=True)
    starts = jnp.zeros((B, 2), jnp.int32)
    ends = jnp.zeros((B, 2), jnp.int32)
    expected = select_frames_from_spans(starts, ends, vl, F, NF,
                                        inclusive_end=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_pallas_select_ratio_rescale_variant(rng):
    # the Vicuna int(i/L*F) rule (eval/utils/model.py:135)
    B, L, F, NF = 8, 64, 32, 4
    sl = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    el = jnp.asarray(rng.standard_normal((B, L)), jnp.float32)
    vl = jnp.asarray(rng.integers(2, 64, (B,)), jnp.int32)
    got = select_frames_pallas(sl, el, vl, seed=0, num_frames=F, nframe=NF,
                               noise_scale=0.0, inclusive_end=False,
                               rescale="ratio", interpret=True)
    starts = jnp.tile(jnp.argmax(sl, axis=1)[:, None], (1, 2))
    ends = jnp.tile(jnp.argmax(el, axis=1)[:, None], (1, 2))
    expected = select_frames_from_spans(starts, ends, vl, F, NF,
                                        inclusive_end=False, rescale="ratio")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
