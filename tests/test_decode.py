"""Decode loop tests: synthetic-dynamics exactness, stopping, beam advantage,
and end-to-end cached greedy vs uncached argmax on a real tiny LLaMA."""

import jax
import jax.numpy as jnp
import numpy as np

from videotgb_tpu.models.llama import LlamaConfig, LlamaModel
from videotgb_tpu.ops.decode import DecodeConfig, beam_search, decode

V = 16


def _scripted_step(script):
    """step_fn emitting a fixed token script regardless of input."""
    script = jnp.asarray(script)

    def step_fn(tokens, caches, index):
        t = index  # absolute step
        tgt = script[jnp.minimum(t, len(script) - 1)]
        logits = jax.nn.one_hot(tgt, V)[None] * 10.0
        logits = jnp.broadcast_to(logits, (tokens.shape[0], V))
        return logits, caches

    return step_fn


def test_greedy_follows_script_and_stops_on_eos():
    cfg = DecodeConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    step = _scripted_step([5, 6, 7, 1, 9, 9, 9, 9])
    out = jax.jit(lambda: decode(step, {}, jnp.zeros((2,), jnp.int32), cfg))()
    assert out.tolist() == [[5, 6, 7, 1, 0, 0, 0, 0]] * 2


def test_stop_sequences_terminate_early():
    cfg = DecodeConfig(max_new_tokens=8, eos_token_id=1, pad_token_id=0)
    step = _scripted_step([5, 6, 7, 8, 9, 9, 9, 9])
    out = decode(step, {}, jnp.zeros((1,), jnp.int32), cfg,
                 stop_sequences=((6, 7),))
    # generation halts after writing the stop suffix [6, 7]
    assert out.tolist() == [[5, 6, 7, 0, 0, 0, 0, 0]]


def test_repetition_penalty_changes_output():
    # logits always slightly favor token 5; penalty should push away after use
    def step_fn(tokens, caches, index):
        logits = jnp.zeros((tokens.shape[0], V)).at[:, 5].set(1.0).at[:, 6].set(0.9)
        return logits, caches

    base = DecodeConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)
    out_plain = decode(step_fn, {}, jnp.zeros((1,), jnp.int32), base)
    assert out_plain.tolist() == [[5, 5, 5, 5]]
    pen = DecodeConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0,
                       repetition_penalty=2.0)
    out_pen = decode(step_fn, {}, jnp.zeros((1,), jnp.int32), pen)
    # step 1: 5 halved (0.5) < 6 (0.9) -> 6; step 2+: both penalized,
    # 5 (0.5) > 6 (0.45) -> back to 5 (HF repetition-penalty semantics)
    assert out_pen.tolist() == [[5, 6, 5, 5]]


def test_sampling_is_seeded_and_varies():
    def step_fn(tokens, caches, index):
        return jnp.zeros((tokens.shape[0], V)), caches

    cfg = DecodeConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0,
                       do_sample=True, temperature=1.0)
    a = decode(step_fn, {}, jnp.zeros((1,), jnp.int32), cfg, key=jax.random.key(0))
    b = decode(step_fn, {}, jnp.zeros((1,), jnp.int32), cfg, key=jax.random.key(0))
    c = decode(step_fn, {}, jnp.zeros((1,), jnp.int32), cfg, key=jax.random.key(1))
    assert a.tolist() == b.tolist()
    assert a.tolist() != c.tolist()


def test_beam_search_beats_greedy_on_trap():
    # step 0: token 2 has logp ~ -0.56, token 3 ~ -0.84 (greedy picks 2)
    # step 1: after 2 -> uniform; after 3 -> near-certain token 4
    # two-step logprob: path (3,4) >> (2, anything)
    def step_fn(tokens, caches, index):
        prev = tokens[:, 0]
        first = jnp.full((V,), -5.0).at[2].set(1.0).at[3].set(0.72)
        after3 = jnp.full((V,), -8.0).at[4].set(8.0)
        uniform = jnp.zeros((V,))
        logits = jnp.where(
            (index == 0)[None, None] if jnp.ndim(index) else index == 0,
            first[None, :],
            jnp.where((prev == 3)[:, None], after3[None, :], uniform[None, :]),
        )
        return jnp.broadcast_to(logits, (tokens.shape[0], V)), caches

    greedy_cfg = DecodeConfig(max_new_tokens=2, eos_token_id=1, pad_token_id=0)
    greedy_out = decode(step_fn, {}, jnp.zeros((1,), jnp.int32), greedy_cfg)
    assert greedy_out[0, 0] == 2

    beam_cfg = DecodeConfig(max_new_tokens=2, eos_token_id=1, pad_token_id=0,
                            num_beams=3)
    # caches are per-beam: empty dict tree is fine (tree.map over no leaves)
    caches = {"dummy": jnp.zeros((3, 1))}  # b*k = 1*3
    beam_out = beam_search(step_fn, caches, jnp.zeros((1,), jnp.int32), beam_cfg)
    assert beam_out[0].tolist()[:2] == [3, 4]


def test_llama_cached_greedy_matches_uncached_argmax():
    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    b, prompt_len, new = 2, 4, 5
    total = prompt_len + new
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 60, (b, prompt_len)))
    params = model.init(jax.random.key(0), ids)

    # uncached rollout
    seq = ids
    for _ in range(new):
        logits, _ = model.apply(params, seq)
        seq = jnp.concatenate([seq, jnp.argmax(logits[:, -1:], -1)], axis=1)
    expected = seq[:, prompt_len:]

    # cached: prefill then decode loop
    caches = model.apply(params, b, total, method=model.init_caches)
    valid_p = jnp.broadcast_to(
        (jnp.arange(total) < prompt_len).astype(jnp.float32)[None], (b, total))
    logits_p, caches = model.apply(params, ids, caches=caches,
                                   cache_index=jnp.int32(0),
                                   cache_positions_valid=valid_p)
    first = jnp.argmax(logits_p[:, -1], -1)

    def step_fn(tokens, caches, index):
        valid = jnp.broadcast_to(
            (jnp.arange(total)[None] <= index).astype(jnp.float32), (b, total))
        logits, caches = model.apply(params, tokens, caches=caches,
                                     cache_index=index,
                                     cache_positions_valid=valid)
        return logits[:, -1], caches

    dcfg = DecodeConfig(max_new_tokens=new - 1, eos_token_id=-1, pad_token_id=0)
    rest = decode(step_fn, caches, first, dcfg, start_index=prompt_len)
    got = jnp.concatenate([first[:, None], rest], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
