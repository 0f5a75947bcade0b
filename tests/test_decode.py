"""Decode loop tests: synthetic-dynamics exactness, stopping, beam advantage,
and end-to-end cached greedy vs uncached argmax on a real tiny LLaMA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_beam_search_retires_early_eos_hypothesis():
    """Done-hypotheses semantics: a beam that hits EOS early is retired with
    its score-at-finish and returned over live beams that kept running (HF
    BeamHypotheses behavior; the pre-fix finalizer only ranked live beams)."""
    import math

    # t=0: token 2 (p .6) vs token 3 (p .3). t=1: EOS near-certain for every
    # beam -> both live beams retire. t>=2: flat continuation, so the early
    # hypothesis can never be beaten and the sample stops before the horizon.
    def step_fn(tokens, caches, index):
        first = jnp.log(jnp.asarray([1e-6, 1e-6, 0.6, 0.3] + [1e-6] * (V - 4)))
        later = jnp.full((V,), -8.0).at[1].set(0.0).at[4].set(-3.0)
        logits = jnp.where(index == 0, first[None, :], later[None, :])
        return jnp.broadcast_to(logits, (tokens.shape[0], V)) * 10.0, caches

    cfg = DecodeConfig(max_new_tokens=6, eos_token_id=1, pad_token_id=0,
                       num_beams=2, length_penalty=1.0)
    caches = {"dummy": jnp.zeros((2, 1))}
    out = jax.jit(lambda: beam_search(
        step_fn, caches, jnp.zeros((1,), jnp.int32), cfg))()
    assert out.tolist() == [[2, 1, 0, 0, 0, 0]]


def _hf_tiny_t5(eos_boost: float):
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration
    import torch

    hf_cfg = HFT5Config(
        vocab_size=384, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
    )
    torch.manual_seed(7)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    with torch.no_grad():
        # make EOS competitive so beams finish at different steps and the
        # done-hypotheses bookkeeping actually gets exercised
        hf.lm_head.weight[1] += eos_boost
    return hf


@pytest.mark.parametrize("length_penalty,eos_boost", [(2.0, 0.35), (0.6, 0.3)])
def test_beam_search_matches_hf_t5_generate(length_penalty, eos_boost):
    """Golden beam-search parity vs transformers' BeamSearchScorer on a tiny
    random T5 (reference decodes with num_beams>1 via HF generate,
    eval/utils/model.py:427-441)."""
    import dataclasses

    import torch
    from flax import linen as nn

    from videotgb_tpu.models.t5 import T5Config, T5Model
    from videotgb_tpu.training import convert as C

    hf = _hf_tiny_t5(eos_boost)
    cfg = dataclasses.replace(T5Config.tiny(), dtype=jnp.float32,
                              param_dtype=jnp.float32)
    model = T5Model(cfg)

    rng = np.random.default_rng(11)
    b, enc_len, k, max_new = 3, 7, 3, 10
    enc_ids = rng.integers(2, 300, (b, enc_len))
    with torch.no_grad():
        hf_out = hf.generate(
            input_ids=torch.from_numpy(enc_ids), num_beams=k,
            max_new_tokens=max_new, length_penalty=length_penalty,
            early_stopping=False, do_sample=False, min_length=0,
        ).numpy()

    sd = {kk: vv.detach().numpy() for kk, vv in hf.state_dict().items()}
    params = model.init(jax.random.key(0), jnp.zeros((1, enc_len, 32)),
                        jnp.ones((1, enc_len)), jnp.zeros((1, 2), jnp.int32))
    merged = C.merge_into(nn.meta.unbox(params)["params"],
                          C.convert_t5(sd, 2, 2))
    params = {"params": merged}

    embeds = model.apply(params, jnp.asarray(enc_ids), method=model.embed)
    enc_mask = jnp.ones((b, enc_len))
    enc_hidden = model.apply(params, embeds, enc_mask, method=model.encode)
    enc_hidden = jnp.repeat(enc_hidden, k, axis=0)
    enc_mask_bk = jnp.repeat(enc_mask, k, axis=0)
    bk = b * k

    caches = model.apply(params, bk, max_new, enc_len,
                         method=model.init_caches)

    def valid(index):
        return jnp.broadcast_to(
            (jnp.arange(max_new)[None] <= index).astype(jnp.float32),
            (bk, max_new))

    start = jnp.zeros((b,), jnp.int32)  # decoder_start_token_id
    logits0, caches = model.apply(
        params, jnp.zeros((bk, 1), jnp.int32), enc_hidden, enc_mask_bk,
        caches=caches, cache_index=jnp.int32(0),
        cache_positions_valid=valid(0), cross_prefill=True,
        method=model.decode)

    def step_fn(tokens, caches, index):
        def replay():
            return logits0[:, -1].astype(jnp.float32), caches

        def step():
            logits, new_caches = model.apply(
                params, tokens, enc_hidden, enc_mask_bk, caches=caches,
                cache_index=index, cache_positions_valid=valid(index),
                method=model.decode)
            return logits[:, -1].astype(jnp.float32), new_caches

        return jax.lax.cond(index == 0, replay, step)

    dcfg = DecodeConfig(max_new_tokens=max_new, eos_token_id=1,
                        pad_token_id=0, num_beams=k,
                        length_penalty=length_penalty)
    got = beam_search(step_fn, caches, start, dcfg)
    # HF output row = [decoder_start, generated..., pads]
    expected = hf_out[:, 1:]
    padded = np.zeros((b, max_new), np.int64)
    padded[:, :expected.shape[1]] = expected
    np.testing.assert_array_equal(np.asarray(got), padded)


@pytest.mark.parametrize("length_penalty,eos_boost", [(2.0, 1.2), (0.6, 1.0)])
def test_llama_beam_matches_hf_generate_inputs_embeds(length_penalty, eos_boost):
    """Golden decoder-only beam parity vs transformers generate with
    inputs_embeds (the Vicuna decode path, eval/utils/model.py:427-441).
    transformers >= 4.33 normalizes beam scores by generated length only
    (decoder_prompt_len semantics) — this pins llama_generate_from_embeds'
    penalty_length_offset=1 to the HF behavior."""
    import dataclasses

    import torch
    from flax import linen as nn
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    from videotgb_tpu.models.videotgb import (
        VideoTGB, VideoTGBConfig, llama_generate_from_embeds)
    from videotgb_tpu.training import convert as C

    hf_cfg = HFLlamaConfig(
        vocab_size=384, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-6, attention_bias=False, rope_theta=10000.0,
        attention_dropout=0.0, pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(3)
    hf = LlamaForCausalLM(hf_cfg).eval()
    with torch.no_grad():
        # make EOS competitive so beams finish at different steps and length
        # normalization actually decides the ranking
        hf.lm_head.weight[2] += eos_boost

    cfg = VideoTGBConfig.tiny("instructblip")
    f32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)
    ib = dataclasses.replace(
        cfg.instructblip,
        llm=dataclasses.replace(cfg.instructblip.llm, **f32))
    cfg = dataclasses.replace(cfg, instructblip=ib)
    model = VideoTGB(cfg)

    rng = np.random.default_rng(9)
    b, prompt_len, k, max_new = 3, 6, 3, 8
    ids = rng.integers(4, 300, (b, prompt_len))
    with torch.no_grad():
        t_embeds = hf.model.embed_tokens(torch.from_numpy(ids))
        hf_out = hf.generate(
            inputs_embeds=t_embeds,
            attention_mask=torch.ones(b, prompt_len, dtype=torch.long),
            num_beams=k, max_new_tokens=max_new,
            length_penalty=length_penalty, early_stopping=False,
            do_sample=False, min_length=0,
        ).numpy()  # generated tokens only (no prompt with inputs_embeds)

    img = cfg.instructblip.vit.image_size
    fs = cfg.tgb.flow_size
    key = jax.random.key(0)
    init_batch = dict(
        frames=jnp.zeros((1, cfg.num_frames, img, img, 3)),
        flow=jnp.zeros((1, 4, fs, fs, 2)),
        flow_mask=jnp.ones((1, 6)),
        video_length=jnp.full((1,), 4),
        sq=jnp.ones((1, 5), jnp.int32), sm=jnp.ones((1, 5)),
        q=jnp.ones((1, 6), jnp.int32), qm=jnp.ones((1, 6)),
    )
    params = model.init(
        key, init_batch["frames"], init_batch["flow"], init_batch["flow_mask"],
        init_batch["video_length"], init_batch["sq"], init_batch["sm"],
        init_batch["q"], init_batch["qm"], key, method=model.init_pipeline)
    unboxed = nn.meta.unbox(params)
    sd = {kk: vv.detach().numpy() for kk, vv in hf.state_dict().items()}
    unboxed["params"]["model"]["language_model"] = C.merge_into(
        unboxed["params"]["model"]["language_model"], C.convert_llama(sd, 2))
    params = unboxed

    embeds = model.apply(
        params, method=lambda m: m.model.language_model.embed(jnp.asarray(ids)))
    mask = jnp.ones((b, prompt_len))
    dcfg = DecodeConfig(max_new_tokens=max_new, eos_token_id=2,
                        pad_token_id=0, num_beams=k,
                        length_penalty=length_penalty)
    got = llama_generate_from_embeds(model, params, embeds, mask, dcfg,
                                     jax.random.key(1))

    def canon(row):
        # tokens up to and including the first EOS (HF pads finished
        # hypotheses with EOS-fill, ours with pad_token_id)
        row = list(row)
        return row[: row.index(2) + 1] if 2 in row else row

    for i in range(b):
        assert canon(np.asarray(got)[i]) == canon(hf_out[i]), i


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
