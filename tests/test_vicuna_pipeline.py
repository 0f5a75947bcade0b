"""InstructBLIP-Vicuna pipeline tests: decoder-only generation with padded
prompts, keyword stopping, and selection parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.models.videotgb import (
    VideoTGB,
    VideoTGBConfig,
    generate_instructblip,
)
from videotgb_tpu.ops.decode import DecodeConfig


@pytest.fixture(scope="module")
def vicuna_setup():
    cfg = VideoTGBConfig.tiny("instructblip")
    model = VideoTGB(cfg)
    b = 2
    img = cfg.instructblip.vit.image_size
    l_flow = 4
    fs = cfg.tgb.flow_size
    rng = np.random.default_rng(0)
    mask = np.ones((b, 6), np.float32)
    mask[0, 4:] = 0  # right-padded sample with true length 4
    batch = {
        "frames": jnp.asarray(rng.standard_normal(
            (b, cfg.num_frames, img, img, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal(
            (b, l_flow, fs, fs, 2)), jnp.float32),
        "flow_mask": jnp.ones((b, l_flow + 2)),
        "video_length": jnp.full((b,), l_flow),
        "sampler_question_ids": jnp.ones((b, 5), jnp.int32) * 7,
        "sampler_question_mask": jnp.ones((b, 5)),
        "question_ids": jnp.asarray(rng.integers(4, 60, (b, 6)), jnp.int32),
        "question_mask": jnp.asarray(mask),
        "qformer_input_ids": jnp.ones((b, 4), jnp.int32) * 9,
        "qformer_attention_mask": jnp.ones((b, 4)),
    }
    key = jax.random.key(0)
    params = model.init(
        key, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], key, method=model.init_pipeline,
    )
    return model, params, batch


def test_generate_instructblip_shapes_and_determinism(vicuna_setup):
    model, params, batch = vicuna_setup
    dcfg = DecodeConfig(max_new_tokens=5, eos_token_id=2, pad_token_id=0)
    key = jax.random.key(1)
    tokens, cand = generate_instructblip(model, params, batch, dcfg, key)
    assert tokens.shape == (2, 5)
    assert cand.shape == (2, model.config.nframe)
    tokens2, _ = generate_instructblip(model, params, batch, dcfg, key)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


def test_generate_instructblip_padding_invariance(vicuna_setup):
    # changing the *masked* prompt slots must not change the output
    model, params, batch = vicuna_setup
    dcfg = DecodeConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=0)
    key = jax.random.key(2)
    tokens_a, _ = generate_instructblip(model, params, batch, dcfg, key)
    batch_b = dict(batch)
    ids = np.asarray(batch["question_ids"]).copy()
    ids[0, 4:] = 55  # only padded positions of sample 0
    batch_b["question_ids"] = jnp.asarray(ids)
    tokens_b, _ = generate_instructblip(model, params, batch_b, dcfg, key)
    np.testing.assert_array_equal(np.asarray(tokens_a), np.asarray(tokens_b))


def test_generate_instructblip_matches_uncached_rollout(vicuna_setup):
    """Greedy cached decode == naive uncached argmax rollout over the same
    [visual | prompt] prefix (the gold-standard decode correctness check)."""
    model, params, batch = vicuna_setup
    key = jax.random.key(3)
    sel_key, _ = jax.random.split(key)
    embeds, mask, _ = model.apply(
        params, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], sel_key,
        qformer_input_ids=batch["qformer_input_ids"],
        qformer_attention_mask=batch["qformer_attention_mask"],
        method=model.prepare_llama_inference,
    )
    new = 4
    b = embeds.shape[0]
    lengths = jnp.sum(mask, axis=1).astype(jnp.int32)

    # uncached rollout: re-run full forward each step, appending tokens at
    # the first padded slot... simpler: only valid for the unpadded sample 1.
    lm = model.apply(params, method=lambda m: m.model.language_model)
    # build rollout for sample 1 (fully valid prompt)
    e = embeds[1:2]
    m = mask[1:2].astype(jnp.float32)
    seq_embeds = e
    seq_mask = m
    toks = []
    for _ in range(new):
        logits, _ = model.apply(params, inputs_embeds=seq_embeds,
                                method=model.llama_step)
        nxt = jnp.argmax(logits[:, -1], -1)
        toks.append(int(nxt[0]))
        nxt_emb = model.apply(
            params, method=lambda mdl: mdl.model.language_model.embed(nxt[None]))
        seq_embeds = jnp.concatenate([seq_embeds, nxt_emb.reshape(1, 1, -1)], 1)

    dcfg = DecodeConfig(max_new_tokens=new, eos_token_id=-1, pad_token_id=0)
    tokens, _ = generate_instructblip(model, params, batch, dcfg, key)
    assert tokens[1].tolist() == toks


def test_evaluate_generative_scores_instructblip(vicuna_setup):
    """Vicuna recipes must get a val/score monitor from evaluate_generative
    (reference eval_forward generates for both backbones,
    LSTP_module.py:379-408) — not silently skip generation."""
    import types

    from videotgb_tpu.data.tokenizer import ByteTokenizer
    from videotgb_tpu.train import evaluate_generative
    from videotgb_tpu.training.recipes import SFRecipe

    model, params, batch = vicuna_setup
    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    host_batch["_text_answer"] = ["a cat", "a dog"]
    state = types.SimpleNamespace(params=params["params"])
    out = evaluate_generative(model, SFRecipe(), state, [host_batch],
                              ByteTokenizer(), max_new_tokens=4)
    assert "val/score" in out
    assert 0.0 <= out["val/score"] <= 1.0


def test_generate_instructblip_beam(vicuna_setup):
    model, params, batch = vicuna_setup
    dcfg = DecodeConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=0,
                        num_beams=3)
    tokens, cand = generate_instructblip(model, params, batch, dcfg,
                                         jax.random.key(5))
    assert tokens.shape == (2, 4)
    # beam with k=1 must equal greedy
    dcfg1 = DecodeConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=0,
                         num_beams=1)
    greedy, _ = generate_instructblip(model, params, batch, dcfg1,
                                      jax.random.key(5))
    assert greedy.shape == (2, 4)
