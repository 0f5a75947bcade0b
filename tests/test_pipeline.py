"""Composition tests: BLIP2/InstructBLIP wrappers, LoRA, full VideoTGB
pipeline with end-to-end tiny generation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.models.blip2 import Blip2Config, Blip2Model, cross_entropy_ignore
from videotgb_tpu.models.instructblip import (
    InstructBlipConfig,
    InstructBlipModel,
    pack_text_input_output,
)
from videotgb_tpu.models.t5 import T5Config, T5Model
from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig, generate_blip2
from videotgb_tpu.ops.decode import DecodeConfig


def test_cross_entropy_ignore_matches_manual():
    logits = jnp.log(jnp.array([[[0.7, 0.2, 0.1], [0.1, 0.8, 0.1]]]))
    labels = jnp.array([[0, -100]])
    loss = cross_entropy_ignore(logits, labels)
    assert float(loss) == pytest.approx(-np.log(0.7), rel=1e-5)


def test_blip2_loss_pass():
    cfg = Blip2Config.tiny()
    model = Blip2Model(cfg)
    b, f = 2, 2
    img = cfg.vit.image_size
    frames = jnp.ones((b, f, img, img, 3))
    q_ids = jnp.ones((b, 6), jnp.int32)
    q_mask = jnp.ones((b, 6))
    a_ids = jnp.asarray(np.random.default_rng(0).integers(2, 60, (b, 4)))
    params = model.init(jax.random.key(0), frames, q_ids, q_mask, a_ids)
    loss, logits = model.apply(params, frames, q_ids, q_mask, a_ids)
    assert logits.shape == (b, 4, cfg.t5.vocab_size)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_instructblip_loss_only_on_answer():
    cfg = InstructBlipConfig.tiny()
    model = InstructBlipModel(cfg)
    b, f = 1, 2
    img = cfg.vit.image_size
    frames = jnp.ones((b, f, img, img, 3))
    ids, mask, labels = pack_text_input_output(
        [[4, 5, 6]], [[7, 8]], max_len=8, pad_id=0
    )
    assert labels.tolist() == [[-100, -100, -100, 7, 8, -100, -100, -100]]
    params = model.init(jax.random.key(0), frames, ids, mask, labels,
                        qformer_input_ids=jnp.ones((b, 3), jnp.int32))
    loss, logits = model.apply(params, frames, ids, mask, labels,
                               qformer_input_ids=jnp.ones((b, 3), jnp.int32))
    assert np.isfinite(float(loss))
    assert logits.shape[1] == f * cfg.qformer.num_query_tokens + 8


def test_lora_starts_at_identity_and_params_exist():
    base_cfg = T5Config.tiny()
    lora_cfg = dataclasses.replace(base_cfg, lora_rank=4)
    b, s_in, s_out = 1, 5, 3
    enc = jnp.zeros((b, s_in, base_cfg.d_model))
    mask = jnp.ones((b, s_in))
    dec = jnp.ones((b, s_out), jnp.int32)

    base = T5Model(base_cfg)
    lora = T5Model(lora_cfg)
    bp = base.init(jax.random.key(0), enc, mask, dec)
    lp = lora.init(jax.random.key(0), enc, mask, dec)

    flat = jax.tree_util.tree_flatten_with_path(lp)[0]
    lora_leaves = [p for p, _ in flat if any("lora" in str(k) for k in p)]
    assert lora_leaves, "LoRA params missing"
    # lora_b = 0 -> deltas are exactly zero at init
    from flax.traverse_util import flatten_dict, unflatten_dict
    import flax

    lp_flat = flatten_dict(flax.core.unfreeze(lp["params"]))
    # graft base weights into the lora model's non-lora slots
    bp_flat = flatten_dict(flax.core.unfreeze(bp["params"]))
    for k in lp_flat:
        if not any("lora" in str(p) for p in k):
            lp_flat[k] = bp_flat[k]
    merged = {"params": unflatten_dict(lp_flat)}
    out_base = base.apply(bp, enc, mask, dec)
    out_lora = lora.apply(merged, enc, mask, dec)
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(out_lora),
                               atol=1e-6)


def test_videotgb_full_pipeline_generate():
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    b = 2
    img = cfg.blip2.vit.image_size
    l_flow = 6
    fs = cfg.tgb.flow_size
    batch = {
        "frames": jnp.ones((b, cfg.num_frames, img, img, 3)),
        "flow": jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, l_flow, fs, fs, 2)), jnp.float32),
        "flow_mask": jnp.ones((b, l_flow + 2)),
        "video_length": jnp.full((b,), l_flow),
        "sampler_question_ids": jnp.ones((b, 5), jnp.int32),
        "sampler_question_mask": jnp.ones((b, 5)),
        "question_ids": jnp.ones((b, 6), jnp.int32),
        "question_mask": jnp.ones((b, 6)),
    }
    key = jax.random.key(0)
    params = model.init(
        key, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], key, method=model.init_pipeline,
    )
    dcfg = DecodeConfig(max_new_tokens=5, eos_token_id=1, pad_token_id=0)
    tokens, cand = generate_blip2(model, params, batch, dcfg, key)
    assert tokens.shape == (b, 5)
    assert cand.shape == (b, cfg.nframe)
    assert bool(jnp.all((cand >= 0) & (cand < cfg.num_frames)))
    # deterministic greedy: same key -> same output
    tokens2, _ = generate_blip2(model, params, batch, dcfg, key)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


def test_videotgb_beam_generate():
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    b = 1
    img = cfg.blip2.vit.image_size
    l_flow = 4
    fs = cfg.tgb.flow_size
    batch = {
        "frames": jnp.ones((b, cfg.num_frames, img, img, 3)),
        "flow": jnp.zeros((b, l_flow, fs, fs, 2)),
        "flow_mask": jnp.ones((b, l_flow + 2)),
        "video_length": jnp.full((b,), l_flow),
        "sampler_question_ids": jnp.ones((b, 5), jnp.int32),
        "sampler_question_mask": jnp.ones((b, 5)),
        "question_ids": jnp.ones((b, 6), jnp.int32),
        "question_mask": jnp.ones((b, 6)),
    }
    key = jax.random.key(1)
    params = model.init(
        key, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], key, method=model.init_pipeline,
    )
    dcfg = DecodeConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0,
                        num_beams=3)
    tokens, _ = generate_blip2(model, params, batch, dcfg, key)
    assert tokens.shape == (b, 4)


def test_videotgb_raft_flow_path():
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    b, l = 1, 3
    frames = jnp.ones((b, l, 64, 64, 3)) * 128
    params = model.init(jax.random.key(0), frames, method=model.compute_flow)
    flow = model.apply(params, frames, method=model.compute_flow)
    assert flow.shape == (b, l, 64, 64, 2)
