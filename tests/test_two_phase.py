"""Two-phase (bandwidth-aware) serving == fused generation, and remat parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.data.constants import CLIP_MEAN, CLIP_STD
from videotgb_tpu.models.videotgb import (
    VideoTGB,
    VideoTGBConfig,
    answer_phase_blip2,
    generate_blip2,
    select_phase_blip2,
)
from videotgb_tpu.ops.decode import DecodeConfig


def test_two_phase_matches_fused_generation():
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    b, l_flow = 2, 3
    img = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size
    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(0, 255, (b, cfg.num_frames, img, img, 3), np.uint8)
    flow_u8 = rng.integers(0, 255, (b, l_flow + 1, fs, fs, 3), np.uint8)

    batch = {
        "flow_mask": jnp.ones((b, l_flow + 2)),
        "video_length": jnp.full((b,), l_flow),
        "sampler_question_ids": jnp.ones((b, 5), jnp.int32) * 7,
        "sampler_question_mask": jnp.ones((b, 5)),
        "question_ids": jnp.asarray(rng.integers(4, 60, (b, 6)), jnp.int32),
        "question_mask": jnp.ones((b, 6)),
    }
    key = jax.random.key(0)
    init_flow = jnp.zeros((1, l_flow, fs, fs, 2))
    params = model.init(
        key, jnp.zeros((1, cfg.num_frames, img, img, 3)), init_flow,
        batch["flow_mask"][:1], batch["video_length"][:1],
        batch["sampler_question_ids"][:1], batch["sampler_question_mask"][:1],
        batch["question_ids"][:1], batch["question_mask"][:1], key,
        method=model.init_pipeline,
    )
    dcfg = DecodeConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)

    # fused path: normalize on host, full frames + flow through generate_blip2
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    frames_norm = (frames_u8.astype(np.float32) / 255.0 - mean) / std
    flow = model.apply(params, jnp.asarray(flow_u8, jnp.float32),
                       method=model.flow_features)
    fused_batch = dict(batch)
    fused_batch["frames"] = jnp.asarray(frames_norm)
    fused_batch["flow"] = flow
    sel_key, _ = jax.random.split(key)
    tokens_fused, cand_fused = generate_blip2(model, params, fused_batch,
                                              dcfg, key)

    # two-phase path with the SAME selection key
    cand2 = select_phase_blip2(model, params, jnp.asarray(flow_u8), batch,
                               sel_key)
    sel = np.stack([frames_u8[i, np.asarray(cand2)[i]] for i in range(b)])
    # fused selection uses inclusive_end=False too -> identical indices
    np.testing.assert_array_equal(np.asarray(cand2), np.asarray(cand_fused))
    _, decode_key = jax.random.split(key)
    tokens2 = answer_phase_blip2(model, params, jnp.asarray(sel), batch,
                                 dcfg, decode_key)
    # small numeric drift allowed: host-vs-device normalization rounding
    agree = np.mean(np.asarray(tokens2) == np.asarray(tokens_fused))
    assert agree >= 0.75, (tokens2, tokens_fused)


def test_remat_matches_baseline():
    from videotgb_tpu.models.t5 import T5Config, T5Model

    cfg = dataclasses.replace(T5Config.tiny(), dtype=jnp.float32,
                              scan_layers=True)
    rcfg = dataclasses.replace(cfg, remat=True)
    b, si, so = 2, 7, 5
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.standard_normal((b, si, cfg.d_model)), jnp.float32)
    mask = jnp.ones((b, si))
    dec = jnp.asarray(rng.integers(2, 60, (b, so)))
    m, mr = T5Model(cfg), T5Model(rcfg)
    params = m.init(jax.random.key(0), embeds[:1], mask[:1], dec[:1])

    def loss(model, p):
        return jnp.sum(model.apply(p, embeds, mask, dec) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(m, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(mr, p))(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
