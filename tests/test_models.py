"""Model tower tests on tiny configs: shapes, masking, KV-cache equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.models.llama import LlamaConfig, LlamaModel
from videotgb_tpu.models.qformer import QFormerConfig, QFormerModel
from videotgb_tpu.models.t5 import T5Config, T5Model, relative_position_bucket
from videotgb_tpu.models.tgb import TGBConfig, TGBModel
from videotgb_tpu.models.vit import ViTConfig, ViTModel

F32 = {"dtype": jnp.float32}


# ---------------------------------------------------------------------- ViT
def test_vit_shapes():
    cfg = ViTConfig.tiny()
    model = ViTModel(cfg)
    x = jnp.ones((2, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, cfg.seq_len, cfg.hidden_size)
    assert cfg.seq_len == (cfg.image_size // cfg.patch_size) ** 2 + 1


# ------------------------------------------------------------------ QFormer
def test_qformer_blip2_and_instruct_variants():
    cfg = QFormerConfig.tiny()
    model = QFormerModel(cfg)
    q = jnp.ones((2, cfg.num_query_tokens, cfg.hidden_size))
    img = jnp.ones((2, 17, cfg.encoder_hidden_size))
    params = model.init(jax.random.key(0), q, img,
                        input_ids=jnp.ones((2, 5), jnp.int32),
                        attention_mask=jnp.ones((2, 5)))
    out = model.apply(params, q, img)  # BLIP2: no text
    assert out.shape == (2, cfg.num_query_tokens, cfg.hidden_size)
    out2 = model.apply(params, q, img, input_ids=jnp.ones((2, 5), jnp.int32),
                       attention_mask=jnp.ones((2, 5)))
    assert out2.shape == out.shape
    # instruction must change the queries (self-attn mixes text in)
    assert float(jnp.max(jnp.abs(out2.astype(jnp.float32) - out.astype(jnp.float32)))) > 1e-5


def test_qformer_text_padding_mask_ignored():
    cfg = QFormerConfig.tiny()
    model = QFormerModel(cfg)
    q = jnp.ones((1, cfg.num_query_tokens, cfg.hidden_size))
    img = jnp.ones((1, 9, cfg.encoder_hidden_size))
    ids_a = jnp.array([[5, 6, 1, 1]], jnp.int32)
    ids_b = jnp.array([[5, 6, 9, 9]], jnp.int32)  # differs only in masked slots
    mask = jnp.array([[1, 1, 0, 0]])
    params = model.init(jax.random.key(0), q, img, input_ids=ids_a, attention_mask=mask)
    out_a = model.apply(params, q, img, input_ids=ids_a, attention_mask=mask)
    out_b = model.apply(params, q, img, input_ids=ids_b, attention_mask=mask)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


# ---------------------------------------------------------------------- TGB
def _tgb_inputs(cfg, b=2, l=6, t=5):
    flow = jnp.asarray(np.random.default_rng(0).standard_normal(
        (b, l, cfg.flow_size, cfg.flow_size, 2)), jnp.float32)
    flow_mask = jnp.ones((b, l + 2))
    q_ids = jnp.ones((b, t), jnp.int32)
    q_mask = jnp.ones((b, t))
    return flow, flow_mask, q_ids, q_mask


def test_tgb_modes_and_logits_shape():
    cfg = TGBConfig.tiny()
    model = TGBModel(cfg)
    flow, fm, qi, qm = _tgb_inputs(cfg)
    params = model.init(jax.random.key(0), flow, fm, qi, qm, mode="multi_modal")
    for mode in ("fusion", "multi_modal", "text"):
        seq, logits = model.apply(params, flow, fm, qi, qm, mode=mode)
        assert seq.shape == (2, 8, cfg.hidden_size)
        assert logits.shape == (2, 6, 2)


def test_tgb_question_changes_fusion_output():
    cfg = TGBConfig.tiny()
    model = TGBModel(cfg)
    flow, fm, qi, qm = _tgb_inputs(cfg)
    params = model.init(jax.random.key(0), flow, fm, qi, qm, mode="multi_modal")
    _, l1 = model.apply(params, flow, fm, qi, qm, mode="fusion")
    _, l2 = model.apply(params, flow, fm, qi + 3, qm, mode="fusion")
    assert float(jnp.max(jnp.abs(l1 - l2))) > 1e-6


def test_tgb_eos_written_at_mask_end():
    cfg = TGBConfig.tiny()
    from videotgb_tpu.models.tgb import TemporalOFEmbedding
    emb = TemporalOFEmbedding(cfg)
    b, l = 1, 4
    flow = jnp.zeros((b, l, cfg.flow_size, cfg.flow_size, 2))
    mask_full = jnp.ones((b, l + 2))
    mask_short = jnp.concatenate([jnp.ones((b, 4)), jnp.zeros((b, 2))], axis=1)
    params = emb.init(jax.random.key(0), flow, mask_full)
    out_full = emb.apply(params, flow, mask_full)
    out_short = emb.apply(params, flow, mask_short)
    # same params, different EOS location -> position 3 differs
    assert float(jnp.max(jnp.abs(out_full[0, 3] - out_short[0, 3]))) > 1e-6


# ----------------------------------------------------------------------- T5
def test_t5_bucket_matches_hf_reference():
    # independent check of a few known bucket values (HF modeling_t5)
    rel = jnp.array([[-3, -1, 0, 1, 5, 100]])
    bi = relative_position_bucket(rel, True, 32, 128)
    uni = relative_position_bucket(rel, False, 32, 128)
    assert bi.tolist() == [[3, 1, 0, 17, 21, 31]]
    assert uni.tolist() == [[3, 1, 0, 0, 0, 0]]


def test_t5_teacher_forced_vs_cached_decode():
    cfg = T5Config.tiny()
    model = T5Model(cfg)
    b, s_in, s_out = 2, 7, 5
    enc_ids = jnp.asarray(np.random.default_rng(0).integers(2, 60, (b, s_in)))
    dec_ids = jnp.asarray(np.random.default_rng(1).integers(2, 60, (b, s_out)))
    enc_mask = jnp.ones((b, s_in))

    params = model.init(jax.random.key(0),
                        jnp.zeros((b, s_in, cfg.d_model)), enc_mask, dec_ids)
    embeds = model.apply(params, enc_ids, method=model.embed)
    logits_full = model.apply(params, embeds, enc_mask, dec_ids)
    assert logits_full.shape == (b, s_out, cfg.vocab_size)

    # incremental: feed tokens one at a time through the cache
    enc_hidden = model.apply(params, embeds, enc_mask, method=model.encode)
    caches = model.apply(params, b, s_out, s_in, method=model.init_caches)
    step_logits = []
    for t in range(s_out):
        valid = (jnp.arange(s_out)[None, :] <= t).astype(jnp.float32)
        valid = jnp.broadcast_to(valid, (b, s_out))
        logits_t, caches = model.apply(
            params, dec_ids[:, t : t + 1], enc_hidden, enc_mask,
            caches=caches, cache_index=jnp.int32(t),
            cache_positions_valid=valid, cross_prefill=(t == 0),
            method=model.decode,
        )
        step_logits.append(logits_t[:, 0])
    logits_inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(logits_inc), np.asarray(logits_full),
                               rtol=2e-2, atol=2e-2)


# -------------------------------------------------------------------- LLaMA
def test_llama_teacher_forced_vs_cached_decode():
    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    b, s = 2, 6
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 60, (b, s)))
    params = model.init(jax.random.key(0), ids)
    logits_full, _ = model.apply(params, ids)
    assert logits_full.shape == (b, s, cfg.vocab_size)

    caches = model.apply(params, b, s, method=model.init_caches)
    outs = []
    for t in range(s):
        valid = jnp.broadcast_to((jnp.arange(s) <= t).astype(jnp.float32)[None], (b, s))
        logits_t, caches = model.apply(
            params, ids[:, t : t + 1], caches=caches,
            cache_index=jnp.int32(t), cache_positions_valid=valid,
        )
        outs.append(logits_t[:, 0])
    logits_inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(logits_inc), np.asarray(logits_full),
                               rtol=2e-2, atol=2e-2)


def test_llama_prefill_then_decode():
    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    b, prompt, total = 1, 4, 6
    ids = jnp.asarray(np.random.default_rng(2).integers(2, 60, (b, total)))
    params = model.init(jax.random.key(0), ids)
    logits_full, _ = model.apply(params, ids)

    caches = model.apply(params, b, total, method=model.init_caches)
    valid_p = jnp.broadcast_to(
        (jnp.arange(total) < prompt).astype(jnp.float32)[None], (b, total))
    logits_p, caches = model.apply(
        params, ids[:, :prompt], caches=caches, cache_index=jnp.int32(0),
        cache_positions_valid=valid_p)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits_full[:, :prompt]),
                               rtol=2e-2, atol=2e-2)
    for t in range(prompt, total):
        valid = jnp.broadcast_to((jnp.arange(total) <= t).astype(jnp.float32)[None],
                                 (b, total))
        logits_t, caches = model.apply(
            params, ids[:, t : t + 1], caches=caches, cache_index=jnp.int32(t),
            cache_positions_valid=valid)
        np.testing.assert_allclose(np.asarray(logits_t[:, 0]),
                                   np.asarray(logits_full[:, t]),
                                   rtol=2e-2, atol=2e-2)
