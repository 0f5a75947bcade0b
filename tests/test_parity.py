"""Numerical parity vs HF-torch (and vs the mounted reference for the TGB and
RAFT): tiny configs, converted weights, forward outputs compared in float32.

This is the round-trip proof that (a) the architectures match the reference's
exact math and (b) the checkpoint converters (training.convert) map every
weight correctly — the two things a reference user needs to trust a TPU port
of their released checkpoints (SURVEY.md section 7.2 step 3).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from videotgb_tpu.training import convert as C

F32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _close(a, b, atol=2e-4, rtol=2e-4):
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                               atol=atol, rtol=rtol)


# ---------------------------------------------------------------------- ViT
def test_vit_parity_with_hf_blip2():
    from transformers import Blip2VisionConfig, Blip2VisionModel
    from videotgb_tpu.models.vit import ViTConfig, ViTModel
    import dataclasses

    hf_cfg = Blip2VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu", layer_norm_eps=1e-6,
    )
    hf = Blip2VisionModel(hf_cfg).eval()
    cfg = dataclasses.replace(ViTConfig.tiny(), **F32)
    model = ViTModel(cfg)

    x = np.random.default_rng(0).standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        expected = hf(torch.from_numpy(x)).last_hidden_state.numpy()

    params = model.init(jax.random.key(0), jnp.zeros((1, 56, 56, 3)))
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(unboxed, C.convert_blip2_vision(_sd(hf), 2))
    got = model.apply({"params": merged}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _close(got, expected)


# ------------------------------------------------------------------ QFormer
def test_qformer_parity_with_hf_blip2():
    from transformers import Blip2QFormerConfig, Blip2QFormerModel
    from videotgb_tpu.models.qformer import QFormerConfig, QFormerModel
    import dataclasses

    hf_cfg = Blip2QFormerConfig(
        vocab_size=384, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, hidden_act="gelu",
        encoder_hidden_size=64, cross_attention_frequency=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    hf = Blip2QFormerModel(hf_cfg).eval()
    cfg = dataclasses.replace(QFormerConfig.tiny(), **F32)
    model = QFormerModel(cfg)

    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, cfg.num_query_tokens, 32)).astype(np.float32)
    img = rng.standard_normal((2, 9, 64)).astype(np.float32)
    with torch.no_grad():
        expected = hf(
            query_embeds=torch.from_numpy(q),
            encoder_hidden_states=torch.from_numpy(img),
        ).last_hidden_state.numpy()

    params = model.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(img))
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(unboxed, C.convert_blip2_qformer(_sd(hf), 2),
                          strict=False)
    got = model.apply({"params": merged}, jnp.asarray(q), jnp.asarray(img))
    _close(got, expected)


def test_qformer_parity_with_hf_instructblip():
    from transformers import InstructBlipQFormerConfig, InstructBlipQFormerModel
    from videotgb_tpu.models.qformer import QFormerConfig, QFormerModel
    import dataclasses

    hf_cfg = InstructBlipQFormerConfig(
        vocab_size=384, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, hidden_act="gelu",
        encoder_hidden_size=64, cross_attention_frequency=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        max_position_embeddings=512,
    )
    hf = InstructBlipQFormerModel(hf_cfg).eval()
    cfg = dataclasses.replace(QFormerConfig.tiny(), **F32)
    model = QFormerModel(cfg)

    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, cfg.num_query_tokens, 32)).astype(np.float32)
    img = rng.standard_normal((2, 9, 64)).astype(np.float32)
    ids = rng.integers(1, 60, (2, 5))
    mask = np.ones((2, 5), np.int64)
    # HF's instructblip qformer wants the mask over [queries | text]
    full_mask = np.concatenate(
        [np.ones((2, cfg.num_query_tokens), np.int64), mask], axis=1
    )
    with torch.no_grad():
        expected = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(full_mask),
            query_embeds=torch.from_numpy(q),
            encoder_hidden_states=torch.from_numpy(img),
        ).last_hidden_state.numpy()

    params = model.init(jax.random.key(0), jnp.asarray(q), jnp.asarray(img),
                        input_ids=jnp.asarray(ids),
                        attention_mask=jnp.asarray(mask))
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(
        unboxed, C.convert_blip2_qformer(_sd(hf), 2, instruct=True),
        strict=False,
    )
    got = model.apply({"params": merged}, jnp.asarray(q), jnp.asarray(img),
                      input_ids=jnp.asarray(ids),
                      attention_mask=jnp.asarray(mask))
    # HF returns only the query slice for instructblip qformer? It returns
    # full sequence; compare the query part.
    _close(got, expected[:, : cfg.num_query_tokens])


# ---------------------------------------------------------------------- T5
def test_t5_parity_with_hf():
    from transformers import T5Config as HFT5Config, T5ForConditionalGeneration
    from videotgb_tpu.models.t5 import T5Config, T5Model
    import dataclasses

    hf_cfg = HFT5Config(
        vocab_size=384, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
    )
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    cfg = dataclasses.replace(T5Config.tiny(), **F32)
    model = T5Model(cfg)

    rng = np.random.default_rng(3)
    enc_ids = rng.integers(2, 60, (2, 7))
    dec_ids = rng.integers(2, 60, (2, 5))
    with torch.no_grad():
        expected = hf(
            input_ids=torch.from_numpy(enc_ids),
            decoder_input_ids=torch.from_numpy(dec_ids),
        ).logits.numpy()

    params = model.init(jax.random.key(0), jnp.zeros((1, 7, 32)),
                        jnp.ones((1, 7)), jnp.asarray(dec_ids[:1]))
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(unboxed, C.convert_t5(_sd(hf), 2, 2))
    embeds = model.apply({"params": merged}, jnp.asarray(enc_ids),
                         method=model.embed)
    got = model.apply({"params": merged}, embeds, jnp.ones((2, 7)),
                      jnp.asarray(dec_ids))
    _close(got, expected, atol=5e-4, rtol=5e-4)


# -------------------------------------------------------------------- LLaMA
def test_llama_parity_with_hf():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM
    from videotgb_tpu.models.llama import LlamaConfig, LlamaModel
    import dataclasses

    hf_cfg = HFLlamaConfig(
        vocab_size=384, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-6, attention_bias=False, rope_theta=10000.0,
        attention_dropout=0.0,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = dataclasses.replace(LlamaConfig.tiny(), **F32)
    model = LlamaModel(cfg)

    rng = np.random.default_rng(4)
    ids = rng.integers(2, 60, (2, 6))
    with torch.no_grad():
        expected = hf(input_ids=torch.from_numpy(ids)).logits.numpy()

    params = model.init(jax.random.key(0), jnp.asarray(ids[:1]))
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(unboxed, C.convert_llama(_sd(hf), 2))
    got, _ = model.apply({"params": merged}, jnp.asarray(ids))
    _close(got, expected, atol=5e-4, rtol=5e-4)


# -------------------------------------------- TGB vs the mounted reference
def test_tgb_parity_with_reference_ropebert():
    # shim symbols that moved out of transformers.modeling_utils since the
    # reference's pinned transformers 4.36
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as ptu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name) and hasattr(ptu, name):
            setattr(mu, name, getattr(ptu, name))

    sys.path.insert(0, "/root/reference")
    try:
        from transformers import BertConfig
        from src.models.components.xropebert import RopeBertModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove("/root/reference")

    from videotgb_tpu.models.tgb import TGBConfig, TGBModel
    import dataclasses

    ref_cfg = BertConfig(
        fusion_layer=2, encoder_width=32, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=2, intermediate_size=64,
        vocab_size=384, max_position_embeddings=128, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(9)
    ref = RopeBertModel(config=ref_cfg).eval()
    # bos/eos are torch.empty with reset_parameters commented out
    # (xropebert.py) — uninitialized memory can be NaN
    with torch.no_grad():
        ref.temporal_embeddings.bos.normal_(0, 0.02)
        ref.temporal_embeddings.eos.normal_(0, 0.02)

    cfg = dataclasses.replace(TGBConfig.tiny(), flow_size=224, **F32)
    model = TGBModel(cfg)

    rng = np.random.default_rng(5)
    b, l, t = 2, 3, 5
    flow = rng.standard_normal((b, l, 2, 224, 224)).astype(np.float32)
    of_mask = np.ones((b, l + 2), np.int64)
    q_ids = rng.integers(1, 60, (b, t))
    q_mask = np.ones((b, t), np.int64)

    with torch.no_grad():
        ref_seq, ref_logits = ref(
            encoder_embeds=torch.from_numpy(flow),
            attention_mask=torch.from_numpy(of_mask),
            encoder_hidden_states=torch.from_numpy(q_ids),
            encoder_attention_mask=torch.from_numpy(q_mask),
            mode="multi_modal",
            return_dict=False,
        )

    flow_j = jnp.asarray(flow.transpose(0, 1, 3, 4, 2))
    params = model.init(jax.random.key(0), flow_j, jnp.asarray(of_mask),
                        jnp.asarray(q_ids), jnp.asarray(q_mask),
                        mode="multi_modal")
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(
        unboxed, C.convert_reference_tgb(_sd(ref), 4, 2), strict=False
    )
    seq, logits = model.apply({"params": merged}, flow_j, jnp.asarray(of_mask),
                              jnp.asarray(q_ids), jnp.asarray(q_mask),
                              mode="multi_modal")
    _close(seq, ref_seq.numpy(), atol=5e-4, rtol=5e-4)
    _close(logits, ref_logits.numpy(), atol=5e-4, rtol=5e-4)


def test_albert_tgb_parity_with_reference_ropealbert():
    """Numeric parity of the ALBERT-shared TGB variant vs the mounted
    xropealbert.RopeAlbertModel (VERDICT round-1 item 9: previously only
    structurally verified)."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as ptu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name) and hasattr(ptu, name):
            setattr(mu, name, getattr(ptu, name))

    sys.path.insert(0, "/root/reference")
    try:
        from transformers import AlbertConfig
        from src.models.components.xropealbert import RopeAlbertModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove("/root/reference")

    from videotgb_tpu.models.tgb import AlbertTGBConfig, AlbertTGBModel

    ref_cfg = AlbertConfig(
        vocab_size=384, embedding_size=16, hidden_size=32,
        num_hidden_layers=4, num_hidden_groups=1, inner_group_num=1,
        num_attention_heads=2, intermediate_size=64, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=128, classifier_dropout_prob=0.0,
    )
    torch.manual_seed(9)
    ref = RopeAlbertModel(config=ref_cfg, add_pooling_layer=False).eval()
    # the reference's bos/eos are torch.empty with reset_parameters commented
    # out (xropealbert.py:91-92,100) — uninitialized memory can be NaN; give
    # them real values before comparing
    with torch.no_grad():
        ref.temporal_embeddings.bos.normal_(0, 0.02)
        ref.temporal_embeddings.eos.normal_(0, 0.02)

    cfg = AlbertTGBConfig(
        vocab_size=384, embedding_size=16, hidden_size=32, num_layers=4,
        num_heads=2, intermediate_size=64, act="gelu",
        max_position_embeddings=128, **F32)
    model = AlbertTGBModel(cfg)

    rng = np.random.default_rng(8)
    b, l, t = 2, 3, 5
    # the reference's TemporalFlowEmbedding hardcodes 224/16 patches
    flow = rng.standard_normal((b, l, 2, 224, 224)).astype(np.float32)
    of_mask = np.ones((b, l + 2), np.int64)
    q_ids = rng.integers(1, 60, (b, t))
    q_mask = np.ones((b, t), np.int64)

    with torch.no_grad():
        ref_seq, ref_logits = ref(
            encoder_embeds=torch.from_numpy(flow),
            attention_mask=torch.from_numpy(of_mask),
            encoder_hidden_states=torch.from_numpy(q_ids),
            encoder_attention_mask=torch.from_numpy(q_mask),
            mode="multi_modal",
        )

    flow_j = jnp.asarray(flow.transpose(0, 1, 3, 4, 2))
    params = model.init(jax.random.key(0), flow_j, jnp.asarray(of_mask),
                        jnp.asarray(q_ids), jnp.asarray(q_mask),
                        mode="multi_modal")
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(
        unboxed, C.convert_reference_albert_tgb(_sd(ref), 1, 1), strict=False)
    seq, logits = model.apply({"params": merged}, flow_j, jnp.asarray(of_mask),
                              jnp.asarray(q_ids), jnp.asarray(q_mask),
                              mode="multi_modal")
    _close(seq, ref_seq.numpy(), atol=5e-4, rtol=5e-4)
    _close(logits, ref_logits.numpy(), atol=5e-4, rtol=5e-4)


# -------------------------------------------- RAFT vs the mounted reference
def test_raft_parity_with_reference():
    sys.path.insert(0, "/root/reference")
    try:
        from src.models.components.xraft import RAFT as RefRAFT
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove("/root/reference")

    from videotgb_tpu.models.raft import RAFT, RAFTConfig

    ref = RefRAFT().eval()
    model = RAFT(RAFTConfig(iters=3))

    # >= 128px: at 64px the level-3 corr map is 1x1 and the reference's
    # grid_sample normalization divides by (W-1)=0 -> NaN (a genuine
    # small-input bug in the torch path; our direct pixel-coord lookup is
    # well-defined there, but parity needs both sides finite)
    rng = np.random.default_rng(6)
    img1 = (rng.random((1, 3, 128, 128)) * 255).astype(np.float32)
    img2 = (rng.random((1, 3, 128, 128)) * 255).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(img1), torch.from_numpy(img2),
                       iters=3, test_mode=True).numpy()

    params = model.init(jax.random.key(0),
                        jnp.asarray(img1.transpose(0, 2, 3, 1)),
                        jnp.asarray(img2.transpose(0, 2, 3, 1)))
    from flax import linen as nn
    unboxed = nn.meta.unbox(params)["params"]
    merged = C.merge_into(unboxed, C.convert_raft(_sd(ref)))
    got = model.apply({"params": merged},
                      jnp.asarray(img1.transpose(0, 2, 3, 1)),
                      jnp.asarray(img2.transpose(0, 2, 3, 1)))
    _close(got.transpose(0, 3, 1, 2), expected, atol=1e-3, rtol=1e-3)
