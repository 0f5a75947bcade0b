"""Pipeline-level generate parity vs the MOUNTED torch reference.

test_parity.py proves every component is exact; these tests prove the
COMPOSITION is exact: the reference's actual inference wrappers
(/root/reference/eval/utils/model.py LSTP_blip2 :238 and LSTP :19) are
instantiated from tiny HF configs, their state_dict is converted through
training.convert (the same per-subtree mapping the checkpoint CLI uses,
videotgb_tpu/tools/convert_checkpoint.py --lightning_ckpt branch), and both
pipelines run on the same frames / flow frames / question with deterministic
selection (Gumbel noise disabled on both sides) and greedy decode. Asserted:
identical selected frame indices AND identical output token ids.

This covers the glue that component tests cannot: RAFT-online flow wiring
(eval/utils/model.py:294-303), span rescale (:350 blip2 vs :135 vicuna),
exclusive-end union/dedup/resample (:352-364), Q-Former mean-pool to 32
tokens (:393-398), [visual | prompt] packing (:423-425), and the greedy
decode loop itself.

Determinism knobs (documented, not semantic changes):
  * torch F.gumbel_softmax -> softmax (argmax == argmax(logits)); our
    gumbel_span_sample -> plain argmax tiled to top_k. Both sides therefore
    take the SAME span candidates iff the span logits agree.
  * do_sample=False (greedy) everywhere.
"""

from __future__ import annotations

import dataclasses
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videotgb_tpu.training import convert as C

F32 = dict(dtype=jnp.float32, param_dtype=jnp.float32)
REF = "/root/reference"


def _shim_transformers():
    """The reference pins transformers 4.36; some modeling_utils symbols
    moved to pytorch_utils since (same shim as tests/test_parity.py)."""
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as ptu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name) and hasattr(ptu, name):
            setattr(mu, name, getattr(ptu, name))


@pytest.fixture(scope="module")
def refmod():
    _shim_transformers()
    sys.path.insert(0, REF)
    try:
        import eval.utils.model as m
        import src.models.components.xblip2 as xb
        import src.models.components.xinstructblip as xib
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REF)
    # the forks pin transformers 4.36; today's PreTrainedModel.__init__
    # validates _keep_in_fp32_modules against each submodule's graph and
    # rejects "wo" on Blip2VisionModel. The list only matters for fp16/8bit
    # loading — inert here (everything is built f32 from config).
    xb.Blip2PreTrainedModel._keep_in_fp32_modules = None
    xib.InstructBlipPreTrainedModel._keep_in_fp32_modules = None
    return m


def _tiny_bert_config(**_):
    """Tiny stand-in for the wrapper's hardcoded
    BertConfig(fusion_layer=6, encoder_width=768) (eval/utils/model.py:254):
    same knobs, tiny sizes, matching TGBConfig.tiny()."""
    from transformers import BertConfig

    return BertConfig(
        fusion_layer=2, encoder_width=32, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=2, intermediate_size=64,
        vocab_size=384, max_position_embeddings=128, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )


def _det_gumbel_jax(monkeypatch):
    """Noise-free span draw: argmax(logits) tiled to top_k — the exact
    deterministic limit of gumbel_softmax+argmax on the torch side."""
    import videotgb_tpu.models.videotgb as vmod

    def det(start_logits, end_logits, key, top_k=2, tau=0.5):
        s = jnp.argmax(start_logits, axis=-1).astype(jnp.int32)[:, None]
        e = jnp.argmax(end_logits, axis=-1).astype(jnp.int32)[:, None]
        return jnp.tile(s, (1, top_k)), jnp.tile(e, (1, top_k))

    monkeypatch.setattr(vmod, "gumbel_span_sample", det)


def _det_gumbel_torch(monkeypatch):
    import torch.nn.functional as F

    monkeypatch.setattr(
        F, "gumbel_softmax",
        lambda logits, tau=1.0, hard=False, dim=-1, **kw:
            torch.softmax(logits / tau, dim=dim),
    )


def _sd(module) -> dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().to(torch.float32).numpy())
            for k, v in module.state_dict().items()}


def _strip(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ------------------------------------------------------------ tiny HF configs
def _tiny_hf_vision():
    from transformers import Blip2VisionConfig

    return Blip2VisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu", layer_norm_eps=1e-6, attention_dropout=0.0,
    )


def _tiny_my_backbone_parts():
    from videotgb_tpu.models.qformer import QFormerConfig
    from videotgb_tpu.models.vit import ViTConfig

    vit = ViTConfig(image_size=56, patch_size=14, hidden_size=64,
                    num_layers=2, num_heads=4, intermediate_size=128, **F32)
    # num_query_tokens MUST be 32: the reference wrapper hardcodes the
    # 32-token mean-pool buffer (eval/utils/model.py:393)
    qf = QFormerConfig(vocab_size=384, hidden_size=32, num_layers=2,
                       num_heads=2, intermediate_size=64, num_query_tokens=32,
                       encoder_hidden_size=64, **F32)
    return vit, qf


def _convert_backbone_common(sub: dict, flat: dict, instruct: bool):
    flat.update(C.with_subtree(
        C.convert_blip2_vision(sub, 2, "vision_model."),
        "model", "vision_model"))
    flat.update(C.with_subtree(
        C.convert_blip2_qformer(sub, 2, 2, "qformer.", instruct=instruct),
        "model", "qformer"))
    flat[("model", "query_tokens")] = sub["query_tokens"]
    flat[("model", "language_projection", "kernel")] = (
        sub["language_projection.weight"].T)
    flat[("model", "language_projection", "bias")] = (
        sub["language_projection.bias"])
    # the fork's reserved flow projection (xblip2.py:1551) — dead in the
    # generate path but converted for tree completeness
    flat[("model", "temporal_projection", "kernel")] = (
        sub["temporal_projection.weight"].T)
    flat[("model", "temporal_projection", "bias")] = (
        sub["temporal_projection.bias"])


def _convert_wrapper(ref, model, params, backbone: str):
    """Reference wrapper state_dict -> our VideoTGB param tree, via the same
    converters the checkpoint CLI composes (tools/convert_checkpoint.py)."""
    from flax import linen as nn

    sd = _sd(ref)
    flat: dict = {}
    flat.update(C.with_subtree(
        C.convert_reference_tgb(_strip(sd, "temporal_encoder."), 4, 2),
        "temporal_encoder"))
    flat.update(C.with_subtree(
        C.convert_raft(_strip(sd, "of_extractor.")), "of_extractor"))
    sub = _strip(sd, "model.")
    _convert_backbone_common(sub, flat, instruct=(backbone == "instructblip"))
    if backbone == "blip2":
        flat.update(C.with_subtree(
            C.convert_t5(sub, 2, 2, "language_model."),
            "model", "language_model"))
    else:
        flat.update(C.with_subtree(
            C.convert_llama(sub, 2, "language_model."),
            "model", "language_model"))
    unboxed = nn.meta.unbox(params)["params"]
    return {"params": C.merge_into(unboxed, flat)}


def _init_my_params(model, batch, key):
    return model.init(
        key, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], key, method=model.init_pipeline,
    )


def _inputs(rng, b=1, num_frames=8, l_flow=3, img=56, tq=6, ts=5):
    """Shared raw inputs. Flow frames are 224 px (the reference's
    TemporalOFEmbedding hardcodes 224/16 patches)."""
    frames = rng.standard_normal((b, num_frames, img, img, 3)).astype(np.float32)
    flow_frames = (rng.random((b, l_flow, 224, 224, 3)) * 255).astype(np.float32)
    q_ids = rng.integers(2, 380, (b, tq))
    s_ids = rng.integers(2, 380, (b, ts))
    return frames, flow_frames, q_ids, s_ids


def _assert_tokens_match(hf_new_tokens, mine, pad_id):
    """hf_new_tokens: the reference's generated ids AFTER any prompt/start
    token (python list). mine: (max_new,) list. HF stops at EOS; ours pads
    after it."""
    n = len(hf_new_tokens)
    assert mine[:n] == hf_new_tokens, (mine, hf_new_tokens)
    assert all(t == pad_id for t in mine[n:]), (mine, hf_new_tokens)


# ------------------------------------------------------------------- BLIP2
def test_lstp_blip2_generate_parity_with_reference(refmod, monkeypatch,
                                                   tmp_path):
    """Reference LSTP_blip2.generate (eval/utils/model.py:266-445) vs
    generate_blip2: identical cand_index and greedy token ids."""
    from transformers import Blip2Config as HFBlip2Config
    from transformers import BatchEncoding, T5Config as HFT5Config

    from videotgb_tpu.models.blip2 import Blip2Config
    from videotgb_tpu.models.raft import RAFTConfig
    from videotgb_tpu.models.t5 import T5Config
    from videotgb_tpu.models.tgb import TGBConfig
    from videotgb_tpu.models.videotgb import (VideoTGB, VideoTGBConfig,
                                              generate_blip2)
    from videotgb_tpu.ops.decode import DecodeConfig

    _det_gumbel_torch(monkeypatch)
    _det_gumbel_jax(monkeypatch)
    monkeypatch.setattr(refmod, "BertConfig", _tiny_bert_config)

    text = HFT5Config(
        vocab_size=384, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
        decoder_start_token_id=0,  # = pad, as in released t5 configs
    )
    text.architectures = ["T5ForConditionalGeneration"]
    hf_cfg = HFBlip2Config(
        vision_config=_tiny_hf_vision().to_dict(),
        qformer_config=dict(
            vocab_size=384, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64, hidden_act="gelu",
            encoder_hidden_size=64, cross_attention_frequency=2,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        ),
        text_config=text.to_dict(),
        num_query_tokens=32,
    )
    hf_cfg.save_pretrained(tmp_path)
    torch.manual_seed(11)
    ref = refmod.LSTP_blip2(str(tmp_path), device="cpu").eval()
    with torch.no_grad():  # uninitialized torch.empty bos/eos (xropebert.py)
        ref.temporal_encoder.temporal_embeddings.bos.normal_(0, 0.02)
        ref.temporal_encoder.temporal_embeddings.eos.normal_(0, 0.02)

    vit, qf = _tiny_my_backbone_parts()
    cfg = VideoTGBConfig(
        backbone="blip2",
        blip2=Blip2Config(
            vit=vit, qformer=qf,
            t5=dataclasses.replace(T5Config.tiny(), **F32)),
        tgb=dataclasses.replace(TGBConfig.tiny(), flow_size=224, **F32),
        raft=RAFTConfig(iters=20),
        nframe=4, num_frames=8, top_k=2,
    )
    model = VideoTGB(cfg)

    rng = np.random.default_rng(21)
    frames, flow_frames, q_ids, s_ids = _inputs(rng)
    b, nf = 1, cfg.nframe
    max_new = 6

    key = jax.random.key(0)
    batch = {
        "frames": jnp.asarray(frames),
        "flow": jnp.zeros((b, 3, 224, 224, 2)),  # placeholder for init
        "flow_mask": jnp.ones((b, 5)),
        "video_length": jnp.full((b,), 3),
        "sampler_question_ids": jnp.asarray(s_ids),
        "sampler_question_mask": jnp.ones(s_ids.shape),
        "question_ids": jnp.asarray(q_ids),
        "question_mask": jnp.ones(q_ids.shape),
    }
    params = _init_my_params(model, batch, key)
    params = _convert_wrapper(ref, model, params, "blip2")

    # our flow, computed by our RAFT from the same frames (raw, un-normalized
    # — the wrapper feeds RAFT output straight to the TGB)
    batch["flow"] = model.apply(params, jnp.asarray(flow_frames),
                                method=model.compute_flow)

    with torch.no_grad():
        hf_out, hf_cand = ref.generate(
            frames=torch.from_numpy(
                frames.reshape(b * 8, 56, 56, 3).transpose(0, 3, 1, 2)).contiguous(),
            flow_frames=torch.from_numpy(
                flow_frames.transpose(0, 1, 4, 2, 3)).contiguous(),
            nframe=nf,
            text_encoding=BatchEncoding({
                "input_ids": torch.from_numpy(q_ids),
                "attention_mask": torch.ones(q_ids.shape, dtype=torch.long),
            }),
            sampler_text_encoding=BatchEncoding({
                "input_ids": torch.from_numpy(s_ids),
                "attention_mask": torch.ones(s_ids.shape, dtype=torch.long),
            }),
            do_sample=False, max_new_tokens=max_new,
        )
    assert isinstance(hf_cand, torch.Tensor), "reference hit its except-path"

    dcfg = DecodeConfig(max_new_tokens=max_new, eos_token_id=1, pad_token_id=0)
    mine, cand = generate_blip2(model, params, batch, dcfg, key)

    assert cand[0].tolist() == hf_cand.tolist()
    # HF seq2seq output row: [decoder_start, t1, ..., (eos)]
    _assert_tokens_match(hf_out[0].tolist()[1:], np.asarray(mine)[0].tolist(),
                         pad_id=0)


# ------------------------------------------------------------------ Vicuna
def test_lstp_vicuna_generate_parity_with_reference(refmod, monkeypatch,
                                                    tmp_path):
    """Reference LSTP.generate (eval/utils/model.py:47-235, the VideoTGB-7B
    wrapper) vs generate_instructblip: identical cand_index and greedy token
    ids — pins the Vicuna-only glue: multi_modal TGB mode, the int(i/L*F)
    span rescale, instruction-aware Q-Former text repeat, and the 0->2 LLaMA
    pad fixup (:232-234)."""
    from transformers import BatchEncoding
    from transformers import InstructBlipConfig as HFInstructBlipConfig
    from transformers import LlamaConfig as HFLlamaConfig

    from videotgb_tpu.models.instructblip import InstructBlipConfig
    from videotgb_tpu.models.llama import LlamaConfig
    from videotgb_tpu.models.raft import RAFTConfig
    from videotgb_tpu.models.tgb import TGBConfig
    from videotgb_tpu.models.videotgb import (VideoTGB, VideoTGBConfig,
                                              generate_instructblip)
    from videotgb_tpu.ops.decode import DecodeConfig

    _det_gumbel_torch(monkeypatch)
    _det_gumbel_jax(monkeypatch)
    monkeypatch.setattr(refmod, "BertConfig", _tiny_bert_config)

    text = HFLlamaConfig(
        vocab_size=384, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        rms_norm_eps=1e-6, attention_bias=False, rope_theta=10000.0,
        attention_dropout=0.0, pad_token_id=0,
    )
    text.architectures = ["LLaMAForCausalLM"]
    hf_cfg = HFInstructBlipConfig(
        vision_config=_tiny_hf_vision().to_dict(),
        qformer_config=dict(
            vocab_size=384, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64, hidden_act="gelu",
            encoder_hidden_size=64, cross_attention_frequency=2,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
            max_position_embeddings=512,
        ),
        text_config=text.to_dict(),
        num_query_tokens=32,
    )
    hf_cfg.save_pretrained(tmp_path)
    torch.manual_seed(13)
    ref = refmod.LSTP(str(tmp_path), device="cpu").eval()
    with torch.no_grad():
        ref.temporal_encoder.temporal_embeddings.bos.normal_(0, 0.02)
        ref.temporal_encoder.temporal_embeddings.eos.normal_(0, 0.02)

    vit, qf = _tiny_my_backbone_parts()
    cfg = VideoTGBConfig(
        backbone="instructblip",
        blip2=None,
        instructblip=InstructBlipConfig(
            vit=vit, qformer=qf,
            llm=dataclasses.replace(LlamaConfig.tiny(), **F32)),
        tgb=dataclasses.replace(TGBConfig.tiny(), flow_size=224, **F32),
        raft=RAFTConfig(iters=20),
        nframe=4, num_frames=8, top_k=2,
    )
    model = VideoTGB(cfg)

    rng = np.random.default_rng(23)
    frames, flow_frames, q_ids, s_ids = _inputs(rng)
    qf_ids = rng.integers(2, 380, (1, 4))
    b, nf = 1, cfg.nframe
    max_new = 6

    key = jax.random.key(0)
    batch = {
        "frames": jnp.asarray(frames),
        "flow": jnp.zeros((b, 3, 224, 224, 2)),
        "flow_mask": jnp.ones((b, 5)),
        "video_length": jnp.full((b,), 3),
        "sampler_question_ids": jnp.asarray(s_ids),
        "sampler_question_mask": jnp.ones(s_ids.shape),
        "question_ids": jnp.asarray(q_ids),
        "question_mask": jnp.ones(q_ids.shape),
        "qformer_input_ids": jnp.asarray(qf_ids),
        "qformer_attention_mask": jnp.ones(qf_ids.shape),
    }
    params = _init_my_params(model, batch, key)
    params = _convert_wrapper(ref, model, params, "instructblip")
    batch["flow"] = model.apply(params, jnp.asarray(flow_frames),
                                method=model.compute_flow)

    with torch.no_grad():
        hf_out, hf_cand = ref.generate(
            frames=torch.from_numpy(
                frames.reshape(b * 8, 56, 56, 3).transpose(0, 3, 1, 2)).contiguous(),
            flow_frames=torch.from_numpy(
                flow_frames.transpose(0, 1, 4, 2, 3)).contiguous(),
            nframe=nf,
            text_encoding=BatchEncoding({
                "input_ids": torch.from_numpy(q_ids),
                "attention_mask": torch.ones(q_ids.shape, dtype=torch.long),
                "qformer_input_ids": torch.from_numpy(qf_ids),
                "qformer_attention_mask": torch.ones(qf_ids.shape,
                                                     dtype=torch.long),
            }),
            sampler_text_encoding=BatchEncoding({
                "input_ids": torch.from_numpy(s_ids),
                "attention_mask": torch.ones(s_ids.shape, dtype=torch.long),
            }),
            do_sample=False, max_new_tokens=max_new,
        )
    assert isinstance(hf_cand, torch.Tensor), "reference hit its except-path"

    dcfg = DecodeConfig(max_new_tokens=max_new, eos_token_id=2, pad_token_id=0)
    mine, cand = generate_instructblip(model, params, batch, dcfg, key)

    assert cand[0].tolist() == hf_cand.tolist()
    # decoder-only generate with inputs_embeds returns only new tokens; the
    # wrapper then rewrites 0 -> 2 (eval/utils/model.py:232-234) — apply the
    # same fixup to our pad tail before comparing
    mine_fixed = np.where(np.asarray(mine) == 0, 2, np.asarray(mine))
    hf_new = hf_out[0].tolist()
    n = len(hf_new)
    got = mine_fixed[0].tolist()
    assert got[:n] == hf_new, (got, hf_new)
    assert all(t == 2 for t in got[n:])


# -------------------------------------------------- SF module eval_forward
@pytest.fixture(scope="module")
def sf_module_cls():
    """Import the reference's LSTP_SF_blip2_module with lightning /
    torchmetrics stubbed (absent from this image; eval_forward itself is
    pure torch+transformers — the stubs only supply the base class and
    metric holders the constructor instantiates)."""
    import types

    import torch.nn as nn

    _shim_transformers()

    class _Metric:
        def __init__(self, *a, **k):
            pass

    class _StubModule(types.ModuleType):
        # any symbol the reference pulls from torchmetrics resolves to the
        # inert metric holder
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return _Metric

    def _mod(name, **attrs):
        m = _StubModule(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    if "lightning" not in sys.modules:
        class LightningModule(nn.Module):
            def save_hyperparameters(self, *a, **k):
                pass

        _mod("lightning", LightningModule=LightningModule)
    tm = _mod("torchmetrics", MaxMetric=_Metric, MeanMetric=_Metric)
    cl = _mod("torchmetrics.classification", accuracy=None)
    acc = _mod("torchmetrics.classification.accuracy", Accuracy=_Metric)
    cl.accuracy = acc
    tm.classification = cl
    txt = _mod("torchmetrics.text",
               bleu=_mod("torchmetrics.text.bleu", BLEUScore=_Metric),
               bert=_mod("torchmetrics.text.bert", BERTScore=_Metric),
               rouge=_mod("torchmetrics.text.rouge", ROUGEScore=_Metric),
               perplexity=_mod("torchmetrics.text.perplexity",
                               Perplexity=_Metric))
    tm.text = txt

    sys.path.insert(0, REF)
    try:
        import src.models.LSTP_SF_blip2_module as m
        import src.models.components.xblip2 as xb
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference SF module import failed: {e}")
    finally:
        sys.path.remove(REF)
    xb.Blip2PreTrainedModel._keep_in_fp32_modules = None
    return m


def test_sf_module_eval_forward_parity_with_reference(sf_module_cls,
                                                      monkeypatch, tmp_path):
    """The reference TRAINING module's eval pipeline
    (LSTP_SF_blip2_module.eval_forward, :382-508) vs our generate_blip2 with
    the module packing: token-identical greedy output. This pins the glue
    that differs from the standalone wrapper: precomputed flow in the batch,
    per-sample of_lengths, and NO mean-pool — the visual prefix is the full
    nframe*32 Q-Former tokens (:478-486)."""
    from transformers import Blip2Config as HFBlip2Config
    from transformers import T5Config as HFT5Config

    from videotgb_tpu.models.blip2 import Blip2Config
    from videotgb_tpu.models.raft import RAFTConfig
    from videotgb_tpu.models.t5 import T5Config
    from videotgb_tpu.models.tgb import TGBConfig
    from videotgb_tpu.models.videotgb import (VideoTGB, VideoTGBConfig,
                                              generate_blip2)
    from videotgb_tpu.ops.decode import DecodeConfig

    refmod = sf_module_cls
    _det_gumbel_torch(monkeypatch)
    _det_gumbel_jax(monkeypatch)
    monkeypatch.setattr(refmod, "BertConfig", _tiny_bert_config)

    class _Proc:
        @staticmethod
        def from_pretrained(*a, **k):
            return None

    monkeypatch.setattr(refmod, "AutoProcessor", _Proc)

    # ---- released-checkpoint-style dirs the module constructor loads
    text = HFT5Config(
        vocab_size=384, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, num_decoder_layers=2, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, dropout_rate=0.0,
        decoder_start_token_id=0,
    )
    text.architectures = ["T5ForConditionalGeneration"]
    hf_cfg = HFBlip2Config(
        vision_config=_tiny_hf_vision().to_dict(),
        qformer_config=dict(
            vocab_size=384, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64, hidden_act="gelu",
            encoder_hidden_size=64, cross_attention_frequency=2,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        ),
        text_config=text.to_dict(),
        num_query_tokens=32,
    )
    torch.manual_seed(31)
    blip2 = refmod.Blip2ForConditionalGeneration(config=hf_cfg)
    blip2.save_pretrained(tmp_path / "blip2", safe_serialization=False)

    sampler_cfg = _tiny_bert_config()
    torch.manual_seed(33)
    sampler = refmod.RopeBertModel(config=sampler_cfg)
    with torch.no_grad():
        sampler.temporal_embeddings.bos.normal_(0, 0.02)
        sampler.temporal_embeddings.eos.normal_(0, 0.02)
    sampler.save_pretrained(tmp_path / "sampler", safe_serialization=False)

    sys.path.insert(0, REF)
    try:
        from src.models.components.xraft import RAFT as RefRAFT
    finally:
        sys.path.remove(REF)
    # the released raft-things.pth is a torch.DataParallel checkpoint — the
    # module strips the "module." prefix via dp_state_to_normal (and drops
    # any key without it), so save in that format
    torch.save({"module." + k: v for k, v in RefRAFT().state_dict().items()},
               tmp_path / "raft.pth")

    max_new = 6
    ref = refmod.LSTPSFModule(
        model_name_or_path=str(tmp_path / "blip2"),
        sampler_name_or_path=str(tmp_path / "sampler"),
        of_extractor_name_or_path=str(tmp_path / "raft.pth"),
        temperature=0.1, optimizer=None, scheduler="cosine",
        scheduler_params={},
        generate_configs={"do_sample": False, "max_new_tokens": max_new},
    ).eval()

    # ---- shared batch: B=2 with DIFFERENT of_lengths (per-sample selection)
    rng = np.random.default_rng(41)
    b, num_frames, l_flow, img = 2, 8, 3, 56
    nf = 4
    frames = rng.standard_normal((b, num_frames, img, img, 3)).astype(np.float32)
    flow = rng.standard_normal((b, l_flow, 2, 224, 224)).astype(np.float32)
    of_mask = np.ones((b, l_flow + 2), np.int64)
    of_lengths = np.array([3, 2], np.int64)
    s_ids = rng.integers(2, 380, (b, 5))
    q_ids = rng.integers(2, 380, (b, 6))

    ref_batch = {
        "answer": torch.zeros((b, 4), dtype=torch.long),
        "nframe": nf,
        "frames": torch.from_numpy(
            frames.reshape(b * num_frames, img, img, 3)
            .transpose(0, 3, 1, 2)).contiguous(),
        "of": torch.from_numpy(flow),
        "of_mask": torch.from_numpy(of_mask),
        "of_lengths": torch.from_numpy(of_lengths),
        "sampler_question": torch.from_numpy(s_ids),
        "sampler_question_attention_mask": torch.ones((b, 5), dtype=torch.long),
        "question": torch.from_numpy(q_ids),
        "question_attention_mask": torch.ones((b, 6), dtype=torch.long),
    }
    with torch.no_grad():
        hf_out = ref.eval_forward(ref_batch)

    # ---- our side: same weights through the converter, module packing
    vit, qf = _tiny_my_backbone_parts()
    cfg = VideoTGBConfig(
        backbone="blip2",
        blip2=Blip2Config(
            vit=vit, qformer=qf,
            t5=dataclasses.replace(T5Config.tiny(), **F32)),
        tgb=dataclasses.replace(TGBConfig.tiny(), flow_size=224, **F32),
        raft=RAFTConfig(iters=20),
        nframe=nf, num_frames=num_frames, top_k=2,
    )
    model = VideoTGB(cfg)
    key = jax.random.key(0)
    batch = {
        "frames": jnp.asarray(frames),
        "flow": jnp.asarray(flow.transpose(0, 1, 3, 4, 2)),
        "flow_mask": jnp.asarray(of_mask),
        "video_length": jnp.asarray(of_lengths),
        "sampler_question_ids": jnp.asarray(s_ids),
        "sampler_question_mask": jnp.ones(s_ids.shape),
        "question_ids": jnp.asarray(q_ids),
        "question_mask": jnp.ones(q_ids.shape),
    }
    params = _init_my_params(model, batch, key)
    params = _convert_wrapper(ref, model, params, "blip2")

    dcfg = DecodeConfig(max_new_tokens=max_new, eos_token_id=1, pad_token_id=0)
    mine, _ = generate_blip2(model, params, batch, dcfg, key,
                             mean_pool=False)

    for i in range(b):
        # HF seq2seq rows: [decoder_start, t1, ..., (eos)]; HF pads the
        # whole batch to the longest row with pad (=0)
        hf_row = [t for t in hf_out[i].tolist()[1:]]
        mine_row = np.asarray(mine)[i].tolist()
        # trim HF batch padding after its EOS (1)
        if 1 in hf_row:
            hf_row = hf_row[:hf_row.index(1) + 1]
        _assert_tokens_match(hf_row, mine_row, pad_id=0)
