"""Checkpoint-conversion CLI test: tiny HF BLIP2 + BERT + RAFT checkpoints on
disk -> Orbax tree -> restored weights match the sources numerically."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_assets(tmp_path_factory):
    from transformers import (
        BertConfig, BertModel, Blip2Config, Blip2ForConditionalGeneration,
        Blip2QFormerConfig, Blip2VisionConfig, T5Config,
    )

    root = tmp_path_factory.mktemp("hf")
    vision = Blip2VisionConfig(hidden_size=64, intermediate_size=128,
                               num_hidden_layers=2, num_attention_heads=4,
                               image_size=56, patch_size=14, hidden_act="gelu",
                               layer_norm_eps=1e-6)
    qformer = Blip2QFormerConfig(vocab_size=384, hidden_size=32,
                                 num_hidden_layers=2, num_attention_heads=2,
                                 intermediate_size=64, hidden_act="gelu",
                                 encoder_hidden_size=64,
                                 cross_attention_frequency=2)
    text = T5Config(vocab_size=384, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                    num_layers=2, num_decoder_layers=2,
                    feed_forward_proj="gated-gelu", tie_word_embeddings=False)
    blip2 = Blip2ForConditionalGeneration(
        Blip2Config(vision_config=vision.to_dict(),
                    qformer_config=qformer.to_dict(),
                    text_config=text.to_dict(), num_query_tokens=8))
    blip2.save_pretrained(root / "blip2", safe_serialization=False)

    bert = BertModel(BertConfig(vocab_size=384, hidden_size=32,
                                num_hidden_layers=4, num_attention_heads=2,
                                intermediate_size=64,
                                max_position_embeddings=128))
    bert.save_pretrained(root / "bert", safe_serialization=False)

    import sys

    sys.path.insert(0, "/root/reference")
    try:
        from src.models.components.xraft import RAFT as RefRAFT
    finally:
        sys.path.remove("/root/reference")
    raft = RefRAFT()
    torch.save(raft.state_dict(), root / "raft.pth")
    return root, blip2, bert, raft


def test_convert_cli_round_trip(hf_assets, tmp_path):
    root, blip2, bert, raft = hf_assets
    from videotgb_tpu.tools.convert_checkpoint import main

    out = main([
        "--preset", "tiny", "--backbone", "blip2",
        "--backbone_dir", str(root / "blip2"),
        "--bert_dir", str(root / "bert"),
        "--raft_path", str(root / "raft.pth"),
        "--output", str(tmp_path / "orbax"),
        "--lenient",
    ])

    # restore and spot-check exact weight transfer
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training.checkpoint import CheckpointConfig, CheckpointManager

    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    key = jax.random.key(1)
    image = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size
    variables = model.init(
        key, jnp.zeros((1, cfg.num_frames, image, image, 3)),
        jnp.zeros((1, 4, fs, fs, 2)), jnp.ones((1, 6)), jnp.full((1,), 4),
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)),
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8)), key,
        method=model.init_pipeline)
    template = nn.meta.unbox(variables)["params"]
    restored = CheckpointManager(CheckpointConfig(directory=out)).restore(
        template={"params": template})["params"]

    sd = {k: v.detach().numpy() for k, v in blip2.state_dict().items()}
    np.testing.assert_allclose(
        np.asarray(restored["model"]["vision_model"]["embeddings"]["cls_token"]),
        sd["vision_model.embeddings.class_embedding"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored["model"]["language_model"]["shared"]["embedding"]),
        sd["language_model.shared.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored["model"]["query_tokens"]),
        sd["query_tokens"], rtol=1e-6)

    bert_sd = {k: v.detach().numpy() for k, v in bert.state_dict().items()}
    np.testing.assert_allclose(
        np.asarray(restored["temporal_encoder"]["word_embeddings"]["embedding"]),
        bert_sd["embeddings.word_embeddings.weight"], rtol=1e-6)

    raft_sd = {k: v.detach().numpy() for k, v in raft.state_dict().items()}
    np.testing.assert_allclose(
        np.asarray(restored["of_extractor"]["fnet"]["conv1"]["kernel"]),
        raft_sd["fnet.conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
