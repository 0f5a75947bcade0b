"""Extended recipe tests: E2E, SF online-flow, InstructBLIP IV, Albert TGB."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from videotgb_tpu.models.instructblip import pack_text_input_output
from videotgb_tpu.models.tgb import TGBConfig, TGBModel
from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
from videotgb_tpu.training.recipes import E2ERecipe, IVRecipe, RECIPES, SFRecipe


def _batch_for(cfg, b=2, l_flow=4):
    img = (cfg.blip2 or cfg.instructblip).vit.image_size
    fs = cfg.tgb.flow_size
    rng = np.random.default_rng(0)
    return {
        "frames": jnp.asarray(rng.standard_normal(
            (b, cfg.num_frames, img, img, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((b, l_flow, fs, fs, 2)),
                            jnp.float32),
        "flow_mask": jnp.ones((b, l_flow + 2)),
        "video_length": jnp.full((b,), l_flow),
        "sampler_question_ids": jnp.ones((b, 5), jnp.int32) * 7,
        "sampler_question_mask": jnp.ones((b, 5)),
        "question_ids": jnp.asarray(rng.integers(4, 60, (b, 6)), jnp.int32),
        "question_mask": jnp.ones((b, 6)),
        "answer_ids": jnp.asarray(rng.integers(4, 60, (b, 4)), jnp.int32),
        "scores": jnp.asarray(rng.random((b, cfg.num_frames)), jnp.float32),
    }


def _init(model, batch, key):
    return nn.meta.unbox(model.init(
        key, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], key, method=model.init_pipeline,
    ))


def test_e2e_recipe_blip2():
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    batch = _batch_for(cfg)
    params = _init(model, batch, jax.random.key(0))
    recipe = E2ERecipe()
    loss, aux = recipe.loss_fn(model, params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert aux["cand"].shape == (2, cfg.nframe)
    # freeze policy: LLM frozen, TGB + qformer trainable
    f = recipe.filter_fn
    assert not f((jax.tree_util.DictKey("model"),
                  jax.tree_util.DictKey("language_model"),
                  jax.tree_util.DictKey("x")), None)
    assert f((jax.tree_util.DictKey("temporal_encoder"),
              jax.tree_util.DictKey("x")), None)
    assert f((jax.tree_util.DictKey("model"),
              jax.tree_util.DictKey("qformer"),
              jax.tree_util.DictKey("x")), None)


def test_sf_online_flow_recipe():
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    batch = _batch_for(cfg)
    b, l_flow = 2, 4
    # raw RGB frames (>=64px for the 4-level corr pyramid), L+1 of them
    batch["flow_frames"] = jnp.asarray(
        np.random.default_rng(1).random((b, l_flow + 1, 64, 64, 3)) * 255,
        jnp.float32)
    # flow from RAFT is 64x64 but TGB expects flow_size; use a matching cfg
    cfg64 = dataclasses.replace(cfg, tgb=dataclasses.replace(cfg.tgb, flow_size=64))
    model64 = VideoTGB(cfg64)
    batch["flow"] = jnp.zeros((b, l_flow, 64, 64, 2))
    params = _init(model64, batch, jax.random.key(0))
    recipe = SFRecipe(online_flow=True)
    loss, aux = recipe.loss_fn(model64, params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert float(aux["mrc_loss"]) >= 0


def test_iv_recipe_instructblip_packed_labels():
    cfg = VideoTGBConfig.tiny("instructblip")
    model = VideoTGB(cfg)
    batch = _batch_for(cfg)
    ids, mask, labels = pack_text_input_output(
        [[4, 5, 6], [7, 8]], [[9, 10], [11]], max_len=8, pad_id=0)
    batch["instruction_ids"] = ids
    batch["instruction_mask"] = mask
    batch["labels"] = labels
    batch["qformer_input_ids"] = jnp.ones((2, 3), jnp.int32) * 9
    batch["qformer_attention_mask"] = jnp.ones((2, 3))
    batch["frames"] = batch["frames"][:, : cfg.nframe]
    params = _init(model, batch, jax.random.key(0))
    loss, _ = IVRecipe().loss_fn(model, params, batch, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_recipe_registry_complete():
    assert set(RECIPES) == {"tg", "sf", "e2e", "iv", "ivt"}


def test_albert_tgb_shares_parameters():
    """The ALBERT TGB variant reuses one layer group's weights at every
    depth (numeric parity vs the mounted xropealbert is in test_parity.py)."""
    from videotgb_tpu.models.tgb import AlbertTGBConfig, AlbertTGBModel

    cfg = AlbertTGBConfig(vocab_size=384, embedding_size=16, hidden_size=32,
                          num_layers=4, num_heads=2, intermediate_size=64,
                          fusion_layer=2, flow_size=32,
                          max_position_embeddings=128)
    model = AlbertTGBModel(cfg)
    b, l, t = 1, 3, 4
    flow = jnp.zeros((b, l, cfg.flow_size, cfg.flow_size, 2))
    fm = jnp.ones((b, l + 2))
    qi = jnp.ones((b, t), jnp.int32)
    params = model.init(jax.random.key(0), flow, fm, qi, jnp.ones((b, t)),
                        mode="multi_modal")
    names = set(nn.meta.unbox(params)["params"].keys())
    assert "group_0_inner_0" in names
    assert not any(n.startswith("layer_") for n in names)
    seq, logits = model.apply(params, flow, fm, qi, jnp.ones((b, t)),
                              mode="multi_modal")
    assert logits.shape == (b, l, 2)
    # one shared layer's worth of encoder params instead of num_layers
    dense_params = TGBModel(TGBConfig.tiny()).init(
        jax.random.key(0), flow, fm, qi, jnp.ones((b, t)), mode="multi_modal")
    n_shared = sum(p.size for p in jax.tree.leaves(params))
    n_dense = sum(p.size for p in jax.tree.leaves(dense_params))
    assert n_shared < n_dense

    # every param's logical axes must resolve to a VALID PartitionSpec (a
    # duplicate name like ("embed","embed") raises on NamedSharding)
    from jax.sharding import NamedSharding

    from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh
    from videotgb_tpu.parallel.sharding import param_partition_spec

    mesh = create_mesh(MeshConfig(dp=-1, fsdp=2, tp=2))
    specs = param_partition_spec(params["params"])
    jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                 is_leaf=lambda x: not isinstance(x, dict))


def test_ivt_text_only_rows_masked():
    """A width-0 row's loss must be independent of its (zeroed) frames."""
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    batch = _batch_for(cfg)
    batch["frames"] = batch["frames"][:, : cfg.nframe]
    batch["widths"] = jnp.array([cfg.nframe, 0])
    params = _init(model, batch, jax.random.key(0))
    l1, _ = IVRecipe().loss_fn(model, params, batch, jax.random.key(1))
    b2 = dict(batch)
    frames = np.asarray(batch["frames"]).copy()
    frames[1] = 99.0  # garbage into the text-only row's frame slab
    b2["frames"] = jnp.asarray(frames)
    l2, _ = IVRecipe().loss_fn(model, params, b2, jax.random.key(1))
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
