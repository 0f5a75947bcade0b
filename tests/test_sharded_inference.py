"""Multi-device inference: the full generate pipeline jitted over a
(dp, fsdp, tp) mesh — the serving layout for pods (SURVEY.md section 2.7's
inference-sharding row plus the tp axis the reference lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn
from jax.sharding import NamedSharding, PartitionSpec as P

from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig, generate_blip2
from videotgb_tpu.ops.decode import DecodeConfig
from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh
from videotgb_tpu.parallel.sharding import param_partition_spec, shard_batch


def test_generate_blip2_sharded_dp_tp():
    mesh = create_mesh(MeshConfig(dp=4, fsdp=1, tp=2))
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    b, l_flow = 8, 3
    img = cfg.blip2.vit.image_size
    fs = cfg.tgb.flow_size
    rng = np.random.default_rng(0)
    batch = {
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
    }
    key = jax.random.key(0)
    boxed = model.init(
        key, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], key, method=model.init_pipeline,
    )
    specs = param_partition_spec(boxed["params"])
    params_unboxed = nn.meta.unbox(boxed)["params"]
    # reference output on a single device before sharding
    dcfg = DecodeConfig(max_new_tokens=4, eos_token_id=1, pad_token_id=0)
    tokens_single, cand_single = generate_blip2(
        model, {"params": params_unboxed}, batch, dcfg, key)

    params_sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params_unboxed, specs)
    # at least one parameter is genuinely tp-sharded
    shardings = [x.sharding.spec for x in jax.tree.leaves(params_sharded)]
    assert any("tp" in str(s) for s in shardings), shardings[:5]

    sharded_batch = shard_batch(batch, mesh)
    gen = jax.jit(lambda p, bt, k: generate_blip2(model, {"params": p}, bt,
                                                  dcfg, k))
    tokens, cand = gen(params_sharded, sharded_batch, key)
    # selection must match exactly; decode tokens may flip on near-ties
    # (tp-sharded psum reduction order under bf16)
    np.testing.assert_array_equal(np.asarray(cand), np.asarray(cand_single))
    agree = np.mean(np.asarray(tokens) == np.asarray(tokens_single))
    # random weights give near-uniform logits, so a fraction of greedy picks
    # flip with any change in psum/reduction order; the hard guarantees are
    # the exact cand match above and the structural decode
    assert agree >= 0.7, (agree, tokens, tokens_single)
