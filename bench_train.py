"""Training-step benchmark: the TG (sampler) and SF (self-refinement) recipes.

Complements bench.py (inference) with the BASELINE training configs: the
TG stage trains the full 110M TGB at batch 32 (reference recipe:
configs/experiment/LSTP_TG_blip2flant5xl_videoinstruct.yaml — 3 epochs,
batch 32, single device), and the SF stage's jitted joint step on the small
preset. Prints one JSON line with step times and examples/sec.

Usage: python bench_train.py   (env: TRAIN_BATCH, TRAIN_ITERS, FLOW_LEN)
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np


def main() -> None:
    batch = int(os.environ.get("TRAIN_BATCH", "32"))
    iters = int(os.environ.get("TRAIN_ITERS", "5"))
    flow_len = int(os.environ.get("FLOW_LEN", "16"))

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax
    from flax import linen as nn

    from videotgb_tpu.models.tgb import TGBConfig, TGBModel
    from videotgb_tpu.training.recipes import span_ce_loss

    # ---- TG stage at production scale: BERT-base TGB, batch 32, flow 224
    cfg = TGBConfig()  # 110M params
    model = TGBModel(cfg)
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.standard_normal(
        (batch, flow_len, cfg.flow_size, cfg.flow_size, 2)), jnp.float32)
    fm = jnp.ones((batch, flow_len + 2))
    qi = jnp.asarray(rng.integers(100, 5000, (batch, 24)), jnp.int32)
    qm = jnp.ones((batch, 24))
    starts = jnp.asarray(rng.integers(0, flow_len, (batch,)), jnp.int32)
    ends = jnp.asarray(rng.integers(0, flow_len, (batch,)), jnp.int32)

    t0 = time.perf_counter()
    params = jax.jit(
        lambda k: model.init(k, flow[:1], fm[:1], qi[:1], qm[:1],
                             mode="multi_modal")
    )(jax.random.key(0))
    params = nn.meta.unbox(params)["params"]
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t0

    tx = optax.adamw(5e-5)
    opt_state = tx.init(params)

    def loss_fn(p, key):
        _, logits = model.apply({"params": p}, flow, fm, qi, qm,
                                mode="fusion", deterministic=False,
                                rngs={"dropout": key})
        return span_ce_loss(logits[..., 0], logits[..., 1], starts, ends)

    @jax.jit
    def step(p, opt, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, jax.random.key(1))
    _ = float(loss)  # host fetch = sync
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(jax.random.key(2), i))
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    tg_step_s = statistics.median(times)

    result = {
        "metric": "tg_train_examples_per_sec",
        "value": round(batch / tg_step_s, 1),
        "unit": "examples/s",
        "tg_step_ms": round(tg_step_s * 1000, 1),
        "batch": batch,
        "flow_len": flow_len,
        "tg_params_millions": round(
            sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params)) / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "init_s": round(init_s, 1),
    }
    print(json.dumps(result))

    # ---- SF stage (small preset): the jitted joint step with the frozen
    # vision tower's backward pruned (trainer stop_gradient split) and the
    # fused flash-attention backward in the trainable towers
    sf_batch = int(os.environ.get("SF_BATCH", "8"))
    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training.recipes import SFRecipe
    from videotgb_tpu.training.trainer import Trainer, TrainerConfig

    vcfg = VideoTGBConfig.small()
    vmodel = VideoTGB(vcfg)
    recipe = SFRecipe()
    image = vcfg.blip2.vit.image_size
    fs = vcfg.tgb.flow_size
    sf_flow_len = 8
    rng2 = np.random.default_rng(1)
    sf = {
        "frames": jnp.asarray(rng2.standard_normal(
            (sf_batch, vcfg.num_frames, image, image, 3)), jnp.float32),
        "flow": jnp.asarray(rng2.standard_normal(
            (sf_batch, sf_flow_len, fs, fs, 2)), jnp.float32),
        "flow_mask": jnp.ones((sf_batch, sf_flow_len + 2), jnp.float32),
        "video_length": jnp.full((sf_batch,), sf_flow_len, jnp.int32),
        "sampler_question_ids": jnp.asarray(
            rng2.integers(5, 300, (sf_batch, 16)), jnp.int32),
        "sampler_question_mask": jnp.ones((sf_batch, 16), jnp.float32),
        "question_ids": jnp.asarray(
            rng2.integers(5, 300, (sf_batch, 16)), jnp.int32),
        "question_mask": jnp.ones((sf_batch, 16), jnp.float32),
        "answer_ids": jnp.asarray(
            rng2.integers(5, 300, (sf_batch, 8)), jnp.int32),
        "scores": jnp.asarray(
            rng2.random((sf_batch, vcfg.num_frames)), jnp.float32),
    }
    key = jax.random.key(0)
    t0 = time.perf_counter()
    variables = jax.jit(lambda k: vmodel.init(
        k, sf["frames"][:1], sf["flow"][:1], sf["flow_mask"][:1],
        sf["video_length"][:1], sf["sampler_question_ids"][:1],
        sf["sampler_question_mask"][:1], sf["question_ids"][:1],
        sf["question_mask"][:1], k, method=vmodel.init_pipeline))(key)
    sf_params = nn.meta.unbox(variables)["params"]
    jax.block_until_ready(sf_params)
    sf_init_s = time.perf_counter() - t0

    tcfg = TrainerConfig(max_steps=100, lr=5e-5)
    trainer = Trainer(
        tcfg, lambda p, b, k: recipe.loss_fn(vmodel, p, b, k),
        filter_fn=recipe.filter_fn)
    state = trainer.init_state(sf_params)

    t0 = time.perf_counter()
    state, m = trainer.train_step(state, sf)
    _ = float(m["loss"])
    sf_compile_s = time.perf_counter() - t0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, sf)
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    sf_step_s = statistics.median(times)
    print(json.dumps({
        "metric": "sf_train_examples_per_sec",
        "value": round(sf_batch / sf_step_s, 1),
        "unit": "examples/s",
        "sf_step_ms": round(sf_step_s * 1000, 1),
        "batch": sf_batch,
        "preset": "small",
        "compile_s": round(sf_compile_s, 1),
        "init_s": round(sf_init_s, 1),
    }))


if __name__ == "__main__":
    main()
