"""Training tests: optimizer masking, schedules, recipes, trainer loop on the
8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
from videotgb_tpu.training.optim import (
    cosine_warmup_schedule,
    make_optimizer,
    path_freeze_filter,
)
from videotgb_tpu.training.recipes import (
    IVRecipe,
    SFRecipe,
    TGRecipe,
    pseudo_label_generate,
    span_ce_loss,
)
from videotgb_tpu.training.trainer import Trainer, TrainerConfig


def _tiny_model_and_params():
    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    b = 2
    img = cfg.blip2.vit.image_size
    l_flow = 4
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
        "answer_ids": jnp.asarray(np.random.default_rng(1).integers(2, 60, (b, 4))),
        "starts": jnp.array([1, 0]),
        "ends": jnp.array([3, 2]),
        "scores": jnp.asarray(np.random.default_rng(2).random((b, cfg.num_frames)),
                              jnp.float32),
    }
    key = jax.random.key(0)
    params = model.init(
        key, batch["frames"], batch["flow"], batch["flow_mask"],
        batch["video_length"], batch["sampler_question_ids"],
        batch["sampler_question_mask"], batch["question_ids"],
        batch["question_mask"], key, method=model.init_pipeline,
    )
    return model, nn.meta.unbox(params), batch


MODEL, PARAMS, BATCH = None, None, None


def _get():
    global MODEL, PARAMS, BATCH
    if MODEL is None:
        MODEL, PARAMS, BATCH = _tiny_model_and_params()
    return MODEL, PARAMS, BATCH


def test_cosine_warmup_schedule_shape():
    sched = cosine_warmup_schedule(1e-3, 100, warmup_ratio=0.1)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-8)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-5)
    assert float(sched(55)) < 1e-3


def test_span_ce_loss_ignore_index():
    logits = jnp.zeros((2, 4))
    # target 4 == L -> ignored; loss from sample 0 only
    loss = span_ce_loss(logits, logits, jnp.array([1, 4]), jnp.array([2, 9]))
    assert float(loss) == pytest.approx(np.log(4), rel=1e-5)


def test_freeze_filter_masks_subtrees():
    model, params, _ = _get()
    fltr = SFRecipe().filter_fn
    import optax
    tx, mask = make_optimizer(params["params"], 1e-3, filter_fn=fltr)
    from flax.traverse_util import flatten_dict
    flat_mask = flatten_dict(mask)
    vision = [v for k, v in flat_mask.items() if k[0] == "model" and k[1] == "vision_model"]
    tgb = [v for k, v in flat_mask.items() if k[0] == "temporal_encoder"]
    assert vision and not any(vision)
    assert tgb and all(tgb)


def test_frozen_params_not_updated():
    model, params, batch = _get()
    recipe = TGRecipe()

    def loss_fn(p, b, key):
        return recipe.loss_fn(model, p, b, key)[0], {}

    p0 = params["params"]
    tx, _ = make_optimizer(p0, 1e-2, filter_fn=recipe.filter_fn)
    opt_state = tx.init(p0)
    grads = jax.grad(lambda p: loss_fn(p, batch, jax.random.key(0))[0])(p0)
    updates, _ = tx.update(grads, opt_state, p0)
    import optax
    p1 = optax.apply_updates(p0, updates)
    # vision tower unchanged, TGB changed
    same = jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)),
        p0["model"]["vision_model"], p1["model"]["vision_model"])
    assert all(jax.tree.leaves(same))
    changed = jax.tree.map(
        lambda a, b: bool(jnp.any(a != b)),
        p0["temporal_encoder"], p1["temporal_encoder"])
    assert any(jax.tree.leaves(changed))


def test_tg_recipe_loss_and_grads_finite():
    model, params, batch = _get()
    recipe = TGRecipe()
    loss, aux = recipe.loss_fn(model, params, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    assert aux["start_logits"].shape == (2, 4)


def test_sf_recipe_joint_loss():
    model, params, batch = _get()
    recipe = SFRecipe()
    loss, aux = recipe.loss_fn(model, params, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    assert float(aux["mrc_loss"]) >= 0 and float(aux["lm_loss"]) >= 0
    assert aux["cand"].shape == (2, model.config.nframe)


def test_iv_recipe_mean_pool_loss():
    model, params, batch = _get()
    iv_batch = dict(batch)
    iv_batch["frames"] = batch["frames"][:, : model.config.nframe]
    loss, _ = IVRecipe().loss_fn(model, params, iv_batch, jax.random.key(0))
    assert np.isfinite(float(loss))


def test_pseudo_label_generate_shapes():
    model, params, batch = _get()
    ids = pseudo_label_generate(
        model, params, batch["frames"][:, :2], batch["question_ids"],
        batch["question_mask"], max_new_tokens=3,
    )
    assert ids.shape == (2 * 2, 3)


def test_trainer_step_decreases_tg_loss(mesh8):
    model, params, batch = _get()
    recipe = TGRecipe()

    def loss_fn(p, b, key):
        return recipe.loss_fn(model, p, b, key)

    cfg = TrainerConfig(max_steps=10, lr=5e-3, log_every=100)
    trainer = Trainer(cfg, loss_fn, filter_fn=recipe.filter_fn, mesh=mesh8)
    # copy: the jitted step donates its input buffers
    state = trainer.init_state(jax.tree.map(jnp.copy, params["params"]))
    losses = []
    for _ in range(8):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_trainer_grad_accumulation(mesh8):
    model, params, batch = _get()
    recipe = TGRecipe()

    def loss_fn(p, b, key):
        loss, aux = recipe.loss_fn(model, p, b, key)
        # scalar breakdown, like the SF/IVT recipes' mrc_loss/lm_loss
        return loss, {**aux, "span_loss": loss}

    # micro-batch axis: stack the same batch twice -> (2, B, ...)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), batch)
    cfg = TrainerConfig(max_steps=4, lr=1e-3, accumulate_grad_batches=2,
                        log_every=100)
    trainer = Trainer(cfg, loss_fn, filter_fn=recipe.filter_fn, mesh=mesh8)
    state = trainer.init_state(jax.tree.map(jnp.copy, params["params"]))
    state, metrics = trainer.train_step(state, stacked)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # aux scalar breakdowns survive accumulation (micro-batch mean) — the
    # IVT recipe trains with accum 4 in the reference and must keep them
    assert "span_loss" in metrics, metrics.keys()
    # both micro-batches are identical, so the mean equals the loss
    np.testing.assert_allclose(float(metrics["span_loss"]),
                               float(metrics["loss"]), rtol=1e-5)


def _linreg_trainer(max_steps=12, **kw):
    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"] + params["b"]
        noise = jax.random.normal(key, pred.shape) * 0.01
        loss = jnp.mean((pred + noise - batch["y"]) ** 2)
        return loss, {"loss": loss}

    cfg = TrainerConfig(max_steps=max_steps, lr=1e-2, eval_every=10_000,
                        checkpoint_every=10_000, log_every=100, seed=7, **kw)
    return Trainer(cfg, loss_fn)


def _linreg_state(trainer):
    from jax.sharding import PartitionSpec

    k = jax.random.key(0)
    params = {"w": jax.random.normal(k, (4, 3)), "b": jnp.zeros((3,))}
    specs = jax.tree.map(lambda _: PartitionSpec(), params)
    return trainer.init_state(params, param_specs=specs)


def _linreg_batches(n, seed=3):
    rng = np.random.default_rng(seed)
    return [{"x": np.asarray(rng.standard_normal((8, 4)), np.float32),
             "y": np.asarray(rng.standard_normal((8, 3)), np.float32)}
            for _ in range(n)]


def test_multi_step_matches_single_steps():
    """K-steps-per-dispatch (lax.scan over a stacked batch window) computes
    what K consecutive train_step calls would: same per-substep RNG fold,
    same params out, per-substep metrics stacked (K,)."""
    batches = _linreg_batches(4)

    t1 = _linreg_trainer()
    s1 = _linreg_state(t1)
    singles = []
    for b in batches:
        s1, m = t1.train_step(s1, b)
        singles.append({k: float(v) for k, v in m.items()})

    t2 = _linreg_trainer()
    s2 = _linreg_state(t2)
    window = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    s2, stacked = t2.train_step_multi(s2, window)

    assert int(s2.step) == int(s1.step) == 4
    for i, m in enumerate(singles):
        for k in m:
            np.testing.assert_allclose(float(stacked[k][i]), m[k],
                                       rtol=1e-5, atol=1e-7, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-7),
        s1.params, s2.params)


def test_fit_steps_per_dispatch_stops_at_horizon():
    """fit() with steps_per_dispatch=K windows the stream, never overshoots
    max_steps (K does not divide it here), and matches the K=1 run."""
    batches = _linreg_batches(20)

    t1 = _linreg_trainer(max_steps=10)
    s1 = t1.fit(_linreg_state(t1), iter(batches))
    assert int(s1.step) == 10

    t2 = _linreg_trainer(max_steps=10, steps_per_dispatch=4)
    s2 = t2.fit(_linreg_state(t2), iter(batches))
    assert int(s2.step) == 10  # 2 windows of 4 + 2 single steps
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-7),
        s1.params, s2.params)


def test_fit_steps_per_dispatch_disabled_by_batch_transform():
    """Recipes with a host pass between steps (SF pseudo-labels) fall back
    to the per-step path: the transform must see every batch."""
    batches = _linreg_batches(6)
    seen = []

    def transform(state, batch):
        seen.append(int(state.step))
        return batch

    t = _linreg_trainer(max_steps=6, steps_per_dispatch=4)
    s = t.fit(_linreg_state(t), iter(batches), batch_transform=transform)
    assert int(s.step) == 6
    assert seen == [0, 1, 2, 3, 4, 5]
