"""Pipeline parallelism: the pipelined scan must equal the sequential layer
stack exactly, stay differentiable, and compose with a transformer layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from videotgb_tpu.parallel.pipeline import pipeline_apply, place_pipeline_params


def _mesh(pp):
    devs = np.array(jax.devices()[:pp]).reshape(pp)
    return Mesh(devs, ("pp",))


def _mlp_layer(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _stack_mlp(key, n_layers, d):
    ks = jax.random.split(key, 2)
    return {
        "w": jax.random.normal(ks[0], (n_layers, d, d)) * 0.3,
        "b": jax.random.normal(ks[1], (n_layers, d)) * 0.1,
    }


def _sequential(params, x):
    def body(h, p):
        return _mlp_layer(p, h), None
    out, _ = jax.lax.scan(body, x, params)
    return out


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 4), (4, 8), (8, 4)])
def test_pipeline_matches_sequential(pp, microbatches):
    if len(jax.devices()) < pp:
        pytest.skip("needs devices")
    mesh = _mesh(pp)
    n_layers, d, b = 8, 16, 8
    params = _stack_mlp(jax.random.key(0), n_layers, d)
    x = jax.random.normal(jax.random.key(1), (b, 4, d))
    expected = _sequential(params, x)
    sharded = place_pipeline_params(params, mesh, "pp")
    got = jax.jit(lambda p, x: pipeline_apply(
        _mlp_layer, p, x, mesh, "pp", microbatches))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_pp1_fallback():
    mesh = _mesh(1)
    params = _stack_mlp(jax.random.key(0), 4, 8)
    x = jax.random.normal(jax.random.key(1), (4, 8))
    got = pipeline_apply(_mlp_layer, params, x, mesh, "pp")
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_sequential(params, x)), rtol=1e-6)


def test_pipeline_is_differentiable():
    """Grads through the pipelined scan equal grads through the sequential
    stack (training across pp stages works)."""
    pp = 4
    if len(jax.devices()) < pp:
        pytest.skip("needs devices")
    mesh = _mesh(pp)
    n_layers, d, b = 4, 8, 8
    params = _stack_mlp(jax.random.key(0), n_layers, d)
    x = jax.random.normal(jax.random.key(1), (b, d))

    def loss_seq(p):
        return jnp.sum(_sequential(p, x) ** 2)

    def loss_pp(p):
        return jnp.sum(pipeline_apply(_mlp_layer, p, x, mesh, "pp", 4) ** 2)

    g_seq = jax.grad(loss_seq)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(place_pipeline_params(params, mesh, "pp"))
    for k in g_seq:
        np.testing.assert_allclose(np.asarray(g_pp[k]), np.asarray(g_seq[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_pipeline_on_full_4axis_mesh():
    """pipeline_apply must compose with the framework's (dp, fsdp, tp, pp)
    mesh — the pp axis is partitioned, the others stay replicated."""
    from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(MeshConfig(dp=2, fsdp=1, tp=1, pp=4))
    assert mesh.shape["pp"] == 4
    params = _stack_mlp(jax.random.key(0), 8, 16)
    x = jax.random.normal(jax.random.key(1), (8, 16))
    expected = _sequential(params, x)
    got = jax.jit(lambda p, x: pipeline_apply(
        _mlp_layer, p, x, mesh, "pp", 4))(
        place_pipeline_params(params, mesh, "pp"), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_llama_tower_pipelines_under_pp_mesh():
    """The production wiring (r2 VERDICT item 7): a scanned LlamaModel
    forward inside a pp>1 mesh context routes its layer stack through
    pipeline_apply — logits AND grads must match the sequential scan, and
    the path must compose with a dp axis."""
    import dataclasses

    from flax import linen as nn

    from videotgb_tpu.models.llama import LlamaConfig, LlamaModel
    from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh
    from videotgb_tpu.parallel.sharding import param_partition_spec

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(MeshConfig(dp=4, fsdp=1, tp=1, pp=2))
    cfg = dataclasses.replace(LlamaConfig.tiny(), scan_layers=True,
                              dtype=jnp.float32, param_dtype=jnp.float32)
    model = LlamaModel(cfg)
    rng = np.random.default_rng(0)
    b, s = 8, 6
    ids = jnp.asarray(rng.integers(3, 60, (b, s)))
    mask = jnp.asarray((rng.random((b, s)) > 0.2).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    boxed = model.init(jax.random.key(0), ids)
    params = nn.meta.unbox(boxed)["params"]

    def loss(p, use_mask=True):
        logits, _ = model.apply(
            {"params": p}, ids, attention_mask=mask if use_mask else None)
        return jnp.mean(logits ** 2)

    # sequential reference, no mesh context
    ref_logits, _ = model.apply({"params": params}, ids, attention_mask=mask)
    ref_loss, ref_grads = jax.value_and_grad(loss)(params)

    from jax.sharding import NamedSharding

    specs = param_partition_spec(boxed["params"])
    params_pp = jax.tree.map(
        lambda x_, s_: jax.device_put(x_, NamedSharding(mesh, s_)),
        params, specs)
    with mesh:
        pp_logits, _ = jax.jit(
            lambda p: model.apply({"params": p}, ids, attention_mask=mask)
        )(params_pp)
        pp_loss, pp_grads = jax.jit(jax.value_and_grad(loss))(params_pp)
    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree.leaves(ref_grads)
    flat_pp = jax.tree.leaves(pp_grads)
    for a, g in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_pipeline_transformer_layer():
    """A real flax transformer layer (the ViT block) runs pipelined: the
    stacked-params layout is exactly nn.scan's, so scanned towers can stage
    over pp without weight surgery."""
    from flax import linen as nn

    from videotgb_tpu.models.vit import ViTConfig, ViTLayer

    pp = 4
    if len(jax.devices()) < pp:
        pytest.skip("needs devices")
    import dataclasses

    mesh = _mesh(pp)
    cfg = dataclasses.replace(ViTConfig.tiny(), dtype=jnp.float32,
                              param_dtype=jnp.float32)
    layer = ViTLayer(cfg)
    key = jax.random.key(0)
    b, s, h = 8, 16, cfg.hidden_size
    x = jax.random.normal(jax.random.key(1), (b, s, h), jnp.float32)

    n_layers = 8
    ps = [nn.meta.unbox(layer.init(jax.random.fold_in(key, i), x))["params"]
          for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    def layer_fn(p, hdn):
        return layer.apply({"params": p}, hdn)

    expected = x
    for i in range(n_layers):
        expected = layer.apply({"params": ps[i]}, expected)

    got = jax.jit(lambda p, x: pipeline_apply(
        layer_fn, p, x, mesh, "pp", 4))(
        place_pipeline_params(stacked, mesh, "pp"), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_t5_tower_pipelines_under_pp_mesh():
    """The scanned T5 tower routes encode AND the teacher-forced decode
    through pipeline_apply inside a pp>1 mesh — loss and grads must match
    the sequential scan (the Flan-T5 analogue of the LLaMA wiring above)."""
    import dataclasses

    from flax import linen as nn
    from jax.sharding import NamedSharding

    from videotgb_tpu.models.t5 import T5Config, T5Model
    from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh
    from videotgb_tpu.parallel.sharding import param_partition_spec

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(MeshConfig(dp=4, fsdp=1, tp=1, pp=2))
    cfg = dataclasses.replace(T5Config.tiny(), scan_layers=True,
                              dtype=jnp.float32, param_dtype=jnp.float32)
    model = T5Model(cfg)
    rng = np.random.default_rng(0)
    b, s_enc, s_dec = 8, 10, 6
    enc_ids = jnp.asarray(rng.integers(3, 60, (b, s_enc)))
    enc_mask = jnp.asarray((rng.random((b, s_enc)) > 0.2).astype(np.float32))
    enc_mask = enc_mask.at[:, 0].set(1.0)
    dec_ids = jnp.asarray(rng.integers(3, 60, (b, s_dec)))
    boxed = model.init(jax.random.key(0),
                       jnp.zeros((b, s_enc, cfg.d_model)), enc_mask, dec_ids)
    params = nn.meta.unbox(boxed)["params"]

    def fwd(p):
        hidden = model.apply({"params": p}, model.apply(
            {"params": p}, enc_ids, method=model.embed), enc_mask,
            method=model.encode)
        logits, _ = model.apply({"params": p}, dec_ids, hidden, enc_mask,
                                method=model.decode)
        return logits

    def loss(p):
        return jnp.mean(fwd(p) ** 2)

    ref_logits = fwd(params)
    ref_loss, ref_grads = jax.value_and_grad(loss)(params)

    specs = param_partition_spec(boxed["params"])
    params_pp = jax.tree.map(
        lambda x_, s_: jax.device_put(x_, NamedSharding(mesh, s_)),
        params, specs)
    with mesh:
        pp_logits = jax.jit(fwd)(params_pp)
        pp_loss, pp_grads = jax.jit(jax.value_and_grad(loss))(params_pp)
    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(pp_loss), float(ref_loss), rtol=1e-5)
    for a, g in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(pp_grads)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)
