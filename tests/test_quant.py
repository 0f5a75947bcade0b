"""int8 serving-quantization parity gates (ops/quant.py, QuantDense, the
quantized ViT tower). The reference has no quantized path; these tests bound
the W8A8 error so the serving bench's int8 mode is provably faithful."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.ops.quant import int8_matmul, quantize_cols, quantize_rows


def test_int8_matmul_exact_on_preemptively_quantized_inputs():
    """Inputs already on the int8 grid (amax exactly 127) round-trip with
    zero quantization error — the matmul itself is exact int32."""
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (8, 32)).astype(np.float32)
    x[:, 0] = 127  # pin per-row amax so scale = 1
    w = rng.integers(-127, 128, (32, 16)).astype(np.float32)
    w[0, :] = 127  # pin per-col amax
    got = int8_matmul(jnp.asarray(x), jnp.asarray(w), out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), x @ w, rtol=0, atol=0)


def test_int8_matmul_error_bound_gaussian():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((64, 256)).astype(np.float32)
    w = (rng.standard_normal((256, 128)) * 0.05).astype(np.float32)
    exact = x @ w
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w),
                                 out_dtype=jnp.float32))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 2e-2, rel  # typical ~0.5% for per-row/per-channel W8A8


def test_quantize_helpers_ranges():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32)) * 10
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s), np.asarray(x),
        atol=float(np.asarray(s).max()) * 0.51)
    qc, sc = quantize_cols(x.T)
    assert qc.shape == x.T.shape and sc.shape == (1, 4)


def test_quant_dense_param_tree_matches_dense():
    """QuantDense must load existing checkpoints: identical param names,
    shapes, and partitioning metadata to nn.Dense."""
    from flax import linen as nn

    from videotgb_tpu.models.common import dense

    x = jnp.ones((2, 16))
    d = dense(8, ("embed", "mlp"), name=None)
    q = dense(8, ("embed", "mlp"), name=None, quant="int8")
    pd = d.init(jax.random.key(0), x)
    pq = q.init(jax.random.key(0), x)
    assert jax.tree.structure(pd) == jax.tree.structure(pq)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(pd)[0],
            jax.tree_util.tree_flatten_with_path(pq)[0]):
        assert a.shape == b.shape, kp
    # partitioning metadata preserved
    sd = nn.get_partition_spec(pd)
    sq = nn.get_partition_spec(pq)
    assert sd == sq


def test_vit_int8_matches_bf16_tower():
    """The quantized ViT's output stays within a tight band of the exact
    tower — the serving parity gate (per-layer W8A8 error compounds through
    the residual stream; post-LN normalization keeps it bounded)."""
    from videotgb_tpu.models.vit import ViTConfig, ViTModel

    cfg = dataclasses.replace(ViTConfig.tiny(), num_layers=4)
    cfg_q = dataclasses.replace(cfg, quant="int8")
    model = ViTModel(cfg)
    model_q = ViTModel(cfg_q)
    rng = np.random.default_rng(3)
    pix = jnp.asarray(rng.standard_normal((2, cfg.image_size, cfg.image_size,
                                           3)), jnp.float32)
    params = model.init(jax.random.key(0), pix)
    out = np.asarray(model.apply(params, pix), np.float32)
    out_q = np.asarray(model_q.apply(params, pix), np.float32)  # same params
    rel = np.linalg.norm(out_q - out) / np.linalg.norm(out)
    assert rel < 0.08, rel
    # token-level agreement: quantization must not reorder features grossly
    cos = np.sum(out * out_q, -1) / (
        np.linalg.norm(out, axis=-1) * np.linalg.norm(out_q, axis=-1) + 1e-8)
    assert float(cos.min()) > 0.99, float(cos.min())


def test_vit_int8_same_param_tree():
    """quant="int8" must not change the ViT checkpoint layout."""
    from videotgb_tpu.models.vit import ViTConfig, ViTModel

    cfg = ViTConfig.tiny()
    pix = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    p = ViTModel(cfg).init(jax.random.key(0), pix)
    pq = ViTModel(dataclasses.replace(cfg, quant="int8")).init(
        jax.random.key(0), pix)
    assert jax.tree.structure(p) == jax.tree.structure(pq)
