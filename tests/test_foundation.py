"""Foundation tests: config composition, mesh construction, metrics parity.

Metric formulas are checked against independent reimplementations of the
reference's torchmetrics gadgets (reference: src/gadgets/my_metrics.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.config import compose, instantiate, parse_overrides
from videotgb_tpu.parallel import MeshConfig, create_mesh
from videotgb_tpu.training import metrics as M


# ------------------------------------------------------------------- config
def _write(tmp_path, rel, text):
    path = tmp_path / rel
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(text)
    return path


def test_compose_defaults_experiment_and_overrides(tmp_path):
    _write(tmp_path, "train.yaml", """
defaults:
  - data: base
  - model: base
  - _self_
seed: 42
task_name: train
paths:
  root: /tmp/run
  out: ${paths.root}/out
""")
    _write(tmp_path, "data/base.yaml", "batch_size: 2\nnframe: 4\n")
    _write(tmp_path, "model/base.yaml", "lr: 1.0e-4\nname: blip2\n")
    _write(tmp_path, "experiment/exp1.yaml", """
model:
  lr: 5.0e-5
tags: [exp1]
""")
    cfg = compose(str(tmp_path), "train", ["experiment=exp1", "data.batch_size=8", "seed=7"])
    assert cfg.data.batch_size == 8
    assert cfg.model.lr == 5.0e-5
    assert cfg.model.name == "blip2"
    assert cfg.seed == 7
    assert cfg.tags == ["exp1"]
    assert cfg.paths.out == "/tmp/run/out"


def test_instantiate_target_and_partial():
    cfg = {
        "_target_": "collections.OrderedDict",
        "a": {"_target_": "builtins.dict", "x": 1},
    }
    obj = instantiate(cfg)
    assert obj["a"] == {"x": 1}
    part = instantiate({"_target_": "builtins.int", "_partial_": True})
    assert part("11") == 11


def test_parse_overrides_types():
    ov = parse_overrides(["a.b=1", "a.c=true", "d=null", "e=[1,2]", "f=text"])
    assert ov["a"]["b"] == 1 and ov["a"]["c"] is True
    assert ov["d"] is None and ov["e"] == [1, 2] and ov["f"] == "text"


# --------------------------------------------------------------------- mesh
def test_mesh_axes_and_sizes():
    mesh = create_mesh(MeshConfig(dp=-1, fsdp=1, tp=1))
    assert mesh.axis_names == ("dp", "fsdp", "tp", "pp", "sp")
    assert mesh.devices.size == len(jax.devices())

    mesh2 = create_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    assert mesh2.shape["dp"] == 2 and mesh2.shape["tp"] == 2


def test_mesh_sizes_validation():
    # fully-specified layouts smaller than the host take a device subset
    mesh = create_mesh(MeshConfig(dp=3, fsdp=1, tp=1))
    assert mesh.devices.size == 3
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(dp=-1, fsdp=3, tp=1))  # 8 not divisible by 3
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(dp=16, fsdp=1, tp=1))  # more than available


# ------------------------------------------------------------------ metrics
def test_mean_metric():
    s = M.mean_init()
    for v in [1.0, 2.0, 6.0]:
        s = M.mean_update(s, v)
    assert float(M.mean_compute(s)) == pytest.approx(3.0)


def test_accuracy_ignores_minus_100():
    s = M.accuracy_init()
    logits = jnp.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    target = jnp.array([1, -100, 0])
    s = M.accuracy_update(s, logits, target)
    assert float(M.accuracy_compute(s)) == pytest.approx(0.5)


def test_iou_matches_reference_branches():
    # Exact port check of my_metrics.py:89-107 branch structure.
    def ref_iou(sp, ep, st, et):
        if sp == st and ep == et:
            return 1.0
        if sp >= et or ep <= st:
            return 0.0
        ll, lr = min(sp, st), max(sp, st)
        rr, rl = max(ep, et), min(ep, et)
        return max(rl - lr + 1, 0) / (rr - ll + 1)

    cases = [(2, 5, 2, 5), (0, 1, 5, 9), (2, 6, 4, 9), (4, 9, 2, 6), (3, 3, 3, 3), (0, 9, 2, 5)]
    for sp, ep, st, et in cases:
        got = float(M.span_iou(jnp.array(sp), jnp.array(ep), jnp.array(st), jnp.array(et)))
        assert got == pytest.approx(ref_iou(sp, ep, st, et)), (sp, ep, st, et)


def test_iou_update_accumulates():
    s = M.iou_init()
    L = 10
    start_logits = jax.nn.one_hot(jnp.array([2, 0]), L) * 10
    end_logits = jax.nn.one_hot(jnp.array([5, 1]), L) * 10
    s = M.iou_update(s, start_logits, end_logits, jnp.array([2, 5]), jnp.array([5, 9]))
    mean_iou, at3, at5 = M.iou_compute(s)
    assert float(mean_iou) == pytest.approx((1.0 + 0.0) / 2)
    assert float(at3) == pytest.approx(0.5)


def test_rouge_n_list_and_scalar():
    # scalar branch: recall over non-punctuation gold tokens
    assert M.rouge_n("a b c .", "a c d") == pytest.approx(2 / 3)
    # list branch divides by batch size (reference quirk, my_metrics.py:160-161)
    scores = M.rouge_n(["a b", "a b"], ["a b", "x y"])
    assert scores == pytest.approx([1.0 / 2, 0.0])


def test_bleu1_simple():
    assert M.bleu1(["the cat sat"], ["the cat sat"]) == pytest.approx(1.0)
    assert M.bleu1(["the cat"], ["dog barks loud"]) == pytest.approx(0.0)
    assert M.bleu1(["a b c d"], ["a b x y"]) == pytest.approx(0.5)


def test_metric_bag():
    bag = M.MetricBag({"loss": "mean", "iou": "iou"})
    bag.states["loss"] = M.mean_update(bag.states["loss"], 2.0)
    out = bag.compute()
    assert out["loss"] == pytest.approx(2.0)
    bag.reset()
    assert float(M.mean_compute(bag.states["loss"])) == 0.0


# ------------------------------------------------------------ sharded update
def test_metric_update_with_sharded_batch(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = M.accuracy_init()
    logits = jnp.tile(jnp.array([[0.0, 1.0]]), (8, 1))
    target = jnp.ones((8,), jnp.int32)
    logits = jax.device_put(logits, NamedSharding(mesh8, P(("dp", "fsdp"))))
    target = jax.device_put(target, NamedSharding(mesh8, P(("dp", "fsdp"))))
    s = jax.jit(M.accuracy_update)(s, logits, target)
    assert float(M.accuracy_compute(s)) == 1.0
