"""Full-state checkpoint/resume: a preempted run must continue exactly.

The reference resumes optimizer/epoch/schedule via trainer.fit(ckpt_path=...)
(reference: src/train.py:87); here {params, opt_state, step} round-trip
through Orbax and the restarted trainer reproduces the uninterrupted run
bit-for-bit (the RngStream folds (seed, step), so restoring step restores
the randomness too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.training.checkpoint import (
    CheckpointConfig,
    CheckpointManager,
    resolve_ckpt_path,
)
from videotgb_tpu.training.trainer import Trainer, TrainerConfig, TrainState


def _make_trainer(max_steps=10):
    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"] + params["b"]
        noise = jax.random.normal(key, pred.shape) * 0.01
        loss = jnp.mean((pred + noise - batch["y"]) ** 2)
        return loss, {"loss": loss}

    cfg = TrainerConfig(max_steps=max_steps, lr=1e-2, eval_every=10_000,
                        checkpoint_every=5, log_every=100, seed=7)
    return Trainer(cfg, loss_fn)


def _init_state(trainer):
    """Mesh-placed params like the real train entry (restored checkpoints
    commit to the template's devices, so the template must be mesh-placed)."""
    from jax.sharding import PartitionSpec

    params = _params()
    specs = jax.tree.map(lambda _: PartitionSpec(), params)
    return trainer.init_state(params, param_specs=specs)


def _params():
    k = jax.random.key(0)
    return {"w": jax.random.normal(k, (4, 3)), "b": jnp.zeros((3,))}


def _batches(n, seed=3):
    rng = np.random.default_rng(seed)
    return [{"x": jnp.asarray(rng.standard_normal((8, 4)), jnp.float32),
             "y": jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)}
            for _ in range(n)]


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    batches = _batches(10)

    # uninterrupted 10-step run
    t1 = _make_trainer()
    s1 = _init_state(t1)
    for b in batches:
        s1, _ = t1.train_step(s1, b)

    # run 5 steps, checkpoint full state, "die"
    t2 = _make_trainer()
    s2 = _init_state(t2)
    ckpt = CheckpointManager(CheckpointConfig(directory=str(tmp_path / "ck")))
    for b in batches[:5]:
        s2, _ = t2.train_step(s2, b)
    ckpt.save(int(s2.step), {"params": s2.params, "opt_state": s2.opt_state,
                             "step": s2.step})
    ckpt.wait()

    # fresh process: restore everything, continue on batches[5:]
    t3 = _make_trainer()
    s3 = _init_state(t3)
    assert ckpt.item_names(5) == {"params", "opt_state", "step"}
    restored = ckpt.restore(5, template={
        "params": s3.params, "opt_state": s3.opt_state, "step": s3.step})
    s3 = TrainState(restored["params"], restored["opt_state"],
                    jnp.asarray(int(restored["step"]), jnp.int32))
    assert int(s3.step) == 5
    for b in batches[5:]:
        s3, _ = t3.train_step(s3, b)

    for a, b_ in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_params_only_restore_subset(tmp_path):
    """Eval/warm-start restores params from a full-state checkpoint without
    needing an opt_state template (Composite items restore independently)."""
    t = _make_trainer()
    s = t.init_state(_params())
    ckpt = CheckpointManager(CheckpointConfig(directory=str(tmp_path / "ck")))
    ckpt.save(3, {"params": s.params, "opt_state": s.opt_state,
                  "step": jnp.asarray(3)})
    ckpt.wait()
    out = ckpt.restore(3, template={"params": s.params})
    assert set(out) == {"params"}
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(s.params["w"]))


def test_best_and_last_retention(tmp_path):
    t = _make_trainer()
    s = t.init_state(_params())
    state = {"params": s.params, "opt_state": s.opt_state, "step": s.step}
    ckpt = CheckpointManager(CheckpointConfig(
        directory=str(tmp_path / "ck"), monitor="val/score", max_to_keep=1))
    ckpt.save(1, state, {"val/score": 0.5})
    ckpt.save(2, state)                      # periodic, metric-less
    ckpt.save(3, state, {"val/score": 0.9})  # new best
    ckpt.save(4, state, {"val/score": 0.2})  # worse
    ckpt.wait()
    assert ckpt.best_step() == 3
    assert ckpt.latest_step() == 4
    # metric-less periodic save went to last/ only, never competes for best
    restored = ckpt.restore(ckpt.best_step(), template={"params": s.params})
    assert set(restored) == {"params"}


def test_resolve_ckpt_path(tmp_path):
    root = str(tmp_path / "run" / "checkpoints")
    assert resolve_ckpt_path(root) == (root, None)
    assert resolve_ckpt_path(root + "/best") == (root, None)
    assert resolve_ckpt_path(root + "/last/500") == (root, 500)
    assert resolve_ckpt_path(root + "/best/12/") == (root, 12)


def test_trainer_periodic_checkpoint_between_evals(tmp_path):
    """checkpoint_every fires between eval ticks (was dead config, VERDICT)."""
    t = _make_trainer(max_steps=7)
    s = t.init_state(_params())
    saved = []
    s = t.fit(s, iter(_batches(7)),
              eval_fn=None,
              checkpoint_fn=lambda st, m: saved.append((int(st.step), m)))
    assert [step for step, _ in saved] == [5]
    assert saved[0][1] is None


def test_sharded_save_restore_across_mesh_shapes(tmp_path):
    """The re-sharding restore seam of 5.4 (reference resume,
    src/train.py:87, mapped onto Orbax-with-sharding): state saved under a
    {dp:2, fsdp:2, tp:2} mesh restores BIT-EXACT onto a different mesh
    shape ({dp:4, fsdp:2}) with different per-leaf partition specs — GSPMD
    re-shards on load; nothing is tied to the saver's device layout."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from videotgb_tpu.parallel.mesh import MeshConfig, create_mesh

    rng = np.random.default_rng(7)
    host = {"w": rng.standard_normal((16, 8)).astype(np.float32),
            "emb": rng.standard_normal((32, 8)).astype(np.float32),
            "b": rng.standard_normal((8,)).astype(np.float32)}

    mesh_a = create_mesh(MeshConfig(dp=2, fsdp=2, tp=2))
    specs_a = {"w": P("fsdp", "tp"), "emb": P("fsdp", None), "b": P()}
    params_a = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), NamedSharding(mesh_a, s)),
        host, specs_a)

    ckpt = CheckpointManager(CheckpointConfig(directory=str(tmp_path)))
    ckpt.save(3, {"params": params_a, "step": jnp.asarray(3, jnp.int32)})
    ckpt.wait()
    ckpt.close()

    # a fresh manager (new process) restores onto a DIFFERENT mesh shape
    # with different specs: w now row-sharded only, emb replicated
    mesh_b = create_mesh(MeshConfig(dp=4, fsdp=2, tp=1))
    specs_b = {"w": P("fsdp", None), "emb": P(), "b": P()}
    template = jax.tree.map(
        lambda x, s: jax.device_put(jnp.zeros_like(jnp.asarray(x)),
                                    NamedSharding(mesh_b, s)),
        host, specs_b)
    ckpt2 = CheckpointManager(CheckpointConfig(directory=str(tmp_path)))
    out = ckpt2.restore(3, template={"params": template})
    restored = out["params"]

    for name in host:
        np.testing.assert_array_equal(np.asarray(restored[name]), host[name])
        want = NamedSharding(mesh_b, specs_b[name])
        assert restored[name].sharding.is_equivalent_to(want, host[name].ndim), (
            name, restored[name].sharding)
    ckpt2.close()
