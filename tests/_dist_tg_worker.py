"""Standalone worker for the two-process jax.distributed test (the true
ddp_sim analogue — reference configs/trainer/ddp_sim.yaml runs 2 DDP
*processes* on CPU). Spawned by tests/test_distributed.py, NOT collected by
pytest.

Usage: python tests/_dist_tg_worker.py <process_id> <num_processes> <port>

Each process gets 2 local CPU devices; with 2 processes the mesh spans 4
global devices. Builds the SAME deterministic tiny TG batch everywhere,
feeds its process-local rows through make_array_from_process_local_data,
runs ONE dp-sharded TG train step (loss + grads through the frozen-filter
optimizer mask), and prints ``LOSS <value> GNORM <value>``. The parent
asserts the two processes agree with each other and with a single-process
run.
"""

from __future__ import annotations

import sys


def main() -> None:
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    if nprocs > 1:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception as e:  # config knob missing in this jaxlib
            print(f"SKIP no cpu collectives: {e}", flush=True)
            return
        from videotgb_tpu.parallel.distributed import initialize

        try:
            initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=nprocs, process_id=proc_id)
        except Exception as e:
            print(f"SKIP distributed init failed: {e}", flush=True)
            return
        if jax.process_count() != nprocs:
            print(f"SKIP process_count {jax.process_count()} != {nprocs}",
                  flush=True)
            return

    import numpy as np
    import optax
    from flax import linen as nn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from videotgb_tpu.models.videotgb import VideoTGB, VideoTGBConfig
    from videotgb_tpu.training.optim import make_optimizer
    from videotgb_tpu.training.recipes import TGRecipe

    cfg = VideoTGBConfig.tiny()
    model = VideoTGB(cfg)
    b_global = 4
    img = cfg.blip2.vit.image_size
    l_flow, fs = 4, cfg.tgb.flow_size

    # the FULL global batch, identical in every process (fixed seeds)
    batch = {
        "flow": np.random.default_rng(0).standard_normal(
            (b_global, l_flow, fs, fs, 2)).astype(np.float32),
        "flow_mask": np.ones((b_global, l_flow + 2), np.float32),
        "sampler_question_ids": np.ones((b_global, 5), np.int32),
        "sampler_question_mask": np.ones((b_global, 5), np.float32),
        "starts": np.array([1, 0, 2, 3], np.int32),
        "ends": np.array([3, 2, 3, 3], np.int32),
    }
    init_batch = {
        "frames": np.ones((1, cfg.num_frames, img, img, 3), np.float32),
        "question_ids": np.ones((1, 6), np.int32),
        "question_mask": np.ones((1, 6), np.float32),
        "video_length": np.full((1,), l_flow, np.int32),
    }

    key = jax.random.key(0)
    variables = model.init(
        key, init_batch["frames"], batch["flow"][:1], batch["flow_mask"][:1],
        init_batch["video_length"], batch["sampler_question_ids"][:1],
        batch["sampler_question_mask"][:1], init_batch["question_ids"],
        init_batch["question_mask"], key, method=model.init_pipeline,
    )
    params = nn.meta.unbox(variables)["params"]

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("dp"))

    # params replicated (identical host values in every process); batch rows
    # process-sharded: each process contributes its local slice
    params = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        params)
    rows_per_proc = b_global // nprocs
    lo = proc_id * rows_per_proc
    gbatch = {
        k: jax.make_array_from_process_local_data(
            row, v[lo:lo + rows_per_proc] if nprocs > 1 else v)
        for k, v in batch.items()
    }

    recipe = TGRecipe()

    def loss_fn(p, b):
        return recipe.loss_fn(model, p, b, jax.random.key(7),
                              deterministic=True)[0]

    tx, _ = make_optimizer(params, 1e-3, filter_fn=recipe.filter_fn)

    @jax.jit
    def train_step(p, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        opt_state = tx.init(p)
        updates, _ = tx.update(grads, opt_state, p)
        new_p = optax.apply_updates(p, updates)
        return loss, optax.global_norm(grads), new_p

    with mesh:
        loss, gnorm, new_p = train_step(params, gbatch)
    # loss/gnorm are fully replicated -> addressable on every process
    print(f"LOSS {float(loss):.8f} GNORM {float(gnorm):.8f}", flush=True)


if __name__ == "__main__":
    main()
