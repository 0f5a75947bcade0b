"""A/B the flagship ViT tower: bf16 vs int8, scanned vs unrolled (round-3
int8 serving path diagnosis)."""
import dataclasses, os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from videotgb_tpu.models.vit import ViTConfig, ViTModel


def timed(f, *args, iters=6):
    out = f(*args); float(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
    return (time.perf_counter() - t0) / iters


def main():
    import os
    b = int(os.environ.get("PROBE_BATCH", "256"))  # 64 clips x nframe 4
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.standard_normal((b, 224, 224, 3)), jnp.bfloat16)
    base = ViTConfig(act="gelu_new", param_dtype=jnp.bfloat16)
    variants = [
        ("bf16 scanned", dataclasses.replace(base, scan_layers=True)),
        ("int8 scanned", dataclasses.replace(base, scan_layers=True, quant="int8")),
        ("bf16 unrolled", base),
        ("int8 unrolled", dataclasses.replace(base, quant="int8")),
    ]
    params = None
    for name, cfg in variants:
        model = ViTModel(cfg)
        if params is None or ("unrolled" in name and "bf16" in name):
            params = jax.jit(model.init)(jax.random.key(0), pix[:1])
        f = jax.jit(lambda p, x, m=model: m.apply(p, x))
        t = timed(f, params, pix)
        print(f"{name}: {t*1e3:.1f} ms/batch{b}")


if __name__ == "__main__":
    main()
