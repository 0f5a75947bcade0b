"""int8 vs bf16 matmul ceiling sweep at real model shapes (round-3).

Separates three costs:
  * pure MXU rate: pre-quantized int8 x int8 -> int32 dot, output cast bf16
  * + dequant epilogue (scales outer product)
  * + dynamic activation quantize (amax/round/clip at runtime)
  * + dynamic weight quantize too (= ops.quant.int8_matmul as shipped)
"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from videotgb_tpu.ops.quant import int8_matmul, quantize_rows, quantize_cols


def timed(f, *args, iters=8):
    out = f(*args); _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


SHAPES = [
    # (M, K, N, label)
    (65792, 1408, 6144, "vit mlp wi  (256f)"),
    (65792, 6144, 1408, "vit mlp wo  (256f)"),
    (65792, 1408, 4224, "vit qkv     (256f)"),
    (8192, 8192, 8192, "8k cube"),
]


def main():
    rng = np.random.default_rng(0)
    for M, K, N, label in SHAPES:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        flops = 2 * M * K * N

        f_bf16 = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
        t = timed(f_bf16, x, w)
        print(f"{label:22s} bf16            : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s")

        xq, xs = jax.jit(quantize_rows)(x)
        wq, ws = jax.jit(quantize_cols)(w)

        f_pure = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.bfloat16))
        t = timed(f_pure, xq, wq)
        print(f"{label:22s} int8 pure       : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TOP/s")

        def deq(a, b, sa, sb):
            acc = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sa * sb).astype(jnp.bfloat16)
        t = timed(jax.jit(deq), xq, wq, xs, ws)
        print(f"{label:22s} int8 +dequant   : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TOP/s")

        def dynact(a, b, sb):
            aq, sa = quantize_rows(a)
            acc = jax.lax.dot_general(aq, b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sa * sb).astype(jnp.bfloat16)
        t = timed(jax.jit(dynact), x, wq, ws)
        print(f"{label:22s} int8 +dyn act   : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TOP/s")

        t = timed(jax.jit(int8_matmul), x, w)
        print(f"{label:22s} int8 full dyn   : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TOP/s")
        print()


if __name__ == "__main__":
    main()
