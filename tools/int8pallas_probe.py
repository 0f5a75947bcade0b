"""Probe: can a Pallas int8 matmul beat XLA's ~185 TOP/s int8 dot on this
chip? Decides whether the int8 serving path gets a custom kernel or a
ROOFLINE.md renegotiation (r2 VERDICT item 1)."""
import functools, os, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def timed(f, *args, iters=8):
    out = f(*args); _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def mm_kernel(x_ref, w_ref, o_ref, acc_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    @pl.when(pl.program_id(2) == k_steps - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(jnp.bfloat16)


def pallas_int8_mm(x, w, bm=512, bn=1024, bk=512):
    M, K = x.shape
    K2, N = w.shape
    k_steps = K // bk
    return pl.pallas_call(
        functools.partial(mm_kernel, k_steps=k_steps),
        grid=(M // bm, N // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


def main():
    rng = np.random.default_rng(0)
    M, K, N = 8192, 8192, 8192
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    flops = 2 * M * K * N

    f_xla = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.bfloat16))
    t = timed(f_xla, xq, wq)
    print(f"xla int8 8k cube        : {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TOP/s", flush=True)

    for bm, bn, bk in [(512, 1024, 512), (256, 1024, 1024),
                       (512, 512, 1024), (1024, 1024, 512),
                       (512, 2048, 512)]:
        try:
            f = jax.jit(functools.partial(pallas_int8_mm, bm=bm, bn=bn, bk=bk))
            t = timed(f, xq, wq)
            print(f"pallas int8 bm{bm} bn{bn} bk{bk}: {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"pallas bm{bm} bn{bn} bk{bk}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)

    # bf16 pallas reference at same tiling (MXU rate sanity)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    def mm_kernel_bf16(x_ref, w_ref, o_ref, acc_ref, *, k_steps):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(2) == k_steps - 1)
        def _done():
            o_ref[:] = acc_ref[:].astype(jnp.bfloat16)

    def pallas_bf16_mm(x, w, bm=512, bn=1024, bk=512):
        k_steps = K // bk
        return pl.pallas_call(
            functools.partial(mm_kernel_bf16, k_steps=k_steps),
            grid=(M // bm, N // bn, k_steps),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, w)

    t = timed(jax.jit(pallas_bf16_mm), xb, wb)
    print(f"pallas bf16 bm512 bn1024 bk512: {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
