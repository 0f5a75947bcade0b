"""Attention: XLA reference implementation + Pallas TPU flash-attention kernel.

The reference leans on HF/cuDNN eager attention everywhere (ViT, Q-Former,
T5, Vicuna, TGB — SURVEY.md section 2.6). Here attention is a first-class op:

* :func:`dot_product_attention` — plain XLA einsum attention. Used for short
  sequences (Q-Former's 32 queries), as the flash kernel's autodiff backward
  (recompute), and as the CPU-test fallback.
* :func:`flash_attention` — blocked online-softmax Pallas kernel. Grid over
  (batch*heads, q-blocks); K/V stream through VMEM in kv-blocks with a
  running (max, sum, acc) carry, so the (S_q, S_kv) score matrix never
  materializes in HBM. Supports an additive float bias (padding masks, T5
  relative-position bias, causal masks are all expressed as bias).

Shapes follow (batch, heads, seq, head_dim). All softmax math is float32
regardless of input dtype (bf16 in production), accumulated on the MXU via
preferred_element_type=float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Reference attention. q (B,H,Sq,D), k/v (B,H,Skv,D), bias broadcastable
    to (B,H,Sq,Skv). Returns (B,H,Sq,D) in q.dtype."""
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_kv: int, scale: float,
    s_kv: int
):
    """Processes a (RB, bq, d) slab of rows (batch*head) per program: small
    per-program grids starve the TPU on short sequences, so rows are batched
    into one dot_general and the KV loop runs over the full slab.

    Matmul inputs stay in their storage dtype (bf16 in production) with f32
    accumulation via preferred_element_type — casting operands to f32 would
    run the MXU at a fraction of its bf16 rate (measured: the f32 variant
    made attention cost as much as ALL the MLP matmuls in ViT-g). Softmax
    statistics are f32 throughout, matching dot_product_attention exactly.
    """
    q = q_ref[:]  # (rb, bq, d)
    rb, bq, d = q.shape
    n_kv = s_kv // block_kv

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[:, pl.ds(i * block_kv, block_kv), :]
        v = v_ref[:, pl.ds(i * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (rb, bq, bkv) f32
        s = s + bias_ref[:, :, pl.ds(i * block_kv, block_kv)].astype(jnp.float32)
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (rb, bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc_prev * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((rb, bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rb, bq, 1), jnp.float32)
    acc0 = jnp.zeros((rb, bq, d), jnp.float32)
    if n_kv == 1:
        _, l, acc = body(0, (m0, l0, acc0))
    else:
        _, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None,
    scale: float,
    block_q: int,
    block_kv: int,
) -> jax.Array:
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    bh = b * h

    # pad seq lengths up to block multiples; padded KV columns are masked off
    # via bias, padded Q rows are sliced away after.
    pad_q = (-s_q) % block_q
    pad_kv = (-s_kv) % block_kv
    if pad_q or pad_kv or bias is None:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        if bias is None:
            bias = jnp.zeros((1, 1, 1, 1), q.dtype)
        bias = jnp.broadcast_to(bias, (*bias.shape[:2], s_q, s_kv))
        bias = jnp.pad(
            bias,
            ((0, 0), (0, 0), (0, pad_q), (0, pad_kv)),
            constant_values=NEG_INF,
        )
    sq_p, skv_p = s_q + pad_q, s_kv + pad_kv
    # materialize broadcastable seq dims ((B,1,1,S) padding masks etc.);
    # batch/head dims stay unbroadcast for the block-spec fast paths below
    bias = jnp.broadcast_to(bias, (*bias.shape[:2], sq_p, skv_p))

    qf = q.reshape(bh, sq_p, d)
    kf = k.reshape(bh, skv_p, d)
    vf = v.reshape(bh, skv_p, d)
    itemsize = jnp.dtype(q.dtype).itemsize

    # bias layouts, cheapest first: scalar-broadcast (1,...), per-batch
    # (b,...) indexed as row//h WITHOUT materializing the h-broadcast, or
    # fully per-row (b*h,...)
    bias_b, bias_h = bias.shape[0], bias.shape[1]
    if (bias_b, bias_h) == (1, 1):
        biasf = bias.reshape(1, sq_p, skv_p)
    elif bias_h == 1:
        biasf = bias.reshape(bias_b, sq_p, skv_p)
    else:
        biasf = jnp.broadcast_to(
            bias, (b, h, sq_p, skv_p)).reshape(bh, sq_p, skv_p)
    bias_rows = biasf.shape[0]

    # row-batching: pack several (batch*head) rows per program so short
    # sequences still launch MXU-sized work. Per-batch bias requires every
    # program's rows to share one batch index -> row_block must divide h.
    row_block = 1
    for cand_rb in (32, 16, 8, 4, 2):
        if bh % cand_rb != 0:
            continue
        if bias_rows == b and h % cand_rb != 0:
            continue
        vmem_est = (
            cand_rb * 2 * skv_p * d * itemsize       # k, v slabs
            + cand_rb * block_q * d * (itemsize * 2 + 8)  # q, o, acc(f32)
            + cand_rb * block_q * block_kv * 8       # scores + exp (f32)
            + block_q * skv_p * 4 * (cand_rb if bias_rows == bh else 1)
        )
        if vmem_est < 10 * 1024 * 1024:
            row_block = cand_rb
            break

    if bias_rows == bh:
        bias_spec = pl.BlockSpec((row_block, block_q, skv_p),
                                 lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    elif bias_rows == b:
        rows_per_b = h // row_block
        bias_spec = pl.BlockSpec((1, block_q, skv_p),
                                 lambda i, j: (i // rows_per_b, j, 0),
                                 memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, block_q, skv_p), lambda i, j: (0, j, 0),
                                 memory_space=pltpu.VMEM)

    grid = (bh // row_block, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_kv=block_kv, scale=scale, s_kv=skv_p
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_block, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, skv_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, skv_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        out_specs=pl.BlockSpec(
            (row_block, block_q, d), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * skv_p * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * itemsize,
            transcendentals=bh * sq_p * skv_p,
        ),
    )(qf, kf, vf, biasf)
    return out.reshape(b, h, sq_p, d)[:, :, :s_q, :]


def _flash_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, ds_ref, *, scale: float):
    """Whole-sequence fused backward for one row slab (rb rows of batch*head).

    Recomputes softmax in f32 from the saved q/k/v/bias (no probabilities or
    logsumexp stored by the forward), then the standard five-matmul backward:
      dv = p^T dO;  dp = dO v^T;  ds = p (dp - rowsum(dp p));
      dq = ds k * scale;  dk = ds^T q * scale.
    Everything stays VMEM-resident — the XLA recompute-vjp materializes the
    (Sq, Skv) probability tensor in HBM between ops, which dominates training
    step time for every tower at production batch sizes.
    """
    q = q_ref[:]  # (rb, sq, d)
    k = k_ref[:]
    v = v_ref[:]
    do = do_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[...].astype(jnp.float32)  # (rb|1, sq, skv) broadcast
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (rb, sq, skv) f32
    pb = p.astype(v.dtype)
    dv = jax.lax.dot_general(
        pb, do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (rb, skv, d)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (rb, sq, skv)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsb, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (rb, sq, d)
    dk = jax.lax.dot_general(
        dsb, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (rb, skv, d)
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)
    if ds_ref is not None:
        ds_ref[:] = ds


def _flash_backward_pallas(q, k, v, bias, g, scale, interpret=False,
                           bias_needs_grad=True):
    """Fused whole-sequence backward. Returns (dq, dk, dv, dbias-or-None).

    Sequences are padded to multiples of 8; padded q/dO rows are zero (their
    ds vanishes) and padded kv columns carry NEG_INF bias (their p vanishes),
    so padding contributes exactly nothing to any gradient.

    ``bias_needs_grad=False`` (mask/causal biases — every tower except T5's
    learned rel-pos bias) skips the (B*H, Sq, Skv) f32 ds output entirely;
    the caller gets dbias=None and should return zeros."""
    b, h, s_q, d = q.shape
    s_kv = k.shape[2]
    bh = b * h
    need_ds = bias is not None and bias_needs_grad
    orig_bias_shape = bias.shape if need_ds else None
    orig_bias_dtype = bias.dtype if need_ds else None

    pad_q = (-s_q) % 8
    pad_kv = (-s_kv) % 8
    if bias is None:
        bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
    bias = jnp.broadcast_to(bias, (*bias.shape[:2], s_q, s_kv))
    q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
    bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad_q), (0, pad_kv)),
                   constant_values=NEG_INF)
    sq_p, skv_p = s_q + pad_q, s_kv + pad_kv

    qf = q.reshape(bh, sq_p, d)
    kf = k.reshape(bh, skv_p, d)
    vf = v.reshape(bh, skv_p, d)
    gf = g.reshape(bh, sq_p, d)
    bias_b, bias_h = bias.shape[0], bias.shape[1]
    if (bias_b, bias_h) == (1, 1):
        biasf = bias.reshape(1, sq_p, skv_p)
    elif bias_h == 1:
        biasf = bias.reshape(bias_b, sq_p, skv_p)
    else:
        biasf = jnp.broadcast_to(
            bias, (b, h, sq_p, skv_p)).reshape(bh, sq_p, skv_p)
    bias_rows = biasf.shape[0]
    itemsize = jnp.dtype(q.dtype).itemsize

    row_block = 1
    for cand_rb in (16, 8, 4, 2):
        if bh % cand_rb != 0:
            continue
        if bias_rows == b and h % cand_rb != 0:
            continue
        vmem_est = (
            cand_rb * sq_p * skv_p * 4 * (4 + (2 if need_ds else 0))
            + cand_rb * (sq_p + skv_p) * d * itemsize * 4
            + sq_p * skv_p * 4
        )
        if vmem_est < 24 * 1024 * 1024:
            row_block = cand_rb
            break

    if bias_rows == bh:
        bias_spec = pl.BlockSpec((row_block, sq_p, skv_p), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    elif bias_rows == b:
        rows_per_b = h // row_block
        bias_spec = pl.BlockSpec((1, sq_p, skv_p),
                                 lambda i: (i // rows_per_b, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, sq_p, skv_p), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    def rowspec(seq):
        return pl.BlockSpec((row_block, seq, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        jax.ShapeDtypeStruct((bh, skv_p, d), k.dtype),
        jax.ShapeDtypeStruct((bh, skv_p, d), v.dtype),
    ]
    out_specs = [rowspec(sq_p), rowspec(skv_p), rowspec(skv_p)]
    if need_ds:
        out_shapes.append(jax.ShapeDtypeStruct((bh, sq_p, skv_p), jnp.float32))
        out_specs.append(pl.BlockSpec((row_block, sq_p, skv_p),
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(_flash_bwd_kernel, scale=scale)
    if not need_ds:
        def kernel(*refs, _k=functools.partial(_flash_bwd_kernel, scale=scale)):
            _k(*refs, None)

    outs = pl.pallas_call(
        kernel,
        grid=(bh // row_block,),
        in_specs=[rowspec(sq_p), rowspec(skv_p), rowspec(skv_p), bias_spec,
                  rowspec(sq_p)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qf, kf, vf, biasf, gf)

    dq = outs[0].reshape(b, h, sq_p, d)[:, :, :s_q]
    dk = outs[1].reshape(b, h, skv_p, d)[:, :, :s_kv]
    dv = outs[2].reshape(b, h, skv_p, d)[:, :, :s_kv]
    dbias = None
    if need_ds:
        ds = outs[3].reshape(b, h, sq_p, skv_p)[:, :, :s_q, :s_kv]
        # reduce the cotangent over ALL of the bias's broadcast dims
        for axis in range(4):
            if orig_bias_shape[axis] == 1:
                ds = jnp.sum(ds, axis=axis, keepdims=True)
        dbias = ds.astype(orig_bias_dtype)
    return dq, dk, dv, dbias


# whole-seq backward slabs stay VMEM-resident up to this length; longer
# sequences fall back to the XLA recompute vjp
_BWD_MAX_SEQ = 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, block_q, block_kv, bias_needs_grad):
    return _flash_forward(q, k, v, bias, scale, block_q, block_kv)


def _flash_fwd(q, k, v, bias, scale, block_q, block_kv, bias_needs_grad):
    out = _flash_forward(q, k, v, bias, scale, block_q, block_kv)
    return out, (q, k, v, bias)


def _flash_bwd(scale, block_q, block_kv, bias_needs_grad, residuals, g):
    q, k, v, bias = residuals
    use_fused = (
        jax.default_backend() not in ("cpu",)
        and q.shape[2] <= _BWD_MAX_SEQ
        and k.shape[2] <= _BWD_MAX_SEQ
    )
    if use_fused:
        dq, dk, dv, dbias = _flash_backward_pallas(
            q, k, v, bias, g, scale, bias_needs_grad=bias_needs_grad)
        if bias is None:
            return dq, dk, dv, None
        if dbias is None:
            # mask/causal bias declared non-differentiable: zero cotangent
            # (XLA folds the dead zero chain away)
            dbias = jnp.zeros_like(bias)
        return dq, dk, dv, dbias
    # Long-sequence fallback: recompute through the XLA reference
    # implementation (exact; XLA fuses it, but materializes probabilities).
    if bias is None:
        _, vjp = jax.vjp(lambda a, b, c: dot_product_attention(a, b, c, None, scale), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(lambda a, b, c, d: dot_product_attention(a, b, c, d, scale), q, k, v, bias)
    return vjp(g)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    scale: float | None = None,
    block_q: int = 128,
    block_kv: int = 128,
    use_pallas: bool | None = None,
    bias_needs_grad: bool = True,
) -> jax.Array:
    """Flash attention with automatic fallback.

    Uses the Pallas kernel on TPU backends; elsewhere (CPU tests) falls back
    to the XLA reference, which is numerically equivalent.

    ``bias_needs_grad=False`` declares the bias a constant mask (padding /
    causal): the fused backward then skips materializing the full (B*H, Sq,
    Skv) ds tensor and returns a zero bias cotangent. Leave True for learned
    biases (T5's relative-position bias).
    """
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if not use_pallas:
        return dot_product_attention(q, k, v, bias, scale)

    def round8(x):
        return ((x + 7) // 8) * 8

    # short sequences: one whole-sequence block (per-program work stays
    # MXU-sized via row batching in _flash_forward)
    if q.shape[2] <= 512:
        block_q = round8(q.shape[2])
    else:
        block_q = min(block_q, round8(q.shape[2]))
    if k.shape[2] <= 512:
        block_kv = round8(k.shape[2])
    else:
        block_kv = min(block_kv, round8(k.shape[2]))
    return _flash_attention(q, k, v, bias, scale, block_q, block_kv,
                            bias_needs_grad)


def make_padding_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, S) 1/0 key mask -> (B, 1, 1, S) additive bias (HF semantics:
    (1 - mask) * -inf, xropebert.py get_extended_attention_mask)."""
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]


def make_causal_bias(s_q: int, s_kv: int | None = None, dtype=jnp.float32) -> jax.Array:
    """(1, 1, S_q, S_kv) causal additive bias; allows k_pos <= q_pos + offset
    where offset aligns the ends (for KV-cache decode suffixes)."""
    s_kv = s_kv if s_kv is not None else s_q
    offset = s_kv - s_q
    q_pos = jnp.arange(s_q)[:, None]
    k_pos = jnp.arange(s_kv)[None, :]
    allowed = k_pos <= q_pos + offset
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None]
