"""Ops tests: RoPE, span extraction, frame selection, attention.

Golden strategy (SURVEY.md section 4): each jit/vectorized op is checked
against an independent, loop-faithful port of the reference formula.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videotgb_tpu.ops import (
    dot_product_attention,
    flash_attention,
    gumbel_span_sample,
    largest_rectangle_span,
    largest_rectangle_span_np,
    llama_rope,
    rescale_index,
    roformer_rope,
    roformer_sincos_table,
    select_frames_from_spans,
    select_frames_reference_np,
)
from videotgb_tpu.ops.attention import make_causal_bias, make_padding_bias


# ---------------------------------------------------------------------- rope
def test_roformer_table_matches_reference_construction():
    # independent construction of xropebert.py:149-163
    n_pos, dim = 16, 8
    enc = np.array(
        [[p / np.power(10000, 2 * (j // 2) / dim) for j in range(dim)] for p in range(n_pos)]
    )
    expected = np.zeros((n_pos, dim))
    expected[:, : dim // 2] = np.sin(enc[:, 0::2])
    expected[:, dim // 2 :] = np.cos(enc[:, 1::2])
    table = np.asarray(roformer_sincos_table(n_pos, dim))
    np.testing.assert_allclose(table, expected, rtol=1e-6)


def test_roformer_rope_matches_torch_formula(rng):
    # q' = q*cos_pos + rotate_half(q)*sin_pos with interleaved duplication
    s, d = 6, 8
    x = rng.standard_normal((1, 2, s, d)).astype(np.float32)
    table = np.asarray(roformer_sincos_table(s, d))
    sin, cos = table[:, : d // 2], table[:, d // 2 :]
    sin_pos = np.repeat(sin, 2, axis=-1)
    cos_pos = np.repeat(cos, 2, axis=-1)
    rot = np.stack([-x[..., 1::2], x[..., 0::2]], axis=-1).reshape(x.shape)
    expected = x * cos_pos + rot * sin_pos
    got = np.asarray(roformer_rope(jnp.asarray(x), jnp.asarray(table)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_roformer_rope_preserves_inner_products_shift():
    # RoPE property: <R_m q, R_n k> depends only on m - n
    d = 64
    q = np.random.default_rng(1).standard_normal((d,)).astype(np.float32)
    k = np.random.default_rng(2).standard_normal((d,)).astype(np.float32)
    table = roformer_sincos_table(40, d)

    def score(m, n):
        qm = roformer_rope(jnp.asarray(q)[None, None], table[m : m + 1])
        kn = roformer_rope(jnp.asarray(k)[None, None], table[n : n + 1])
        return float(jnp.sum(qm * kn))

    assert score(3, 5) == pytest.approx(score(13, 15), rel=1e-4)
    assert score(0, 7) == pytest.approx(score(20, 27), rel=1e-4)


def test_llama_rope_shift_invariance():
    d = 32
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 1, d)), jnp.float32)
    q = llama_rope(x, jnp.array([[3, 5]]))
    k = llama_rope(x, jnp.array([[13, 15]]))
    s1 = jnp.sum(q[0, 0] * q[0, 1])
    s2 = jnp.sum(k[0, 0] * k[0, 1])
    assert float(s1) == pytest.approx(float(s2), rel=1e-4)


# ---------------------------------------------------------------------- span
def _py_reference_span(score):
    # direct transcription of LSTP_SF_blip2_module.py:196-217
    bs, start_target, end_target = 0, 0, len(score) - 1
    stack = []
    score = [s - min(score) for s in score]
    score = [0] + score + [0]
    for i in range(len(score)):
        while stack and score[stack[-1]] > score[i]:
            tmp = stack.pop()
            tmp_bs = (i - stack[-1] - 1) * score[tmp]
            if tmp_bs > bs:
                bs = tmp_bs
                start_target, end_target = stack[-1], i - 2
        stack.append(i)
    return start_target, end_target


@pytest.mark.parametrize("seed", range(8))
def test_span_np_matches_python_reference(seed, rng):
    scores = np.random.default_rng(seed).random(32).astype(np.float32)
    assert largest_rectangle_span_np(scores) == _py_reference_span(scores.tolist())


def test_span_jax_matches_np_batch(rng):
    scores = rng.random((16, 32)).astype(np.float32)
    starts, ends = jax.jit(largest_rectangle_span)(jnp.asarray(scores))
    for i in range(16):
        assert (int(starts[i]), int(ends[i])) == largest_rectangle_span_np(scores[i])


def test_span_flat_profile_keeps_full_span():
    s, e = largest_rectangle_span_np(np.ones(32, np.float32))
    assert (s, e) == (0, 31)
    starts, ends = largest_rectangle_span(jnp.ones((1, 32)))
    assert (int(starts[0]), int(ends[0])) == (0, 31)


def test_span_peaked_profile():
    scores = np.zeros(32, np.float32)
    scores[10:20] = 1.0
    assert largest_rectangle_span_np(scores) == (10, 19)


def test_rescale_index_matches_int_division():
    # int(idx / (F-1) * (L-1)) over the whole domain
    for f, l in [(32, 64), (32, 17), (5, 100)]:
        for idx in range(f):
            expected = int(idx / (f - 1) * (l - 1))
            got = int(rescale_index(jnp.asarray(idx), f, l))
            assert got == expected, (idx, f, l)


# ----------------------------------------------------------------- selection
def test_select_frames_exhaustive_against_oracle():
    num_frames, nframe = 32, 4
    rng = np.random.default_rng(0)
    cases = []
    for L in [1, 2, 3, 5, 17, 63, 64]:
        for _ in range(25):
            starts = rng.integers(0, 70, size=2)
            ends = rng.integers(0, 70, size=2)
            cases.append((starts, ends, L))
    # adversarial corners
    cases += [
        (np.array([0, 0]), np.array([0, 0]), 64),      # degenerate both
        (np.array([63, 0]), np.array([0, 63]), 64),    # inverted + full
        (np.array([5, 5]), np.array([5, 5]), 64),      # single frame
        (np.array([0, 63]), np.array([63, 0]), 64),
    ]
    starts = jnp.asarray(np.stack([c[0] for c in cases]))
    ends = jnp.asarray(np.stack([c[1] for c in cases]))
    lengths = jnp.asarray(np.array([c[2] for c in cases]))
    got = jax.jit(
        lambda s, e, l: select_frames_from_spans(s, e, l, num_frames, nframe)
    )(starts, ends, lengths)
    for i, (s, e, L) in enumerate(cases):
        expected = select_frames_reference_np(s, e, L, num_frames, nframe)
        assert got[i].tolist() == expected, (i, s, e, L)


def test_select_frames_ratio_rule_exhaustive_against_oracle_and_torch():
    """The Vicuna-family rescale int(i/L*F) (LSTP_module.py:245,
    eval/utils/model.py:135) with exclusive span ends; oracle mirrors torch's
    f32 op order, and a torch cross-check pins that order down."""
    num_frames, nframe = 32, 4
    rng = np.random.default_rng(3)
    cases = []
    for L in [1, 2, 3, 5, 17, 63, 64]:
        for _ in range(25):
            cases.append((rng.integers(0, 70, 2), rng.integers(0, 70, 2), L))
    cases += [
        (np.array([0, 0]), np.array([0, 0]), 64),
        (np.array([5, 5]), np.array([5, 5]), 64),
        (np.array([1, 2]), np.array([3, 6]), 3),  # f32 two-step rounding zone
    ]
    starts = jnp.asarray(np.stack([c[0] for c in cases]))
    ends = jnp.asarray(np.stack([c[1] for c in cases]))
    lengths = jnp.asarray(np.array([c[2] for c in cases]))
    got = jax.jit(
        lambda s, e, l: select_frames_from_spans(
            s, e, l, num_frames, nframe, inclusive_end=False, rescale="ratio")
    )(starts, ends, lengths)
    for i, (s, e, L) in enumerate(cases):
        expected = select_frames_reference_np(
            s, e, L, num_frames, nframe, inclusive_end=False, rescale="ratio")
        assert got[i].tolist() == expected, (i, s, e, L)

    torch = pytest.importorskip("torch")
    # pin the oracle's f32 semantics to the actual torch expression
    for idx in range(0, 70, 7):
        for L in (3, 17, 63):
            t = int(torch.tensor(idx, dtype=torch.long) / L * num_frames)
            o = int(np.float32(np.float32(idx) / np.float32(L))
                    * np.float32(num_frames))
            assert t == o, (idx, L)


def test_select_frames_nframe_variants():
    # nframe=8 and nframe=1 paths (duplication depth varies)
    for nframe in (1, 2, 8):
        starts = jnp.array([[4, 4]])
        ends = jnp.array([[4, 4]])
        got = select_frames_from_spans(starts, ends, jnp.array([64]), 32, nframe)
        expected = select_frames_reference_np(
            np.array([4, 4]), np.array([4, 4]), 64, 32, nframe
        )
        assert got[0].tolist() == expected


def test_gumbel_span_sample_is_deterministic_and_plausible():
    key = jax.random.key(0)
    logits = jnp.zeros((4, 64)).at[:, 10].set(50.0)  # overwhelming peak
    s, e = gumbel_span_sample(logits, logits, key)
    assert s.shape == (4, 2) and e.shape == (4, 2)
    assert bool(jnp.all(s == 10)) and bool(jnp.all(e == 10))
    s2, e2 = gumbel_span_sample(logits, logits, key)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))


def test_gumbel_span_sample_spreads_over_uniform_logits():
    key = jax.random.key(1)
    logits = jnp.zeros((256, 16))
    s, _ = gumbel_span_sample(logits, logits, key, top_k=1)
    counts = np.bincount(np.asarray(s).ravel(), minlength=16)
    assert counts.min() > 0  # every index reachable


# ----------------------------------------------------------------- attention
def test_attention_matches_naive_softmax(rng):
    b, h, s, d = 2, 3, 17, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    out = dot_product_attention(q, k, v)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    probs = jax.nn.softmax(jnp.asarray(scores), -1)
    expected = np.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_flash_attention_interpret_matches_reference(rng):
    # run the Pallas kernel in interpreter mode on CPU
    from videotgb_tpu.ops.attention import _flash_forward
    import videotgb_tpu.ops.attention as A
    import jax.experimental.pallas as pl_mod

    b, h, sq, skv, d = 2, 2, 48, 80, 16
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (b, skv)), jnp.float32).at[:, 0].set(1)
    bias = make_padding_bias(mask)

    expected = dot_product_attention(q, k, v, bias)
    import unittest.mock as mock

    real_call = pl_mod.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    with mock.patch.object(A.pl, "pallas_call", interp_call):
        got = _flash_forward(q, k, v, bias, d ** -0.5, 16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_flash_attention_cpu_fallback_and_grads(rng):
    b, h, s, d = 1, 2, 12, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v) ** 2)

    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bias_kind", ["none", "scalar", "per_batch",
                                       "per_row", "learned", "per_query"])
def test_flash_backward_kernel_matches_xla_vjp(rng, bias_kind):
    """The fused whole-seq backward kernel (interpret mode) must reproduce
    the XLA recompute-vjp gradients for every bias broadcast layout,
    including the learned-bias cotangent reduction (T5 rel-pos bias)."""
    from videotgb_tpu.ops.attention import _flash_backward_pallas

    b, h, sq, skv, d = 2, 4, 24, 40, 16
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.float32)
    scale = d ** -0.5

    if bias_kind == "none":
        bias = None
    elif bias_kind == "scalar":
        bias = make_causal_bias(sq, skv)  # (1, 1, sq, skv)
    elif bias_kind == "per_batch":
        mask = jnp.asarray(rng.integers(0, 2, (b, skv)), jnp.float32).at[:, 0].set(1)
        bias = make_padding_bias(mask)  # (b, 1, 1, skv)
    elif bias_kind == "per_row":
        bias = jnp.asarray(rng.standard_normal((b, h, sq, skv)), jnp.float32)
    elif bias_kind == "per_query":
        # broadcast over the KV axis: dbias must reduce dim 3 too
        bias = jnp.asarray(rng.standard_normal((b, 1, sq, 1)), jnp.float32)
    else:  # learned (1, h, sq, skv), like T5 relative-position bias
        bias = jnp.asarray(rng.standard_normal((1, h, sq, skv)), jnp.float32)

    if bias is None:
        _, vjp = jax.vjp(
            lambda a, b_, c: dot_product_attention(a, b_, c, None, scale),
            q, k, v)
        exp = vjp(g) + (None,)
    else:
        _, vjp = jax.vjp(
            lambda a, b_, c, d_: dot_product_attention(a, b_, c, d_, scale),
            q, k, v, bias)
        exp = vjp(g)

    got = _flash_backward_pallas(q, k, v, bias, g, scale, interpret=True)
    names = ("dq", "dk", "dv", "dbias")
    for name, a, e in zip(names, got, exp):
        if e is None:
            assert a is None, name
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-4, atol=2e-4, err_msg=name)

    # mask-declared bias: dq/dk/dv unchanged, no ds output computed
    if bias is not None:
        got2 = _flash_backward_pallas(q, k, v, bias, g, scale,
                                      interpret=True, bias_needs_grad=False)
        assert got2[3] is None
        for name, a, e in zip(names[:3], got2[:3], exp[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=2e-4, atol=2e-4, err_msg=name)


def test_causal_bias_decode_alignment():
    bias = make_causal_bias(1, 5)
    assert np.asarray(bias[0, 0, 0]).tolist() == [0, 0, 0, 0, 0]
    bias = make_causal_bias(3, 5)
    allowed = np.asarray(bias[0, 0]) == 0
    # row i can see keys up to position i + (5 - 3)
    np.testing.assert_array_equal(allowed.sum(-1), [3, 4, 5])
