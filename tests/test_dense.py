"""Dense forward/backward vs the fp32 oracle, using the reference's relative
tolerance model (reference: test.py:277, 331-334)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_func
from flash_attn_v100_tpu.ops.reference import mha_reference
from flash_attn_v100_tpu.utils.testing import (
    assert_fwd_close, assert_bwd_close, assert_no_nan_inf, max_abs_err,
)


def make_qkv(rng, B, M, N, Hq, Hk, D, dtype=jnp.float16):
    q = jnp.asarray(rng.standard_normal((B, M, Hq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, N, Hk, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, N, Hk, D)), dtype)
    return q, k, v


# subset of the reference's dense shape matrix (test.py:115-139), trimmed for
# CPU-interpret runtime; larger shapes run in benchmarks on real TPU
SHAPES = [
    # B, Hq, Hk, M, N, D
    (1, 1, 1, 16, 16, 16),
    (1, 1, 1, 64, 64, 64),
    (1, 1, 1, 128, 128, 128),
    (2, 2, 2, 128, 128, 64),
    (1, 2, 2, 256, 256, 32),
    (2, 4, 2, 192, 192, 64),      # GQA, non-multiple seq
    (1, 2, 1, 128, 256, 64),      # cross attention M < N
    (1, 2, 2, 200, 136, 40),      # ragged everything, D%8 != 0
]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
def test_dense_fwd(rng, shape, causal):
    B, Hq, Hk, M, N, D = shape
    if causal and M > N:
        pytest.skip("reference skips causal with M > N")
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    out = flash_attn_func(q, k, v, causal=causal)
    ref32 = mha_reference(q, k, v, causal=causal, upcast=True)
    refnat = mha_reference(q, k, v, causal=causal, upcast=False)
    assert out.shape == q.shape and out.dtype == q.dtype
    assert_fwd_close(out, ref32, refnat)


@pytest.mark.parametrize("shape", [(1, 2, 2, 128, 128, 64), (2, 4, 2, 192, 192, 64)])
@pytest.mark.parametrize("causal", [False, True])
def test_dense_bwd(rng, shape, causal):
    B, Hq, Hk, M, N, D = shape
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    do = jnp.asarray(rng.standard_normal((B, M, Hq, D)), q.dtype)

    def loss(q, k, v):
        return (flash_attn_func(q, k, v, causal=causal) * do).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v, upcast):
        return (mha_reference(q, k, v, causal=causal, upcast=upcast) * do).sum()

    g32 = jax.grad(lambda *a: ref_loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    gnat = jax.grad(lambda *a: ref_loss(*a, False), argnums=(0, 1, 2))(q, k, v)

    for g, gr32, grn, name in zip((dq, dk, dv), g32, gnat, ("dq", "dk", "dv")):
        assert_bwd_close(g, gr32, grn, name)


@pytest.mark.parametrize("feature", ["window", "softcap", "alibi", "window_causal"])
def test_dense_fwd_features(rng, feature):
    B, Hq, Hk, M, N, D = 2, 2, 2, 192, 192, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    kwargs = {}
    if feature == "window":
        kwargs["window_size"] = (31, 16)
    elif feature == "window_causal":
        kwargs.update(window_size=(64, 0), causal=True)
    elif feature == "softcap":
        kwargs["softcap"] = 30.0
    elif feature == "alibi":
        kwargs["alibi_slopes"] = jnp.asarray([0.5 ** (i + 1) for i in range(Hq)],
                                             jnp.float32)
    out = flash_attn_func(q, k, v, **kwargs)
    ref32 = mha_reference(q, k, v, upcast=True, **kwargs)
    refnat = mha_reference(q, k, v, upcast=False, **kwargs)
    assert_fwd_close(out, ref32, refnat)


@pytest.mark.parametrize("feature", ["window", "softcap", "alibi"])
def test_dense_bwd_features(rng, feature):
    B, Hq, Hk, M, N, D = 1, 2, 2, 128, 128, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    do = jnp.asarray(rng.standard_normal((B, M, Hq, D)), q.dtype)
    kwargs = {}
    if feature == "window":
        kwargs["window_size"] = (31, 16)
    elif feature == "softcap":
        kwargs["softcap"] = 30.0
    elif feature == "alibi":
        kwargs["alibi_slopes"] = jnp.asarray([0.5 ** (i + 1) for i in range(Hq)],
                                             jnp.float32)

    dq, dk, dv = jax.grad(
        lambda q, k, v: (flash_attn_func(q, k, v, causal=True, **kwargs) * do).sum(),
        argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v, upcast):
        return (mha_reference(q, k, v, causal=True, upcast=upcast, **kwargs) * do).sum()

    g32 = jax.grad(lambda *a: ref_loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    gnat = jax.grad(lambda *a: ref_loss(*a, False), argnums=(0, 1, 2))(q, k, v)
    for g, gr32, grn, name in zip((dq, dk, dv), g32, gnat, ("dq", "dk", "dv")):
        assert_bwd_close(g, gr32, grn, name)


def test_dense_lse_matches_oracle(rng):
    B, Hq, Hk, M, N, D = 1, 2, 2, 128, 128, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    out, lse, _ = flash_attn_func(q, k, v, causal=True, return_attn_probs=True)
    _, lse_ref = mha_reference(q, k, v, causal=True, return_lse=True)
    assert lse.shape == (B, Hq, M)
    assert max_abs_err(lse, lse_ref) < 5e-3


def test_dense_bf16(rng):
    q, k, v = make_qkv(rng, 1, 128, 128, 2, 2, 64, dtype=jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=True)
    ref32 = mha_reference(q, k, v, causal=True, upcast=True)
    refnat = mha_reference(q, k, v, causal=True, upcast=False)
    assert out.dtype == jnp.bfloat16
    assert_fwd_close(out, ref32, refnat)


def test_dense_jit(rng):
    q, k, v = make_qkv(rng, 1, 128, 128, 2, 2, 64)
    f = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=True))
    out = f(q, k, v)
    assert_no_nan_inf(out)


def test_deterministic_accepted_and_bitwise_stable(rng):
    """`deterministic=True` is a silent no-op: the TPU backward is always
    deterministic (sequential grid + VMEM accumulation, no atomics), so the
    flag is accepted for API parity and two identical grad calls must be
    bitwise equal."""
    q, k, v = make_qkv(rng, 1, 64, 64, 2, 2, 32)
    g = jax.grad(
        lambda q, k, v: flash_attn_func(
            q, k, v, causal=True, deterministic=True).astype(jnp.float32).sum(),
        argnums=(0, 1, 2))
    g1, g2 = g(q, k, v), g(q, k, v)
    for a, b in zip(g1, g2):
        assert jnp.array_equal(a, b)


def test_causal_m_greater_n_fully_masked_rows(rng):
    """M > N causal: early q rows attend NOTHING (bottom-right alignment).
    Exercises the flattened grid's placeholder pairs — those rows must
    produce O = 0 and lse = -inf, not garbage (reference early-exit
    semantics, kernel/fused_mha_forward_varlen.cu:100-111)."""
    from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
    B, Hq, Hk, M, N, D = 1, 2, 2, 256, 64, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    bs = BlockSizes(block_q=64, block_k=64)
    out, lse, _ = flash_attn_func(q, k, v, causal=True, block_sizes=bs,
                                  return_attn_probs=True)
    offset = N - M  # -192: rows < 192 have no keys
    dead = np.asarray(out)[:, :192]
    assert np.all(dead == 0), "fully masked rows must be zero"
    assert np.all(np.isneginf(np.asarray(lse)[:, :, :192]))
    # live rows match the oracle
    ref32 = mha_reference(q, k, v, causal=True, upcast=True)
    refnat = mha_reference(q, k, v, causal=True, upcast=False)
    assert_fwd_close(out[:, 192:], ref32[:, 192:], refnat[:, 192:])
    # gradients flow only through live rows
    do = jnp.asarray(rng.standard_normal(out.shape), q.dtype)
    dq = jax.grad(lambda q: (flash_attn_func(q, k, v, causal=True,
                                             block_sizes=bs) * do)
                  .astype(jnp.float32).sum())(q)
    assert np.all(np.asarray(dq)[:, :192] == 0)
    assert np.isfinite(np.asarray(dq)).all()


@pytest.mark.parametrize("case", [
    # (M, N, bq, bk, causal, window): offset = N - M
    (512, 512, 128, 128, True, None),      # 1 partial tile per q block
    (576, 640, 192, 128, True, None),      # offset % bk != 0: 2 partials
    (512, 512, 128, 128, False, (-1, 20)), # window-right mixed mode
    (384, 512, 128, 128, True, None),      # cross M < N
])
def test_dense_fwd_unroll2_mixed(rng, case):
    """kv_unroll=2 engages the straight-line regions (pipelined_all /
    mixed_pair + live_pairs_causal_mixed) that big-tile TPU shapes take;
    CPU-interpret parity here guards the fast paths the small default-tile
    tests never reach."""
    from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
    from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
    from flash_attn_v100_tpu.ops.pallas import masks as masklib
    M, N, bq, bk, causal, window = case
    B, Hq, Hk, D = 1, 2, 2, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    wl, wr = window if window else (-1, -1)
    params = masklib.MaskParams(causal=causal, window_left=wl,
                                window_right=wr)
    bs = BlockSizes(block_q=bq, block_k=bk)
    out, lse = flash_attn_dense_fwd(q, k, v, D ** -0.5, params,
                                    block_sizes=bs, kv_unroll=2)
    okw = dict(causal=causal)
    if window:
        okw["window_size"] = window
    ref32 = mha_reference(q, k, v, upcast=True, **okw)
    refnat = mha_reference(q, k, v, upcast=False, **okw)
    assert_fwd_close(out, ref32, refnat)
