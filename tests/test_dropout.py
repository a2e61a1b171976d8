"""Philox dropout: fwd statistics, fwd/bwd replay consistency, dmask output.

The kernel and the jnp oracle share the same position-keyed Philox bits
(flash_attn_v100_tpu.ops.philox), so agreement is tested with the normal
relative tolerance model — masks are bit-identical by construction
(the reference's replay contract: include/philox.h:65-73)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_func
from flash_attn_v100_tpu.ops.reference import mha_reference
from flash_attn_v100_tpu.ops import philox
from flash_attn_v100_tpu.utils.testing import assert_fwd_close, assert_bwd_close


def make_qkv(rng, B, M, N, Hq, Hk, D, dtype=jnp.float16):
    q = jnp.asarray(rng.standard_normal((B, M, Hq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, N, Hk, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, N, Hk, D)), dtype)
    return q, k, v


def test_philox_keep_rate():
    rows = jnp.broadcast_to(jnp.arange(512)[:, None], (512, 512))
    cols = jnp.broadcast_to(jnp.arange(512)[None, :], (512, 512))
    for p in (0.1, 0.5):
        keep = philox.dropout_keep_mask(rows, cols, 3, jnp.uint32(7), jnp.uint32(9), p)
        rate = float(jnp.mean(keep.astype(jnp.float32)))
        assert abs(rate - (1 - p)) < 0.01, rate


def test_philox_position_keyed():
    """Same absolute position -> same bit, regardless of tile offsets."""
    rows = jnp.broadcast_to(jnp.arange(64)[:, None], (64, 64))
    cols = jnp.broadcast_to(jnp.arange(64)[None, :], (64, 64))
    full = philox.dropout_keep_bits(rows, cols, 5, jnp.uint32(1), jnp.uint32(2))
    sub = philox.dropout_keep_bits(rows[16:32, 48:64], cols[16:32, 48:64], 5,
                                   jnp.uint32(1), jnp.uint32(2))
    np.testing.assert_array_equal(np.asarray(full)[16:32, 48:64], np.asarray(sub))


@pytest.mark.parametrize("p", [0.17, 0.5])
def test_dropout_fwd_matches_oracle(rng, p):
    B, Hq, Hk, M, N, D = 2, 2, 2, 128, 128, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    out = flash_attn_func(q, k, v, dropout_p=p, dropout_seed=42, causal=True)
    ref32 = mha_reference(q, k, v, dropout_p=p, dropout_seed=42, causal=True,
                          upcast=True)
    refnat = mha_reference(q, k, v, dropout_p=p, dropout_seed=42, causal=True,
                           upcast=False)
    assert_fwd_close(out, ref32, refnat)


def test_dropout_bwd_matches_oracle(rng):
    p = 0.23
    B, Hq, Hk, M, N, D = 1, 2, 2, 128, 128, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    do = jnp.asarray(rng.standard_normal((B, M, Hq, D)), q.dtype)

    dq, dk, dv = jax.grad(
        lambda q, k, v: (flash_attn_func(q, k, v, dropout_p=p, dropout_seed=7,
                                         causal=True) * do).sum(),
        argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v, upcast):
        return (mha_reference(q, k, v, dropout_p=p, dropout_seed=7, causal=True,
                              upcast=upcast) * do).sum()

    g32 = jax.grad(lambda *a: ref_loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    gnat = jax.grad(lambda *a: ref_loss(*a, False), argnums=(0, 1, 2))(q, k, v)
    for g, gr32, grn, name in zip((dq, dk, dv), g32, gnat, ("dq", "dk", "dv")):
        assert_bwd_close(g, gr32, grn, name)


def test_dmask_output(rng):
    p = 0.3
    B, Hq, Hk, M, N, D = 1, 2, 2, 64, 64, 32
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    out, lse, dmask = flash_attn_func(q, k, v, dropout_p=p, dropout_seed=11,
                                      return_attn_probs=True)
    assert dmask.shape == (B, Hq, M, N)
    vals = np.unique(np.asarray(dmask, np.float32))
    assert set(vals).issubset({-1.0, 1.0})
    # dmask must agree with the oracle's mask
    _, _, dmask_ref = mha_reference(q, k, v, dropout_p=p, dropout_seed=11,
                                    return_lse=True, return_dmask=True)
    np.testing.assert_array_equal(np.asarray(dmask, np.float32),
                                  np.asarray(dmask_ref, np.float32))


def test_different_seeds_differ(rng):
    q, k, v = make_qkv(rng, 1, 64, 64, 1, 1, 32)
    o1 = flash_attn_func(q, k, v, dropout_p=0.5, dropout_seed=1)
    o2 = flash_attn_func(q, k, v, dropout_p=0.5, dropout_seed=2)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 0


def test_rng_key_api(rng):
    q, k, v = make_qkv(rng, 1, 64, 64, 1, 1, 32)
    key = jax.random.PRNGKey(0)
    o1 = flash_attn_func(q, k, v, dropout_p=0.5, rng_key=key)
    o2 = flash_attn_func(q, k, v, dropout_p=0.5, rng_key=key)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_dropout_pipelined_path_matches_per_tile(rng):
    """Dropout through the straight-line pipelined regions (r5: fwd
    pipelined_all/mixed_pair, dq pipelined) must be bit-identical to the
    per-tile path — the Philox keying is position-based, so tile grouping
    can't change the mask.  kv_unroll=2 at small blocks forces the
    pipelined/mixed regions on CPU interpret."""
    from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
    from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
    from flash_attn_v100_tpu.ops.pallas import masks as masklib
    B, M, N, Hq, Hk, D = 1, 256, 256, 2, 2, 64
    q, k, v = make_qkv(rng, B, M, N, Hq, Hk, D)
    seed = jnp.asarray([17, 3], jnp.uint32)
    bs = BlockSizes(block_q=64, block_k=64)
    for causal in (False, True):
        params = masklib.MaskParams(causal=causal)
        out1, lse1 = flash_attn_dense_fwd(
            q, k, v, D ** -0.5, params, dropout_p=0.3, dropout_seed=seed,
            block_sizes=bs, kv_unroll=1)
        out2, lse2 = flash_attn_dense_fwd(
            q, k, v, D ** -0.5, params, dropout_p=0.3, dropout_seed=seed,
            block_sizes=bs, kv_unroll=2)
        if causal:
            # the mixed enumeration reorders the (order-invariant) online
            # softmax, so agreement is to rounding, not bitwise — any
            # dropout-mask divergence would show up at O(1), not O(ulp)
            assert float(jnp.max(jnp.abs(
                out1.astype(jnp.float32) - out2.astype(jnp.float32)))) < 2e-3
            assert float(jnp.max(jnp.abs(lse1 - lse2))) < 1e-5
        else:
            assert jnp.array_equal(out1, out2)
            assert jnp.array_equal(lse1, lse2)
