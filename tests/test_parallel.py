"""Multi-device tests on the virtual 8-CPU mesh: head-parallel attention,
ring attention (context parallel), KV-sharded decode with LSE merge."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attn_v100_tpu.parallel.mesh import make_mesh, DATA_AXIS, SEQ_AXIS, MODEL_AXIS
from flash_attn_v100_tpu.parallel.ring import ring_attention
from flash_attn_v100_tpu.parallel.sharded import (
    flash_attn_func_sharded, flash_attn_with_kvcache_sharded)
from flash_attn_v100_tpu.ops.reference import mha_reference, mha_reference_kvcache
from flash_attn_v100_tpu.utils.testing import assert_fwd_close, max_abs_err


def mk(rng, *shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def test_mesh_construction():
    m = make_mesh(data=2, seq=2, model=2)
    assert m.shape == {DATA_AXIS: 2, SEQ_AXIS: 2, MODEL_AXIS: 2}
    m2 = make_mesh(data=2, seq=1, model=-1)
    assert m2.shape[MODEL_AXIS] == 4


@pytest.mark.parametrize("causal", [False, True])
def test_head_sharded_dense(rng, causal):
    mesh = make_mesh(data=2, seq=1, model=4)
    B, M, Hq, Hk, D = 4, 128, 8, 4, 64
    q, k, v = mk(rng, B, M, Hq, D), mk(rng, B, M, Hk, D), mk(rng, B, M, Hk, D)
    out = flash_attn_func_sharded(q, k, v, mesh, causal=causal)
    ref32 = mha_reference(q, k, v, causal=causal, upcast=True)
    refnat = mha_reference(q, k, v, causal=causal, upcast=False)
    assert_fwd_close(out, ref32, refnat)


def test_head_sharded_kv_replicated(rng):
    """Hk=2 doesn't divide model=4: kv replicated, GQA done locally."""
    mesh = make_mesh(data=2, seq=1, model=4)
    B, M, Hq, Hk, D = 2, 64, 8, 2, 32
    q, k, v = mk(rng, B, M, Hq, D), mk(rng, B, M, Hk, D), mk(rng, B, M, Hk, D)
    out = flash_attn_func_sharded(q, k, v, mesh, causal=True)
    ref32 = mha_reference(q, k, v, causal=True, upcast=True)
    refnat = mha_reference(q, k, v, causal=True, upcast=False)
    assert_fwd_close(out, ref32, refnat)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention(rng, causal):
    mesh = make_mesh(data=1, seq=4, model=2)
    B, M, Hq, Hk, D = 1, 256, 4, 4, 64   # 4-way seq shard: 64 rows/chip
    q, k, v = mk(rng, B, M, Hq, D), mk(rng, B, M, Hk, D), mk(rng, B, M, Hk, D)
    out = ring_attention(q, k, v, mesh, causal=causal)
    ref32 = mha_reference(q, k, v, causal=causal, upcast=True)
    refnat = mha_reference(q, k, v, causal=causal, upcast=False)
    assert out.shape == q.shape
    assert_fwd_close(out, ref32, refnat)


def test_ring_attention_grad(rng):
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, H, D = 1, 128, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    do = mk(rng, B, M, H, D)

    def loss(q, k, v):
        return (ring_attention(q, k, v, mesh, causal=True) * do).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        return (mha_reference(q, k, v, causal=True, upcast=True) * do).sum()

    g = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip((dq, dk, dv), g, "qkv"):
        assert max_abs_err(a, b) < 2e-3, (n, max_abs_err(a, b))


def test_sharded_decode(rng):
    mesh = make_mesh(data=1, seq=4, model=2)
    B, Hq, Hk, D = 2, 4, 2, 64
    N = 512  # global cache capacity; 128 rows per seq shard
    q = mk(rng, B, 1, Hq, D)
    kc = mk(rng, B, Hk, N, D)   # HND layout
    vc = mk(rng, B, Hk, N, D)
    lens = jnp.asarray([300, 77], jnp.int32)
    out = flash_attn_with_kvcache_sharded(q, kc, vc, mesh, lens, causal=True)
    # oracle: single-device on NHD layout
    ref32 = mha_reference_kvcache(
        q, jnp.swapaxes(kc, 1, 2), jnp.swapaxes(vc, 1, 2),
        cache_seqlens=np.asarray(lens), causal=True, upcast=True)[0]
    refnat = mha_reference_kvcache(
        q, jnp.swapaxes(kc, 1, 2), jnp.swapaxes(vc, 1, 2),
        cache_seqlens=np.asarray(lens), causal=True, upcast=False)[0]
    assert_fwd_close(out, ref32, refnat)


def test_ring_matches_sharded_inputs(rng):
    """ring_attention under jit with actually-sharded global arrays."""
    mesh = make_mesh(data=1, seq=8, model=1)
    B, M, H, D = 1, 512, 2, 64
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    sh = NamedSharding(mesh, P(None, SEQ_AXIS, None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, causal=True))
    out = f(qs, ks, vs)
    ref32 = mha_reference(q, k, v, causal=True, upcast=True)
    refnat = mha_reference(q, k, v, causal=True, upcast=False)
    assert_fwd_close(out, ref32, refnat)
