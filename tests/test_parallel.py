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


# ---------------------------------------------------------------------------
# round 2: ring feature parity, zigzag layout, streaming backward
# ---------------------------------------------------------------------------

def test_ring_window_softcap(rng):
    """window/softcap plumb through chunk-local ring calls (VERDICT r1 #7)."""
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, H, D = 1, 256, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    for ws, sc in (((80, -1), 0.0), ((-1, -1), 12.0), ((100, -1), 9.0)):
        out = ring_attention(q, k, v, mesh, causal=True, window_size=ws,
                             softcap=sc)
        ref32 = mha_reference(q, k, v, causal=True, window_size=ws,
                              softcap=sc, upcast=True)
        refnat = mha_reference(q, k, v, causal=True, window_size=ws,
                               softcap=sc, upcast=False)
        assert_fwd_close(out, ref32, refnat)


def test_ring_window_noncausal(rng):
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, H, D = 1, 256, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    ws = (70, 33)
    out = ring_attention(q, k, v, mesh, causal=False, window_size=ws)
    ref32 = mha_reference(q, k, v, causal=False, window_size=ws, upcast=True)
    refnat = mha_reference(q, k, v, causal=False, window_size=ws, upcast=False)
    assert_fwd_close(out, ref32, refnat)


def test_ring_alibi(rng):
    mesh = make_mesh(data=1, seq=4, model=2)
    B, M, Hq, Hk, D = 1, 256, 4, 4, 32
    q, k, v = mk(rng, B, M, Hq, D), mk(rng, B, M, Hk, D), mk(rng, B, M, Hk, D)
    slopes = jnp.asarray(rng.uniform(0.01, 0.2, (B, Hq)), jnp.float32)
    out = ring_attention(q, k, v, mesh, causal=True, alibi_slopes=slopes)
    ref32 = mha_reference(q, k, v, causal=True, alibi_slopes=slopes, upcast=True)
    refnat = mha_reference(q, k, v, causal=True, alibi_slopes=slopes, upcast=False)
    assert_fwd_close(out, ref32, refnat)


def test_ring_dropout_matches_dense(rng):
    """Position-keyed Philox gives the EXACT single-chip mask on the ring."""
    from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
    from flash_attn_v100_tpu.ops.pallas import masks as masklib
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, H, D = 1, 256, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    seed = jnp.asarray([123, 456], jnp.uint32)
    out = ring_attention(q, k, v, mesh, causal=True, dropout_p=0.3,
                         dropout_seed=seed)
    params = masklib.MaskParams(causal=True)
    ref, _ = flash_attn_dense_fwd(q, k, v, D ** -0.5, params,
                                  dropout_p=0.3, dropout_seed=seed)
    assert max_abs_err(out, ref) < 2e-5, max_abs_err(out, ref)


def test_ring_grad_features(rng):
    """Streaming ring backward with window+softcap matches dense autodiff."""
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, H, D = 1, 128, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    do = mk(rng, B, M, H, D)
    kw = dict(causal=True, window_size=(50, -1), softcap=8.0)

    def loss(q, k, v):
        return (ring_attention(q, k, v, mesh, **kw) * do).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v):
        return (mha_reference(q, k, v, upcast=True, **kw) * do).sum()

    g = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip((dq, dk, dv), g, "qkv"):
        assert max_abs_err(a, b) < 2e-3, (n, max_abs_err(a, b))


def test_ring_zigzag(rng):
    """Zigzag stripes: balanced causal ring, exact vs the dense oracle."""
    from flash_attn_v100_tpu.parallel.ring import zigzag_shard, zigzag_unshard
    n = 4
    mesh = make_mesh(data=1, seq=n, model=1)
    B, M, H, D = 1, 256, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    qz, kz, vz = (zigzag_shard(x, n) for x in (q, k, v))
    out_z = ring_attention(qz, kz, vz, mesh, causal=True, layout="zigzag")
    out = zigzag_unshard(out_z, n)
    ref32 = mha_reference(q, k, v, causal=True, upcast=True)
    refnat = mha_reference(q, k, v, causal=True, upcast=False)
    assert_fwd_close(out, ref32, refnat)
    # round-trip sanity
    assert jnp.allclose(zigzag_unshard(zigzag_shard(q, n), n), q)


def test_ring_zigzag_grad(rng):
    from flash_attn_v100_tpu.parallel.ring import zigzag_shard, zigzag_unshard
    n = 4
    mesh = make_mesh(data=1, seq=n, model=1)
    B, M, H, D = 1, 128, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    do = mk(rng, B, M, H, D)
    doz = zigzag_shard(do, n)

    def loss(qz, kz, vz):
        return (ring_attention(qz, kz, vz, mesh, causal=True,
                               layout="zigzag") * doz).sum()

    dqz, dkz, dvz = jax.grad(loss, argnums=(0, 1, 2))(
        zigzag_shard(q, n), zigzag_shard(k, n), zigzag_shard(v, n))

    def ref_loss(q, k, v):
        return (mha_reference(q, k, v, causal=True, upcast=True) * do).sum()

    g = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b, nme in zip((dqz, dkz, dvz), g, "qkv"):
        assert max_abs_err(zigzag_unshard(a, n), b) < 2e-3, \
            (nme, max_abs_err(zigzag_unshard(a, n), b))


def test_ring_grad_dropout(rng):
    """Ring backward replays the global dropout mask (grad vs dense vjp)."""
    from flash_attn_v100_tpu.ops.flash_attention import flash_attn_func
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, H, D = 1, 128, 2, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    do = mk(rng, B, M, H, D)
    seed = jnp.asarray([9, 7], jnp.uint32)

    def loss(q, k, v):
        return (ring_attention(q, k, v, mesh, causal=True, dropout_p=0.25,
                               dropout_seed=seed) * do).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
    from flash_attn_v100_tpu.ops.pallas.bwd import flash_attn_dense_bwd
    from flash_attn_v100_tpu.ops.pallas import masks as masklib
    params = masklib.MaskParams(causal=True)
    out, lse = flash_attn_dense_fwd(q, k, v, D ** -0.5, params,
                                    dropout_p=0.25, dropout_seed=seed)
    g = flash_attn_dense_bwd(q, k, v, out, do, lse, D ** -0.5, params,
                             dropout_p=0.25, dropout_seed=seed)
    for a, b, n in zip((dq, dk, dv), g, "qkv"):
        assert max_abs_err(a, b) < 2e-4, (n, max_abs_err(a, b))


def test_sharded_decode_append_rotary_tnew(rng):
    """Full-surface seq x model sharded decode: T_new=3, append, rotary,
    causal — vs the unsharded wrapper on the same global cache."""
    from flash_attn_v100_tpu import flash_attn_with_kvcache
    mesh = make_mesh(data=1, seq=4, model=2)
    B, T, Hq, Hk, D = 2, 3, 4, 2, 64
    N = 512
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, Hk, N, D), mk(rng, B, Hk, N, D)
    kn, vn = mk(rng, B, T, Hk, D), mk(rng, B, T, Hk, D)
    cos = mk(rng, N, D // 2)
    sin = mk(rng, N, D // 2)
    lens = jnp.asarray([300, 77], jnp.int32)

    out_s, lse_s, (kc_s, vc_s) = flash_attn_with_kvcache_sharded(
        q, kc, vc, mesh, lens, k=kn, v=vn, rotary_cos=cos, rotary_sin=sin,
        causal=True, return_softmax_lse=True)

    out_r, lse_r, (kc_r, vc_r) = flash_attn_with_kvcache(
        q, kc, vc, k=kn, v=vn, rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=lens, causal=True, kv_cache_layout="HND",
        return_softmax_lse=True)

    assert max_abs_err(out_s, out_r) < 1e-5, max_abs_err(out_s, out_r)
    assert max_abs_err(lse_s, lse_r) < 1e-5
    assert jnp.allclose(kc_s, kc_r) and jnp.allclose(vc_s, vc_r)


def test_sharded_decode_window_alibi(rng):
    from flash_attn_v100_tpu import flash_attn_with_kvcache
    mesh = make_mesh(data=1, seq=4, model=2)
    B, T, Hq, Hk, D = 2, 2, 4, 2, 64
    N = 512
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, Hk, N, D), mk(rng, B, Hk, N, D)
    lens = jnp.asarray([400, 150], jnp.int32)
    slopes = jnp.asarray(rng.uniform(0.01, 0.2, (Hq,)), jnp.float32)

    out_s = flash_attn_with_kvcache_sharded(
        q, kc, vc, mesh, lens, causal=True, window_size=(200, -1),
        alibi_slopes=slopes)
    out_r = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=lens, causal=True, window_size=(200, -1),
        alibi_slopes=slopes, kv_cache_layout="HND")
    assert max_abs_err(out_s, out_r) < 1e-5, max_abs_err(out_s, out_r)


def test_sharded_decode_paged_int8(rng):
    """Paged + int8 pools sharded over seq x model vs the unsharded kernel
    on the assembled global pool."""
    from flash_attn_v100_tpu import flash_attn_with_kvcache
    from flash_attn_v100_tpu.ops.quant import quantize_kv
    sp, tp = 4, 2
    mesh = make_mesh(data=1, seq=sp, model=tp)
    B, T, Hq, Hk, D, ps = 2, 1, 4, 2, 64, 64
    mp_local = 2                      # pages per (batch, shard) table slice
    P_local = B * mp_local            # local pool size per shard
    q = mk(rng, B, T, Hq, D)

    pools_k, pools_v, tbls = [], [], []
    for s in range(sp):
        pools_k.append(mk(rng, Hk, P_local, ps, D))
        pools_v.append(mk(rng, Hk, P_local, ps, D))
        ids = rng.permutation(P_local).reshape(B, mp_local)
        tbls.append(ids.astype(np.int32))
    pool_k = jnp.concatenate(pools_k, axis=1)     # (Hk, sp*P_local, ps, D)
    pool_v = jnp.concatenate(pools_v, axis=1)
    tbl_sharded = jnp.asarray(np.concatenate(tbls, axis=1))   # (B, sp*mp)
    tbl_global = jnp.asarray(np.concatenate(
        [tbls[s] + s * P_local for s in range(sp)], axis=1))

    kq, ks = quantize_kv(pool_k, jnp.int8)
    vq, vs = quantize_kv(pool_v, jnp.int8)
    lens = jnp.asarray([mp_local * ps - 13, 70], jnp.int32)

    out_s = flash_attn_with_kvcache_sharded(
        q, kq, vq, mesh, lens, block_table=tbl_sharded,
        k_scales=ks, v_scales=vs, causal=True)
    out_r = flash_attn_with_kvcache(
        q, kq, vq, cache_seqlens=lens, block_table=tbl_global,
        k_scales=ks, v_scales=vs, causal=True, kv_cache_layout="HND")
    assert max_abs_err(out_s, out_r) < 1e-5, max_abs_err(out_s, out_r)


def test_sharded_decode_paged_append(rng):
    """Paged sharded append lands the new token in the right shard's pool."""
    from flash_attn_v100_tpu import flash_attn_with_kvcache
    sp = 4
    mesh = make_mesh(data=1, seq=sp, model=2)
    B, T, Hq, Hk, D, ps = 2, 1, 4, 2, 64, 64
    mp_local = 2
    P_local = B * mp_local
    q = mk(rng, B, T, Hq, D)
    kn, vn = mk(rng, B, T, Hk, D), mk(rng, B, T, Hk, D)

    pools_k, pools_v, tbls = [], [], []
    for s in range(sp):
        pools_k.append(mk(rng, Hk, P_local, ps, D))
        pools_v.append(mk(rng, Hk, P_local, ps, D))
        tbls.append(rng.permutation(P_local).reshape(B, mp_local).astype(np.int32))
    pool_k = jnp.concatenate(pools_k, axis=1)
    pool_v = jnp.concatenate(pools_v, axis=1)
    tbl_sharded = jnp.asarray(np.concatenate(tbls, axis=1))
    tbl_global = jnp.asarray(np.concatenate(
        [tbls[s] + s * P_local for s in range(sp)], axis=1))

    # lens straddle shards: 130 -> appends into shard 1 (rows 128..)
    lens = jnp.asarray([130, 63], jnp.int32)
    out_s, (kc_s, vc_s) = flash_attn_with_kvcache_sharded(
        q, pool_k, pool_v, mesh, lens, k=kn, v=vn,
        block_table=tbl_sharded, causal=True)
    out_r, (kc_r, vc_r) = flash_attn_with_kvcache(
        q, pool_k, pool_v, k=kn, v=vn, cache_seqlens=lens,
        block_table=tbl_global, causal=True, kv_cache_layout="HND")
    assert max_abs_err(out_s, out_r) < 1e-5, max_abs_err(out_s, out_r)
    assert jnp.allclose(kc_s, kc_r) and jnp.allclose(vc_s, vc_r)


def test_ulysses_attention(rng):
    """Ulysses (all-to-all) sequence parallelism: full feature surface via
    the unmodified dense kernel on re-sharded heads."""
    from flash_attn_v100_tpu.parallel.ring import ulysses_attention
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, Hq, Hk, D = 1, 256, 8, 4, 32
    q, k, v = mk(rng, B, M, Hq, D), mk(rng, B, M, Hk, D), mk(rng, B, M, Hk, D)
    for kw in (dict(causal=True), dict(causal=True, window_size=(60, -1)),
               dict(causal=False, softcap=10.0)):
        out = ulysses_attention(q, k, v, mesh, **kw)
        ref32 = mha_reference(q, k, v, upcast=True, **kw)
        refnat = mha_reference(q, k, v, upcast=False, **kw)
        assert out.shape == q.shape
        assert_fwd_close(out, ref32, refnat)


def test_ulysses_grad(rng):
    from flash_attn_v100_tpu.parallel.ring import ulysses_attention
    mesh = make_mesh(data=1, seq=4, model=1)
    B, M, H, D = 1, 128, 4, 32
    q, k, v = mk(rng, B, M, H, D), mk(rng, B, M, H, D), mk(rng, B, M, H, D)
    do = mk(rng, B, M, H, D)

    def loss(q, k, v):
        return (ulysses_attention(q, k, v, mesh, causal=True) * do).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: (mha_reference(
        q, k, v, causal=True, upcast=True) * do).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b, n in zip(g, gr, "qkv"):
        assert max_abs_err(a, b) < 2e-3, (n, max_abs_err(a, b))
