"""KV-cache decode: contiguous + paged caches, append, rotary, split-KV,
cache_batch_idx, leftpad — vs the kvcache oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_with_kvcache
from flash_attn_v100_tpu.ops.reference import mha_reference_kvcache
from flash_attn_v100_tpu.ops.rotary import apply_rotary_emb
from flash_attn_v100_tpu.utils.testing import assert_fwd_close, max_abs_err


def mk(rng, *shape, dtype=jnp.float16):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def make_rotary(rng, seqlen_ro, rot_half):
    ang = rng.uniform(0, 2 * np.pi, (seqlen_ro, rot_half))
    return jnp.asarray(np.cos(ang), jnp.float32), jnp.asarray(np.sin(ang), jnp.float32)


def check(out, q, k_cache, v_cache, **kw):
    ref32 = mha_reference_kvcache(q, k_cache, v_cache, upcast=True, **kw)[0]
    refnat = mha_reference_kvcache(q, k_cache, v_cache, upcast=False, **kw)[0]
    assert_fwd_close(out, ref32, refnat)


def test_decode_basic(rng):
    B, T, Hq, Hk, D, N = 3, 1, 8, 2, 64, 256
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    cs = jnp.asarray([100, 256, 37], jnp.int32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs, causal=True)
    check(out, q, kc, vc, cache_seqlens=cs, causal=True)


def test_decode_append(rng):
    B, T, Hq, Hk, D, N = 2, 1, 4, 4, 64, 128
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    kn, vn = mk(rng, B, T, Hk, D), mk(rng, B, T, Hk, D)
    cs = jnp.asarray([64, 100], jnp.int32)
    out, (kc2, vc2) = flash_attn_with_kvcache(
        q, kc, vc, k=kn, v=vn, cache_seqlens=cs, causal=True)
    ref32, kref, vref = mha_reference_kvcache(
        q, kc, vc, k_new=kn, v_new=vn, cache_seqlens=cs, causal=True, upcast=True)
    refnat = mha_reference_kvcache(
        q, kc, vc, k_new=kn, v_new=vn, cache_seqlens=cs, causal=True,
        upcast=False)[0]
    assert_fwd_close(out, ref32, refnat)
    # cache update parity (exact: same values written)
    np.testing.assert_allclose(np.asarray(kc2, np.float32),
                               np.asarray(kref, np.float32), atol=1e-3)
    np.testing.assert_allclose(np.asarray(vc2, np.float32),
                               np.asarray(vref, np.float32), atol=1e-3)


def test_decode_prefill_chunk_causal(rng):
    """T_new > 1: causal over the appended chunk."""
    B, T, Hq, Hk, D, N = 2, 16, 2, 2, 32, 128
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    kn, vn = mk(rng, B, T, Hk, D), mk(rng, B, T, Hk, D)
    cs = jnp.asarray([40, 0], jnp.int32)
    out, _ = flash_attn_with_kvcache(q, kc, vc, k=kn, v=vn, cache_seqlens=cs,
                                     causal=True)
    ref32 = mha_reference_kvcache(q, kc, vc, k_new=kn, v_new=vn,
                                  cache_seqlens=cs, causal=True, upcast=True)[0]
    refnat = mha_reference_kvcache(q, kc, vc, k_new=kn, v_new=vn,
                                   cache_seqlens=cs, causal=True, upcast=False)[0]
    assert_fwd_close(out, ref32, refnat)


def test_decode_rotary(rng):
    B, T, Hq, Hk, D, N = 2, 1, 2, 2, 64, 128
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    kn, vn = mk(rng, B, T, Hk, D), mk(rng, B, T, Hk, D)
    cos, sin = make_rotary(rng, N + T, D // 2)
    cs = jnp.asarray([30, 77], jnp.int32)
    for inter in (True, False):
        out, _ = flash_attn_with_kvcache(
            q, kc, vc, k=kn, v=vn, rotary_cos=cos, rotary_sin=sin,
            cache_seqlens=cs, causal=True, rotary_interleaved=inter)
        ref32 = mha_reference_kvcache(
            q, kc, vc, k_new=kn, v_new=vn, rotary_cos=cos, rotary_sin=sin,
            cache_seqlens=cs, causal=True, rotary_interleaved=inter,
            upcast=True)[0]
        refnat = mha_reference_kvcache(
            q, kc, vc, k_new=kn, v_new=vn, rotary_cos=cos, rotary_sin=sin,
            cache_seqlens=cs, causal=True, rotary_interleaved=inter,
            upcast=False)[0]
        assert_fwd_close(out, ref32, refnat)


def test_decode_batch_idx_leftpad(rng):
    B, T, Hq, Hk, D, N = 2, 1, 2, 2, 32, 128
    Bc = 4
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, Bc, N, Hk, D), mk(rng, Bc, N, Hk, D)
    cs = jnp.asarray([50, 80], jnp.int32)
    bidx = jnp.asarray([3, 1], jnp.int32)
    lp = jnp.asarray([5, 16], jnp.int32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs,
                                  cache_batch_idx=bidx, cache_leftpad=lp,
                                  causal=True)
    check(out, q, kc, vc, cache_seqlens=cs, cache_batch_idx=bidx,
          cache_leftpad=lp, causal=True)


def test_decode_window_alibi_softcap(rng):
    B, T, Hq, Hk, D, N = 2, 1, 4, 2, 64, 256
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    cs = jnp.asarray([200, 256], jnp.int32)
    sl = jnp.asarray([0.5 ** (i + 1) for i in range(Hq)], jnp.float32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs, causal=True,
                                  window_size=(64, -1), alibi_slopes=sl)
    check(out, q, kc, vc, cache_seqlens=cs, causal=True,
          window_size=(64, -1), alibi_slopes=sl)
    out2 = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs, softcap=15.0)
    check(out2, q, kc, vc, cache_seqlens=cs, softcap=15.0)


@pytest.mark.parametrize("num_splits", [1, 4])
def test_decode_split_kv(rng, num_splits):
    B, T, Hq, Hk, D, N = 1, 1, 2, 2, 64, 512
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    cs = jnp.asarray([313], jnp.int32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs, causal=True,
                                  num_splits=num_splits)
    check(out, q, kc, vc, cache_seqlens=cs, causal=True)


def test_decode_paged(rng):
    B, T, Hq, Hk, D = 2, 1, 2, 2, 64
    ps, npages_per_seq, P = 64, 4, 16
    q = mk(rng, B, T, Hq, D)
    pool_k, pool_v = mk(rng, P, ps, Hk, D), mk(rng, P, ps, Hk, D)
    # scrambled page assignment
    table = jnp.asarray([[7, 2, 11, 0], [5, 9, 1, 14]], jnp.int32)
    cs = jnp.asarray([150, 200], jnp.int32)
    out = flash_attn_with_kvcache(q, pool_k, pool_v, cache_seqlens=cs,
                                  block_table=table, causal=True)
    # oracle: materialize each sequence from its pages
    kmat = np.zeros((B, ps * npages_per_seq, Hk, D), np.float32)
    vmat = np.zeros_like(kmat)
    for b in range(B):
        for i in range(npages_per_seq):
            kmat[b, i * ps:(i + 1) * ps] = np.asarray(pool_k[table[b, i]], np.float32)
            vmat[b, i * ps:(i + 1) * ps] = np.asarray(pool_v[table[b, i]], np.float32)
    ref32 = mha_reference_kvcache(q, jnp.asarray(kmat, q.dtype),
                                  jnp.asarray(vmat, q.dtype),
                                  cache_seqlens=cs, causal=True, upcast=True)[0]
    refnat = mha_reference_kvcache(q, jnp.asarray(kmat, q.dtype),
                                   jnp.asarray(vmat, q.dtype),
                                   cache_seqlens=cs, causal=True, upcast=False)[0]
    assert_fwd_close(out, ref32, refnat)


def test_decode_paged_append(rng):
    B, T, Hq, Hk, D = 2, 1, 2, 2, 32
    ps, P = 32, 8
    q = mk(rng, B, T, Hq, D)
    pool_k, pool_v = mk(rng, P, ps, Hk, D), mk(rng, P, ps, Hk, D)
    kn, vn = mk(rng, B, T, Hk, D), mk(rng, B, T, Hk, D)
    table = jnp.asarray([[0, 3, 6], [2, 5, 7]], jnp.int32)
    cs = jnp.asarray([40, 95], jnp.int32)
    out, (pk2, pv2) = flash_attn_with_kvcache(
        q, pool_k, pool_v, k=kn, v=vn, cache_seqlens=cs,
        block_table=table, causal=True)
    # verify the append landed in the right page slots
    pk2 = np.asarray(pk2, np.float32)
    for b in range(B):
        pos = int(cs[b])
        pg, off = int(table[b, pos // ps]), pos % ps
        np.testing.assert_allclose(pk2[pg, off],
                                   np.asarray(kn[b, 0], np.float32), atol=1e-3)
    # attention parity vs materialized cache (pre-append pool + appended row)
    npg = table.shape[1]
    kmat = np.zeros((B, ps * npg, Hk, D), np.float32)
    vmat = np.zeros_like(kmat)
    for b in range(B):
        for i in range(npg):
            kmat[b, i * ps:(i + 1) * ps] = np.asarray(pool_k[table[b, i]], np.float32)
            vmat[b, i * ps:(i + 1) * ps] = np.asarray(pool_v[table[b, i]], np.float32)
    ref32 = mha_reference_kvcache(
        q, jnp.asarray(kmat, q.dtype), jnp.asarray(vmat, q.dtype),
        k_new=kn, v_new=vn, cache_seqlens=cs, causal=True, upcast=True)[0]
    refnat = mha_reference_kvcache(
        q, jnp.asarray(kmat, q.dtype), jnp.asarray(vmat, q.dtype),
        k_new=kn, v_new=vn, cache_seqlens=cs, causal=True, upcast=False)[0]
    assert_fwd_close(out, ref32, refnat)


def test_decode_gqa_lse(rng):
    B, T, Hq, Hk, D, N = 2, 2, 8, 2, 64, 128
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    cs = jnp.asarray([64, 100], jnp.int32)
    out, lse = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs, causal=True,
                                       return_softmax_lse=True)
    ref = mha_reference_kvcache(q, kc, vc, cache_seqlens=cs, causal=True,
                                upcast=True, return_lse=True)
    assert lse.shape == (B, Hq, T)
    assert max_abs_err(lse, ref[3]) < 5e-3
    refnat = mha_reference_kvcache(q, kc, vc, cache_seqlens=cs, causal=True,
                                   upcast=False)[0]
    assert_fwd_close(out, ref[0], refnat)


def test_rotary_op_matches_manual(rng):
    """apply_rotary_emb vs a hand-rolled numpy rotation."""
    T, H, D = 8, 2, 16
    x = jnp.asarray(rng.standard_normal((1, T, H, D)), jnp.float32)
    cos, sin = make_rotary(rng, 32, D // 2)
    pos = jnp.asarray(np.arange(5, 5 + T))[None]
    # non-interleaved manual
    out = apply_rotary_emb(x, cos, sin, pos, interleaved=False)
    c = np.asarray(cos)[5:5 + T][:, None, :]
    s = np.asarray(sin)[5:5 + T][:, None, :]
    xn = np.asarray(x)[0]
    x1, x2 = xn[..., :D // 2], xn[..., D // 2:]
    expect = np.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1)
    np.testing.assert_allclose(np.asarray(out)[0], expect, atol=1e-5)
    # interleaved manual
    out_i = apply_rotary_emb(x, cos, sin, pos, interleaved=True)
    e1, e2 = xn[..., 0::2], xn[..., 1::2]
    ei = np.stack([e1 * c - e2 * s, e2 * c + e1 * s], -1).reshape(xn.shape)
    np.testing.assert_allclose(np.asarray(out_i)[0], ei, atol=1e-5)


def test_errors(rng):
    q = mk(rng, 1, 1, 2, 32)
    pool = mk(rng, 4, 32, 2, 32)
    table = jnp.zeros((1, 2), jnp.int32)
    with pytest.raises(ValueError):
        flash_attn_with_kvcache(q, pool, pool, block_table=table,
                                cache_batch_idx=jnp.zeros(1, jnp.int32))
    with pytest.raises(ValueError):
        flash_attn_with_kvcache(q, pool, pool, block_table=table,
                                cache_leftpad=jnp.zeros(1, jnp.int32))


def test_pick_head_block_vmem_boundary():
    """The head-fold heuristic must respect the 16 MB scoped-VMEM compile
    limit: budget stays under half of it, the fold divides Hk, and an
    impossible working set raises instead of failing inside Mosaic."""
    import pytest
    from flash_attn_v100_tpu.ops.pallas.decode import _pick_head_block

    for Hk in (1, 2, 4, 8, 16):
        for ps in (64, 256, 512, 1024):
            for rq, itemsize in ((8, 2), (8, 1), (512, 2)):
                hb = _pick_head_block(Hk, ps, 128, itemsize, rq)
                assert Hk % hb == 0
                per_head = (2 * 2 * ps * 128 * itemsize + rq * 128 * 2
                            + rq * 128 * 4 + 2 * 2 * rq * 128 * 4
                            + 3 * rq * 128 * 4)
                assert hb * per_head <= 8 * 1024 * 1024 or hb == 1

    # prefill-sized Rq with a huge page cannot fit even one head
    with pytest.raises(ValueError, match="scoped VMEM"):
        _pick_head_block(8, 8192, 256, 2, 4096)


@pytest.mark.parametrize("delta", [-1, 0, 1])
@pytest.mark.parametrize("leftpad", [False, True])
def test_decode_page_boundary_fastpath(rng, delta, leftpad):
    """Pin the interior-page fast path vs masked boundary path split
    (ops/pallas/decode.py _decode_page_update): cache_seqlens exactly at,
    one below, and one above a page boundary, with and without leftpad,
    must all match the oracle — the fully_valid predicate must never admit
    a page any row's causal/bounds mask would cut."""
    B, T, Hq, Hk, D, N = 2, 1, 4, 2, 64, 512   # page_size = 512 -> 2 pages? no: _pick_page_size(512)=512
    N = 1024                                    # 2 pages of 512
    q = mk(rng, B, T, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    lp = jnp.asarray([16, 3], jnp.int32) if leftpad else None
    base = 512 - (np.asarray(lp) if leftpad else 0)  # fill page 0 exactly
    cs = jnp.asarray(base + delta, jnp.int32).reshape(-1)[:B] \
        if leftpad else jnp.full((B,), 512 + delta, jnp.int32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs,
                                  cache_leftpad=lp, causal=True)
    check(out, q, kc, vc, cache_seqlens=cs, cache_leftpad=lp, causal=True)


@pytest.mark.parametrize("window", [(256, -1), (700, -1)])
def test_decode_window_page_boundary(rng, window):
    """Window edge landing inside vs between pages: the window_left branch
    of the fully_valid predicate uses qpos_base + t_new - 1 (the NEWEST
    row's position) — an off-by-one there would un-mask a column for the
    oldest row."""
    B, Hq, Hk, D, N = 2, 8, 2, 64, 1024
    t_new = 4
    q = mk(rng, B, t_new, Hq, D)
    kc, vc = mk(rng, B, N, Hk, D), mk(rng, B, N, Hk, D)
    cs = jnp.asarray([1024 - t_new, 777], jnp.int32)
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=cs, causal=True,
                                  window_size=window)
    check(out, q, kc, vc, cache_seqlens=cs, causal=True, window_size=window)


def test_paged_prefill_routes_varlen_kernel(rng):
    """Large-T paged prefill (group*T >= 1024, page %128) routes through the
    in-kernel paged varlen forward (q-tile x page grid) instead of the
    decode-shaped kernel whose single folded q tile exceeds scoped VMEM at
    prefill sizes.  Numerics must match the kvcache oracle exactly as the
    decode route does: append + causal prefix alignment."""
    B, T, Hq, Hk, D = 2, 256, 8, 2, 64
    ps, npages_per_seq, P = 128, 4, 12
    q = mk(rng, B, T, Hq, D)
    pool_k, pool_v = mk(rng, P, ps, Hk, D), mk(rng, P, ps, Hk, D)
    kn, vn = mk(rng, B, T, Hk, D), mk(rng, B, T, Hk, D)
    table = jnp.asarray([[7, 2, 11, 0], [5, 9, 1, 8]], jnp.int32)
    cs = jnp.asarray([150, 37], jnp.int32)   # existing cache prefix
    out, (pk2, pv2) = flash_attn_with_kvcache(
        q, pool_k, pool_v, k=kn, v=vn, cache_seqlens=cs,
        block_table=table, causal=True)
    assert out.shape == (B, T, Hq, D)
    # oracle: materialize each sequence from the UPDATED pages
    pk2m, pv2m = np.asarray(pk2, np.float32), np.asarray(pv2, np.float32)
    kmat = np.zeros((B, ps * npages_per_seq, Hk, D), np.float32)
    vmat = np.zeros_like(kmat)
    for b in range(B):
        for i in range(npages_per_seq):
            kmat[b, i * ps:(i + 1) * ps] = pk2m[table[b, i]]
            vmat[b, i * ps:(i + 1) * ps] = pv2m[table[b, i]]
    # the materialized cache already holds the appended tokens: oracle
    # attends the full cs + T extent with no further append
    ref32 = mha_reference_kvcache(
        q, jnp.asarray(kmat, q.dtype), jnp.asarray(vmat, q.dtype),
        cache_seqlens=cs + T, causal=True, upcast=True)[0]
    refnat = mha_reference_kvcache(
        q, jnp.asarray(kmat, q.dtype), jnp.asarray(vmat, q.dtype),
        cache_seqlens=cs + T, causal=True, upcast=False)[0]
    assert_fwd_close(out, ref32, refnat)
