"""Varlen (packed cu_seqlens) attention vs the per-sequence oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_varlen_func
from flash_attn_v100_tpu.ops.reference import mha_reference_varlen
from flash_attn_v100_tpu.ops.padding import unpad_input, pad_input
from flash_attn_v100_tpu.utils.testing import (
    assert_fwd_close, assert_bwd_close, max_abs_err)


def make_packed(rng, lens_q, lens_k, Hq, Hk, D, dtype=jnp.float16):
    Tq, Tk = sum(lens_q), sum(lens_k)
    q = jnp.asarray(rng.standard_normal((Tq, Hq, D)), dtype)
    k = jnp.asarray(rng.standard_normal((Tk, Hk, D)), dtype)
    v = jnp.asarray(rng.standard_normal((Tk, Hk, D)), dtype)
    cu_q = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], np.cumsum(lens_k)]), jnp.int32)
    return q, k, v, cu_q, cu_k, max(lens_q), max(lens_k)


CASES = [
    # (lens_q, lens_k) pairs
    ([64, 128, 32], [64, 128, 32]),
    ([37, 200, 1], [37, 200, 1]),            # ragged, decode-like seq
    ([16, 48], [128, 96]),                    # cross lengths (M < N per seq)
]


@pytest.mark.parametrize("lens", CASES)
@pytest.mark.parametrize("causal", [False, True])
def test_varlen_fwd(rng, lens, causal):
    lens_q, lens_k = lens
    if causal and any(lq > lk for lq, lk in zip(lens_q, lens_k)):
        pytest.skip("causal with M > N untested (reference parity)")
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens_q, lens_k, 4, 2, 64)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, msq, msk, causal=causal)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=causal, upcast=True)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=causal, upcast=False)
    assert out.shape == q.shape
    assert_fwd_close(out, ref32, refnat)


@pytest.mark.parametrize("feature", ["window", "softcap", "alibi", "dropout"])
def test_varlen_fwd_features(rng, feature):
    lens = [64, 128, 32]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, 4, 4, 64)
    kwargs = dict(causal=True)
    okwargs = dict(causal=True)
    if feature == "window":
        kwargs["window_size"] = okwargs["window_size"] = (31, 0)
    elif feature == "softcap":
        kwargs["softcap"] = okwargs["softcap"] = 25.0
    elif feature == "alibi":
        sl = jnp.asarray([0.5 ** (i + 1) for i in range(4)], jnp.float32)
        kwargs["alibi_slopes"] = okwargs["alibi_slopes"] = sl
    elif feature == "dropout":
        kwargs.update(dropout_p=0.25, dropout_seed=3)
        okwargs.update(dropout_p=0.25, dropout_seed=3)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, msq, msk, **kwargs)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, upcast=True, **okwargs)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, upcast=False, **okwargs)
    assert_fwd_close(out, ref32, refnat)


def test_varlen_lse_layout(rng):
    lens = [64, 96]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, 2, 2, 32)
    out, lse, _ = flash_attn_varlen_func(q, k, v, cu_q, cu_k, msq, msk,
                                         causal=True, return_attn_probs=True)
    _, lse_ref = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True,
                                      return_lse=True)
    assert lse.shape == (2, sum(lens))  # (Hq, total_q): reference layout
    assert max_abs_err(lse, lse_ref) < 5e-3


@pytest.mark.parametrize("gqa", [False, True])
def test_varlen_bwd(rng, gqa):
    lens = [64, 128, 32]
    Hq, Hk = (4, 2) if gqa else (2, 2)
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, Hq, Hk, 64)
    do = jnp.asarray(rng.standard_normal(q.shape), q.dtype)

    dq, dk, dv = jax.grad(
        lambda q, k, v: (flash_attn_varlen_func(
            q, k, v, cu_q, cu_k, msq, msk, causal=True) * do).sum(),
        argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v, upcast):
        return (mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True,
                                     upcast=upcast) * do).sum()

    g32 = jax.grad(lambda *a: ref_loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    gnat = jax.grad(lambda *a: ref_loss(*a, False), argnums=(0, 1, 2))(q, k, v)
    for g, gr32, grn, name in zip((dq, dk, dv), g32, gnat, ("dq", "dk", "dv")):
        assert_bwd_close(g, gr32, grn, name)


def test_varlen_bwd_dropout(rng):
    lens = [64, 96]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, 2, 2, 64)
    do = jnp.asarray(rng.standard_normal(q.shape), q.dtype)
    kw = dict(dropout_p=0.2, dropout_seed=9, causal=True)

    dq, dk, dv = jax.grad(
        lambda q, k, v: (flash_attn_varlen_func(
            q, k, v, cu_q, cu_k, msq, msk, **kw) * do).sum(),
        argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v, upcast):
        return (mha_reference_varlen(q, k, v, cu_q, cu_k, upcast=upcast,
                                     **kw) * do).sum()

    g32 = jax.grad(lambda *a: ref_loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    gnat = jax.grad(lambda *a: ref_loss(*a, False), argnums=(0, 1, 2))(q, k, v)
    for g, gr32, grn, name in zip((dq, dk, dv), g32, gnat, ("dq", "dk", "dv")):
        assert_bwd_close(g, gr32, grn, name)


def test_varlen_seqused_k(rng):
    lens = [64, 96]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, 2, 2, 32)
    seqused = jnp.asarray([40, 80], jnp.int32)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, msq, msk,
                                 seqused_k=seqused)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, upcast=True,
                                 seqused_k=seqused)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, upcast=False,
                                  seqused_k=seqused)
    assert_fwd_close(out, ref32, refnat)


def test_varlen_seqused_k_zero(rng):
    """A sequence with seqused_k == 0 has an EMPTY valid-k range for all its
    q rows: output must be exactly 0 there (fully-masked-row semantics,
    reference kernel/fused_mha_forward_varlen.cu:100-111), and it must not
    contaminate neighbours.  Regression: empty-range rows used to keep a
    finite k_lo_row, letting the upper-compare-only kernel path count their
    exp(-inf - -inf) = 1 terms into l."""
    lens = [64, 64, 96]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, 2, 2, 32)
    seqused = jnp.asarray([40, 0, 80], jnp.int32)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, msq, msk,
                                 seqused_k=seqused)
    assert bool(jnp.all(out[64:128] == 0.0)), "empty-seqused rows must be 0"
    live = jnp.asarray([True] * 64 + [False] * 64 + [True] * 96)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, upcast=True,
                                 seqused_k=seqused)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, upcast=False,
                                  seqused_k=seqused)
    assert_fwd_close(out[live], ref32[live], refnat[live])


def test_unpad_pad_roundtrip(rng):
    B, S, H, D = 3, 64, 2, 16
    x = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    lens = np.asarray([10, 64, 33])
    mask = np.zeros((B, S), np.int32)
    for b, l in enumerate(lens):
        mask[b, :l] = 1
    un, indices, cu, max_s, seqlens = unpad_input(x, jnp.asarray(mask))
    assert un.shape[0] == lens.sum()
    assert max_s == 64
    np.testing.assert_array_equal(np.asarray(cu), np.concatenate([[0], np.cumsum(lens)]))
    back = pad_input(un, indices, B, S)
    expect = np.asarray(x) * mask[:, :, None, None]
    np.testing.assert_allclose(np.asarray(back), expect, rtol=0, atol=0)


def test_unpad_grad_flow(rng):
    """unpad -> varlen attention -> pad is differentiable end-to-end."""
    B, S, H, D = 2, 32, 2, 16
    x = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    mask = np.zeros((B, S), np.int32)
    mask[0, :20] = 1
    mask[1, :32] = 1
    un, indices, cu, max_s, _ = unpad_input(x, jnp.asarray(mask))

    def loss(xu):
        o = flash_attn_varlen_func(xu, xu, xu, cu, cu, max_s, max_s, causal=True)
        return (pad_input(o, indices, B, S) ** 2).sum()

    g = jax.grad(loss)(un)
    assert g.shape == un.shape
    assert np.isfinite(np.asarray(g)).all()


def _fill_pool(packed, lens, ps, Hk, D, dtype):
    """Scatter packed (Tk, Hk, D) KV into an HND (Hk, P, ps, D) pool; returns
    (pool, block_table)."""
    B = len(lens)
    pages_per = [-(-L // ps) for L in lens]
    P = sum(pages_per) + 1          # page 0 unused (scratch)
    pool = np.zeros((Hk, P, ps, D), np.float32)
    bt = np.zeros((B, max(pages_per)), np.int32)
    nxt, off = 1, 0
    for b, L in enumerate(lens):
        for j in range(pages_per[b]):
            n = min(ps, L - j * ps)
            pool[:, nxt, :n] = np.moveaxis(
                np.asarray(packed[off + j * ps: off + j * ps + n],
                           np.float32), 1, 0)
            bt[b, j] = nxt
            nxt += 1
        off += L
    return jnp.asarray(pool, dtype), jnp.asarray(bt)


def test_varlen_paged_inkernel_hnd(rng):
    """Paged-KV varlen prefill with IN-KERNEL page resolution (HND pool,
    kv_cache_layout="HND"): matches the per-sequence oracle, and the jaxpr
    contains NO contiguous KV materialization (reference analog:
    kernel/fused_mha_forward_varlen.cu:184-199 resolves pages per tile)."""
    Hq, Hk, D, ps = 4, 2, 64, 128
    lens_q = [64, 100, 17]
    lens_k = [200, 128, 37]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(
        rng, lens_q, lens_k, Hq, Hk, D)
    kp, bt = _fill_pool(k, lens_k, ps, Hk, D, k.dtype)
    vp, _ = _fill_pool(v, lens_k, ps, Hk, D, v.dtype)

    fn = lambda q, kp, vp: flash_attn_varlen_func(
        q, kp, vp, cu_q, cu_k, msq, msk, causal=True,
        block_table=bt, kv_cache_layout="HND")
    out = fn(q, kp, vp)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True,
                                 upcast=True)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True,
                                  upcast=False)
    assert_fwd_close(out, ref32, refnat)

    # no O(Tk*Hk*D) gathered copy: scan every intermediate for a
    # packed-KV-sized buffer (B * pages_per_seq * ps tokens)
    B = len(lens_k)
    mp = -(-msk // ps)
    banned = {(B * mp * ps, Hk, D), (B, mp * ps, Hk, D)}
    jaxpr = jax.make_jaxpr(fn)(q, kp, vp)
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            assert tuple(var.aval.shape) not in banned, (
                eqn.primitive, var.aval.shape)


def test_varlen_paged_nhd_no_gather(rng):
    """Reference-layout NHD pools (num_pages, ps, Hk, D) with ps % 128 == 0
    no longer pay the per-call page GATHER: one transpose to the HND pool,
    then the same in-kernel page streaming (VERDICT r3 #7).  Numerics match
    the oracle and the jaxpr holds no gathered contiguous KV stream."""
    Hq, Hk, D, ps = 4, 2, 64, 128
    lens_q = [64, 100, 17]
    lens_k = [200, 128, 37]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(
        rng, lens_q, lens_k, Hq, Hk, D)
    kp, bt = _fill_pool(k, lens_k, ps, Hk, D, k.dtype)
    vp, _ = _fill_pool(v, lens_k, ps, Hk, D, v.dtype)
    # HND fixture -> reference NHD layout (P, ps, Hk, D)
    kp_nhd = jnp.transpose(kp, (1, 2, 0, 3))
    vp_nhd = jnp.transpose(vp, (1, 2, 0, 3))

    fn = lambda q, kp_, vp_: flash_attn_varlen_func(
        q, kp_, vp_, cu_q, cu_k, msq, msk, causal=True, block_table=bt)
    out = fn(q, kp_nhd, vp_nhd)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True,
                                 upcast=True)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True,
                                  upcast=False)
    assert_fwd_close(out, ref32, refnat)

    B = len(lens_k)
    mp = -(-msk // ps)
    banned = {(B * mp * ps, Hk, D), (B, mp * ps, Hk, D)}
    jaxpr = jax.make_jaxpr(fn)(q, kp_nhd, vp_nhd)
    for eqn in jaxpr.jaxpr.eqns:
        # small int32 index-vector gathers (ragged info) are fine; a
        # KV-stream-sized gather output is the materialization this guards
        for var in eqn.outvars:
            assert tuple(var.aval.shape) not in banned, (
                eqn.primitive, var.aval.shape)
            if eqn.primitive.name == "gather":
                assert var.aval.size < 10_000, (
                    "KV-sized gather in NHD paged jaxpr", var.aval.shape)


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_sort_sequences(rng, causal):
    """sort_sequences=True permutes sequences into descending-KV-length
    order around the kernel call (the mixed-batch MXU-waste fix); outputs
    and gradients must match the unsorted path's oracle exactly (same math,
    different tile grouping)."""
    lens = [37, 200, 96, 128, 64]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, 4, 2, 64)
    out = flash_attn_varlen_func(q, k, v, cu_q, cu_k, msq, msk,
                                 causal=causal, sort_sequences=True)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=causal,
                                 upcast=True)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=causal,
                                  upcast=False)
    assert_fwd_close(out, ref32, refnat)

    do = jnp.asarray(rng.standard_normal(q.shape), q.dtype)
    dq, dk, dv = jax.grad(
        lambda q, k, v: (flash_attn_varlen_func(
            q, k, v, cu_q, cu_k, msq, msk, causal=causal,
            sort_sequences=True) * do).sum(),
        argnums=(0, 1, 2))(q, k, v)

    def ref_loss(q, k, v, upcast):
        return (mha_reference_varlen(q, k, v, cu_q, cu_k, causal=causal,
                                     upcast=upcast) * do).sum()

    g32 = jax.grad(lambda *a: ref_loss(*a, True), argnums=(0, 1, 2))(q, k, v)
    gnat = jax.grad(lambda *a: ref_loss(*a, False), argnums=(0, 1, 2))(q, k, v)
    for g, gr32, grn, name in zip((dq, dk, dv), g32, gnat, ("dq", "dk", "dv")):
        assert_bwd_close(g, gr32, grn, name)


def test_varlen_sort_sequences_jit(rng):
    """sort path under jit with traced cu_seqlens (static shapes end-to-end)."""
    lens = [64, 16, 128]
    q, k, v, cu_q, cu_k, msq, msk = make_packed(rng, lens, lens, 2, 2, 32)
    f = jax.jit(lambda q, k, v, cq, ck: flash_attn_varlen_func(
        q, k, v, cq, ck, msq, msk, causal=True, sort_sequences=True))
    out = f(q, k, v, cu_q, cu_k)
    ref32 = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True, upcast=True)
    refnat = mha_reference_varlen(q, k, v, cu_q, cu_k, causal=True, upcast=False)
    assert_fwd_close(out, ref32, refnat)
