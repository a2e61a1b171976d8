"""Dense flash-attention forward — Pallas TPU kernel.

TPU-native re-design of the reference's fused forward kernel
(reference: kernel/fused_mha_forward.cu:25-224): one fused pass per
(batch, q-head, q-tile) computing  S = QK^T -> bias/mask -> online softmax ->
O += P.V  over KV tiles, returning O and LSE = m + log(l)
(reference: kernel/fused_mha_forward.cu:220-223).

Differences by design (TPU-first, not a translation):
  * Mosaic handles what the reference's WMMA/smem-swizzle machinery does by
    hand: MXU tiling, VMEM residency, pipelined HBM->VMEM DMA.
  * The (q-tile, kv-tile) iteration space is FLATTENED to the live pairs
    only: shapes are static, so the causal/window block trim (reference:
    include/template.h:98-111) is evaluated at trace time into prefetched
    qi/ki index vectors — the grid never visits a fully-masked tile.  A
    Pallas grid step costs ~0.5 us even fully predicated off, so on long
    causal sequences this halves wall-clock versus a rectangular grid with
    `pl.when` skips.
  * softmax runs in the exp2 domain: without alibi/softcap the log2(e)
    factor fuses with the softmax scale into a single multiply over the
    scores tile; the stored LSE converts back to natural log.
  * Fully-valid tiles take a fast path that skips the mask pipeline; partial
    tiles use the block-local mask form (one static iota-diff + scalar
    compares).
  * Compute layout is (B, H, M, D); the public wrapper permutes from
    (B, M, H, D) exactly like the reference
    (flash_attn_v100/flash_attn_interface.py:36-53).
  * GQA head mapping (kv_head = q_head // group, reference:
    include/template.h:58) lives in the K/V index_map.
  * fp32 running (m, l, acc) in VMEM scratch; dropout applies to the
    unnormalized P tile while l accumulates pre-dropout sums — the same
    order as the reference (include/softmax.h:96-124).
  * LSE is written as (B, H, M, 1) fp32 and squeezed by the wrapper — dense
    LSE layout parity: (B, H, M) (reference: kernel/fused_mha_forward.cu:
    389-406).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_v100_tpu.config import NEG_INF, use_interpret
from flash_attn_v100_tpu.ops import philox
from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes, MIN_LANES, cdiv, round_up
from flash_attn_v100_tpu.ops.pallas import masks as masklib

LOG2E = 1.4426950408889634  # 1/ln(2): softmax runs in the exp2 domain
LN2 = 0.6931471805599453


def live_pairs_unrolled(num_q_blocks: int, num_kv_blocks: int, block_q: int,
                        block_k: int, offset: int,
                        params: masklib.MaskParams, unroll: int):
    """Unrolled live-pair map: each grid step visits `unroll` consecutive
    live kv tiles of one q tile (independent double-buffered DMA streams),
    amortizing the fixed per-grid-step cost over unroll x the MXU work —
    the prefill analog of the decode kernel's kv_unroll.

    Returns a (3 + 2*unroll, T) int32 array: rows [qi, first, last,
    ki_0..ki_{U-1}, live_0..live_{U-1}].  Dead sub-slots (ragged tail of a
    q tile's kv range) alias the last live tile with live=0."""
    wr = params.effective_window_right()
    wl = params.window_left
    cols = []
    for qi in range(num_q_blocks):
        lo, hi = 0, num_kv_blocks - 1
        if wr >= 0:
            hi = min(hi, (qi * block_q + block_q - 1 + offset + wr) // block_k)
        if wl >= 0:
            lo = max(lo, (qi * block_q + offset - wl) // block_k)
        placeholder = hi < lo
        if placeholder:  # no live kv: one fully-masked placeholder step
            lo = hi = min(max(lo, 0), num_kv_blocks - 1)
        lo = max(lo, 0)
        steps = -(-(hi - lo + 1) // unroll)
        for s in range(steps):
            kis, lives = [], []
            for u in range(unroll):
                j = lo + s * unroll + u
                kis.append(min(j, hi))
                lives.append(0 if (j > hi or (placeholder and u > 0)) else 1)
            cols.append([qi, 1 if s == 0 else 0, 1 if s == steps - 1 else 0]
                        + kis + lives)
    return np.asarray(cols, np.int32).T.copy()


def live_pairs_causal_mixed(num_q_blocks: int, num_kv_blocks: int,
                            block_q: int, block_k: int, offset: int,
                            params: masklib.MaskParams):
    """Pair map for the MIXED straight-line region (U=2, causal/window-right):
    the (possibly) partial tiles of each q block are FORCED into slot 1 of a
    two-live-tile step whose slot 0 is a fully-valid interior tile.  The
    kernel's mixed region then applies the mask compare to slot 1 only while
    keeping the register-resident carry chain for both tiles — diagonal
    steps pipeline like interior ones, with no second multi-tile region
    (the r4 VMEM failure) and no dead slots.

    Per q block: tiles [lo, hi] split into fully-valid interiors
    [lo, full_hi] and partials (full_hi, hi] (1 tile when offset % block_k
    == 0, else up to 2).  Each partial pairs with an interior; leftover
    interiors pair among themselves (slot 1's compare is then all-true);
    leftovers with no partner emit single-tile steps that take the per-tile
    path.  Requires offset >= 0 and window_left < 0 (no fully-masked rows).

    Rows: [qi, first, last, ki0, ki1, live0, live1, pair]."""
    wr = params.effective_window_right()
    assert wr >= 0 and params.window_left < 0 and offset >= 0
    cols = []
    for qi in range(num_q_blocks):
        q_start = qi * block_q
        hi = min(num_kv_blocks - 1,
                 (q_start + block_q - 1 + offset + wr) // block_k)
        # fully-valid iff k_start + block_k - 1 - offset <= q_start + wr
        full_hi = min((q_start + offset + wr - (block_k - 1)) // block_k, hi)
        interiors = list(range(0, full_hi + 1))
        partials = list(range(max(full_hi + 1, 0), hi + 1))
        steps = []  # (k0, k1, pair)
        while partials and interiors:
            steps.append((interiors.pop(0), partials.pop(0), 1))
        for kp in partials:
            steps.append((kp, kp, 0))
        while len(interiors) >= 2:
            steps.append((interiors.pop(0), interiors.pop(0), 1))
        for k0 in interiors:
            steps.append((k0, k0, 0))
        for idx, (k0, k1, pair) in enumerate(steps):
            cols.append([qi, 1 if idx == 0 else 0,
                         1 if idx == len(steps) - 1 else 0,
                         k0, k1, 1, pair, pair])
    return np.asarray(cols, np.int32).T.copy()


def build_seed_vec(dropout_seed, pos_base=None) -> jnp.ndarray:
    """(6,) uint32 SMEM vector [s0, s1, q_pos0, k_pos0, b0, h0] consumed by
    the dropout path of the dense kernels.  `pos_base` shifts Philox keying
    to global coordinates for sequence/head-sharded callers (ring)."""
    seed = jnp.asarray(dropout_seed, jnp.uint32).reshape(2)
    if pos_base is None:
        base = jnp.zeros((4,), jnp.uint32)
    else:
        base = jnp.stack([jnp.asarray(x).astype(jnp.uint32) for x in pos_base])
    return jnp.concatenate([seed, base])


def _fwd_kernel(
    # scalar prefetch: the flattened (unrolled) live-pair maps, one
    # (3 + 2*unroll, T) i32 array [qi; first; last; ki_u...; live_u...]
    pairs_ref,
    *refs,
    params: masklib.MaskParams,
    softmax_scale: float,
    dropout_p: float,
    seqlen_q: int,
    seqlen_k: int,
    num_heads: int,
    block_q: int,
    block_k: int,
    offset: int,
    unroll: int = 1,
    mixed: bool = False,  # causal mixed region (live_pairs_causal_mixed)
):
    has_alibi = params.has_alibi
    has_dropout = dropout_p > 0.0
    idx = 0
    slopes_ref = None
    seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]
        idx += 1
    if has_dropout:
        seed_ref = refs[idx]
        idx += 1
    q_ref = refs[idx]
    kv_refs = refs[idx + 1: idx + 1 + 2 * unroll]
    o_ref, lse_ref, m_scr, l_scr, acc_scr = refs[idx + 1 + 2 * unroll:]

    b, h, t = (pl.program_id(i) for i in range(3))
    qi = pairs_ref[0, t]
    q_start = qi * block_q
    padded_q = seqlen_q % block_q != 0
    padded_k = seqlen_k % block_k != 0
    needs_p_zero = params.window_left >= 0 or offset < 0

    @pl.when(pairs_ref[1, t] == 1)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def body(masked: bool, k_ref, v_ref, k_start):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)

        need_pos = has_alibi or has_dropout  # masking uses the local form
        rows, cols = (masklib.position_ids(block_q, block_k, q_start, k_start)
                      if need_pos else (None, None))
        alibi_slope = slopes_ref[b, h] if has_alibi else None
        # exp2-domain softmax (see module docstring)
        if has_alibi or params.softcap > 0.0:
            s = masklib.apply_score_bias(
                s, rows, cols, softmax_scale=softmax_scale, offset=offset,
                params=params, alibi_slope=alibi_slope)
            s = s * LOG2E
        else:
            s = s * (softmax_scale * LOG2E)
        valid = None
        if masked:
            valid = masklib.position_mask_local(
                block_q, block_k, q_start, k_start, offset, params,
                seqlen_q=seqlen_q if padded_q else None,
                seqlen_k=seqlen_k if padded_k else None)
            s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[...]  # (block_q, MIN_LANES) replicated
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
        m_next = jnp.maximum(m_prev, m_cur)  # broadcast -> (block_q, MIN_LANES)
        alpha = jnp.exp2(m_prev - m_next)

        p = jnp.exp2(s - m_next[:, :1])
        if masked and needs_p_zero:
            # a FULLY masked row has m == NEG_INF too, giving exp2(0) == 1 —
            # zero those so l stays 0 (reference early-exit semantics,
            # kernel/fused_mha_forward_varlen.cu:100-111).  Rows that merely
            # have SOME masked cols don't need this: their m is finite, so
            # exp2(NEG_INF - m) underflows to exactly 0.  Fully-masked rows
            # can only appear under window_left or a negative alignment
            # offset (M > N causal) — plain causal skips this VPU pass.
            p = jnp.where(valid, p, 0.0)

        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        if has_dropout:
            # seed_ref layout (6, uint32): [s0, s1, q_pos0, k_pos0, b0, h0].
            # The position bases shift local tile coordinates to GLOBAL
            # (sequence, batch, head) coordinates so sequence/head-sharded
            # callers (ring attention) replay the exact single-chip mask.
            q0 = seed_ref[2].astype(jnp.int32)
            k0 = seed_ref[3].astype(jnp.int32)
            b0 = seed_ref[4].astype(jnp.int32)
            h0 = seed_ref[5].astype(jnp.int32)
            bh = (b + b0) * num_heads + (h + h0)
            keep = philox.dropout_keep_mask(
                rows + q0, cols + k0, bh, seed_ref[0], seed_ref[1], dropout_p
            )
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)

        v = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    def drop_p(p, k_start):
        # Philox dropout inside the straight-line regions (r5): the keying
        # is position-based (never tile- or order-based), so the replay
        # contract is path-independent — the reference likewise fuses
        # dropout into its one hot pipeline (include/softmax.h:96-124).
        # Applied AFTER l accumulates (l sums pre-dropout p, same order as
        # the per-tile body).
        if not has_dropout:
            return p
        rows, cols = masklib.position_ids(block_q, block_k, q_start, k_start)
        bh = (b + seed_ref[4].astype(jnp.int32)) * num_heads \
            + (h + seed_ref[5].astype(jnp.int32))
        keep = philox.dropout_keep_mask(
            rows + seed_ref[2].astype(jnp.int32),
            cols + seed_ref[3].astype(jnp.int32), bh,
            seed_ref[0], seed_ref[1], dropout_p)
        return jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)

    def pipelined_all():
        # VPU/MXU software pipelining (the one structural axis the per-tile
        # loop can't express — VERDICT r3 #6): all U score matmuls issue as
        # one straight-line region BEFORE the softmax chain, and the
        # (m, l, acc) carries live in REGISTERS across the U sub-tiles (one
        # scratch read + one write per grid step instead of per sub-tile).
        # Mosaic's scheduler can then run S(u+1)'s MXU passes under
        # softmax(u)'s VPU pass — the serial S -> softmax -> PV chain of the
        # per-tile body never exposed that overlap.  Runs only when every
        # sub-tile is live AND fully valid (no masks), so no predication
        # splits the region; the reference's analog is its smem phase-union
        # pipelining (include/forward.h:42-59).
        q = q_ref[0, 0]
        ss = []
        for u in range(unroll):
            s = jax.lax.dot_general(
                q, kv_refs[2 * u][0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            k_start = pairs_ref[3 + u, t] * block_k
            if has_alibi or params.softcap > 0.0:
                rows, cols = masklib.position_ids(block_q, block_k,
                                                  q_start, k_start)
                s = masklib.apply_score_bias(
                    s, rows, cols, softmax_scale=softmax_scale,
                    offset=offset, params=params,
                    alibi_slope=slopes_ref[b, h] if has_alibi else None)
                s = s * LOG2E
            else:
                s = s * (softmax_scale * LOG2E)
            ss.append(s)
        m_c = m_scr[...]
        l_c = l_scr[...]
        acc_c = acc_scr[...]
        for u in range(unroll):
            s = ss[u]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_c, m_cur)
            alpha = jnp.exp2(m_c - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_c = alpha * l_c + jnp.sum(p, axis=1, keepdims=True)
            m_c = m_next
            p = drop_p(p, pairs_ref[3 + u, t] * block_k)
            v = kv_refs[2 * u + 1][0, 0]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_c = acc_c * alpha[:, :1] + pv
        m_scr[...] = m_c
        l_scr[...] = l_c
        acc_scr[...] = acc_c

    def mixed_pair():
        # The causal counterpart of pipelined_all (VERDICT r4 #4): one
        # straight-line two-tile region whose mask compare is confined to
        # slot 1 — the pair enumeration (live_pairs_causal_mixed) guarantees
        # slot 0 is fully valid and routes every partial (diagonal) tile to
        # slot 1, so diagonal steps keep the register carry chain and the
        # MXU/VPU overlap instead of falling to the serial per-tile path.
        # No p-zero: offset >= 0 and window_left < 0 mean every q row has
        # valid columns in slot 0 (m finite), so masked entries underflow.
        q = q_ref[0, 0]
        ss = []
        for u in range(2):
            s = jax.lax.dot_general(
                q, kv_refs[2 * u][0, 0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            k_start = pairs_ref[3 + u, t] * block_k
            if has_alibi or params.softcap > 0.0:
                rows, cols = masklib.position_ids(block_q, block_k,
                                                  q_start, k_start)
                s = masklib.apply_score_bias(
                    s, rows, cols, softmax_scale=softmax_scale,
                    offset=offset, params=params,
                    alibi_slope=slopes_ref[b, h] if has_alibi else None)
                s = s * LOG2E
            else:
                s = s * (softmax_scale * LOG2E)
            ss.append(s)
        valid1 = masklib.position_mask_local(
            block_q, block_k, q_start, pairs_ref[4, t] * block_k, offset,
            params)
        ss[1] = jnp.where(valid1, ss[1], NEG_INF)
        m_c = m_scr[...]
        l_c = l_scr[...]
        acc_c = acc_scr[...]
        for u in range(2):
            s = ss[u]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_c, m_cur)
            alpha = jnp.exp2(m_c - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_c = alpha * l_c + jnp.sum(p, axis=1, keepdims=True)
            m_c = m_next
            p = drop_p(p, pairs_ref[3 + u, t] * block_k)
            v = kv_refs[2 * u + 1][0, 0]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_c = acc_c * alpha[:, :1] + pv
        m_scr[...] = m_c
        l_scr[...] = l_c
        acc_scr[...] = acc_c

    def per_tile(u):
        k_ref, v_ref = kv_refs[2 * u], kv_refs[2 * u + 1]
        k_start = pairs_ref[3 + u, t] * block_k
        live = pairs_ref[3 + unroll + u, t] == 1
        if params.needs_position_mask or padded_q or padded_k:
            full = masklib.block_fully_valid(
                q_start, block_q, k_start, block_k, offset, params,
                seqlen_q=seqlen_q if padded_q else None,
                seqlen_k=seqlen_k if padded_k else None)

            @pl.when(live & full)
            def _fast():
                body(False, k_ref, v_ref, k_start)

            @pl.when(live & jnp.logical_not(full))
            def _masked():
                body(True, k_ref, v_ref, k_start)
        elif unroll > 1:
            @pl.when(live)
            def _live():
                body(False, k_ref, v_ref, k_start)
        else:
            body(False, k_ref, v_ref, k_start)

    # per sub-tile: fast path skips the iota/compare/where pipeline on
    # tiles with no masked element — the live-pair enumeration already
    # removed fully-masked tiles (dead unroll slots carry live == 0)
    if mixed and unroll == 2:
        is_pair = pairs_ref[7, t] == 1

        @pl.when(is_pair)
        def _pair():
            mixed_pair()

        @pl.when(jnp.logical_not(is_pair))
        def _single():
            per_tile(0)
    elif unroll > 1:
        all_live = pairs_ref[3 + unroll, t] == 1
        for u in range(1, unroll):
            all_live &= pairs_ref[3 + unroll + u, t] == 1
        if params.needs_position_mask or padded_q or padded_k:
            all_full = all_live
            for u in range(unroll):
                all_full &= masklib.block_fully_valid(
                    q_start, block_q, pairs_ref[3 + u, t] * block_k, block_k,
                    offset, params,
                    seqlen_q=seqlen_q if padded_q else None,
                    seqlen_k=seqlen_k if padded_k else None)
        else:
            all_full = all_live

        # A masked straight-line variant for diagonal-containing steps was
        # A/B'd too: it added a second multi-tile region whose scratch
        # coexists with this one, pushing (1024,1024) U=2 past scoped VMEM
        # (compile fail) and winning nothing at smaller tiles (92.4 vs 96.7
        # TF/s causal) — rejected; partial tiles take the per-tile path.
        @pl.when(all_full)
        def _pipe():
            pipelined_all()

        @pl.when(jnp.logical_not(all_full))
        def _general():
            for u in range(unroll):
                per_tile(u)
    else:
        for u in range(unroll):
            per_tile(u)

    @pl.when(pairs_ref[2, t] == 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        m_vec = m_scr[:, :1]      # base-2 domain
        l_vec = l_scr[:, :1]
        lse = jnp.where(l_vec == 0.0, -jnp.inf,
                        m_vec * LN2 + jnp.log(l_vec))
        lse_ref[0, 0] = lse.astype(jnp.float32)


def flash_attn_dense_fwd(
    q: jnp.ndarray,  # (B, M, Hq, D)
    k: jnp.ndarray,  # (B, N, Hk, D)
    v: jnp.ndarray,
    softmax_scale: float,
    params: masklib.MaskParams,
    alibi_slopes: Optional[jnp.ndarray] = None,  # (B, Hq) fp32
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # (2,) uint32
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    offset: Optional[int] = None,
    pos_base=None,  # (q0, k0, b0, h0) traced int32 scalars (ring attention)
    num_heads_total: Optional[int] = None,
    kv_unroll: Optional[int] = None,  # live kv tiles per grid step; None =
                                      # auto (2 on 1024x1024 tiles, else 1)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out (B, M, Hq, D), lse (B, Hq, M) fp32).

    `offset` overrides the bottom-right causal/window alignment
    (default seqlen_k - seqlen_q): ring attention passes the global
    q_start - k_start of the (q shard, kv chunk) pair so chunk-local calls
    apply the exact global masks.  `pos_base`/`num_heads_total` shift the
    dropout Philox keying to global coordinates for sharded callers."""
    B, M, Hq, D = q.shape
    N, Hk = k.shape[1], k.shape[2]
    assert Hq % Hk == 0
    group = Hq // Hk
    if interpret is None:
        interpret = use_interpret()
    if offset is None:
        offset = N - M
    if num_heads_total is None:
        num_heads_total = Hq

    bs = block_sizes or BlockSizes.for_shape(M, N, D,
                                             dropout=dropout_p > 0.0)
    bq, bk = bs.block_q, bs.block_k

    # compute layout (B, H, M, D), padded to tile multiples (in-kernel masks
    # make the zero padding inert)
    Mp, Np = round_up(M, bq), round_up(N, bk)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if Mp != M:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Mp - M), (0, 0)))
    if Np != N:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, Np - N), (0, 0)))

    num_q_blocks = Mp // bq
    num_kv_blocks = Np // bk
    if kv_unroll is None:
        # VPU/MXU pipelined unroll (r4 sweep, benchmarks/prof_fwd_pipeline):
        # U=2 on (1024,1024) tiles lifts causal 92.8 -> 97.0 and full
        # 128 -> 140.8 TF/s at the 4k D128 shape — the straight-line
        # two-tile fast path overlaps S(u+1)'s MXU passes with softmax(u)'s
        # VPU pass and keeps (m, l, acc) in registers.  Smaller tiles
        # measured BELOW U=1 (per-step DMA streams halve).  Dropout rides
        # the same paths since r5 (position-keyed Philox is path-invariant).
        kv_unroll = 2 if (bk >= 1024 and num_kv_blocks > 1
                          and (bq >= 1024
                               or (dropout_p > 0.0 and bq >= 512))) else 1
    U = max(1, int(kv_unroll))
    # causal/window-right mixed-region mode: partial tiles ride slot 1 of a
    # straight-line two-tile region (see live_pairs_causal_mixed)
    mixed = (U == 2 and params.needs_position_mask
             and params.window_left < 0 and offset >= 0
             and Mp == M and Np == N)
    if mixed:
        pairs_np = live_pairs_causal_mixed(
            num_q_blocks, num_kv_blocks, bq, bk, offset, params)
    else:
        pairs_np = live_pairs_unrolled(
            num_q_blocks, num_kv_blocks, bq, bk, offset, params, U)
    grid = (B, Hq, pairs_np.shape[1])

    in_specs = []
    inputs = []
    if params.has_alibi:
        assert alibi_slopes is not None and alibi_slopes.shape == (B, Hq)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(alibi_slopes.astype(jnp.float32))
    if dropout_p > 0.0:
        assert dropout_seed is not None
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(build_seed_vec(dropout_seed, pos_base))

    in_specs += [
        pl.BlockSpec((1, 1, bq, D),
                     lambda b, h, t, mp: (b, h, mp[0, t], 0)),
    ]
    inputs += [qt]
    for u in range(U):
        kvmap = (lambda u: lambda b, h, t, mp:
                 (b, h // group, mp[3 + u, t], 0))(u)
        in_specs += [pl.BlockSpec((1, 1, bk, D), kvmap),
                     pl.BlockSpec((1, 1, bk, D), kvmap)]
        inputs += [kt, vt]

    out_shape = (
        jax.ShapeDtypeStruct((B, Hq, Mp, D), q.dtype),
        jax.ShapeDtypeStruct((B, Hq, Mp, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, 1, bq, D),
                     lambda b, h, t, mp: (b, h, mp[0, t], 0)),
        pl.BlockSpec((1, 1, bq, 1),
                     lambda b, h, t, mp: (b, h, mp[0, t], 0)),
    )
    scratch_shapes = [
        pltpu.VMEM((bq, MIN_LANES), jnp.float32),
        pltpu.VMEM((bq, MIN_LANES), jnp.float32),
        pltpu.VMEM((bq, D), jnp.float32),
    ]

    kernel = functools.partial(
        _fwd_kernel,
        params=params, softmax_scale=softmax_scale, dropout_p=dropout_p,
        seqlen_q=M, seqlen_k=N, num_heads=num_heads_total,
        block_q=bq, block_k=bk, offset=offset, unroll=U, mixed=mixed,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    pairs = jnp.asarray(pairs_np)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pairs, *inputs)

    out = jnp.swapaxes(out[:, :, :M], 1, 2)
    lse = lse[:, :, :M, 0]
    return out, lse
