"""Varlen (packed, cu_seqlens) flash attention — Pallas TPU kernels.

TPU re-design of the reference's varlen kernels
(reference: kernel/fused_mha_forward_varlen.cu:25-275,
kernel/fused_mha_backward_varlen.cu:26-540).  The reference resolves ragged
offsets device-side per block via `BlockInfo` reads of cu_seqlens
(include/template.h:55-69); here all ragged bookkeeping is precomputed
host-side into O(T) per-token int32 vectors (segment id, within-sequence
position, per-row causal offset) and the packed tokens are processed as one
long sequence with segment masking — the TPU-idiomatic formulation (static
shapes; block-diagonal work via tile-level segment-overlap skip).

GQA backward: the reference varlen path expands dk/dv to [T_K, H_Q, D] and
reduces on the host (kernel/fused_mha_backward_varlen.cu:764-804); we instead
accumulate over the q-head group in-kernel like the dense path — strictly less
HBM traffic.

seqused_k (clamp effective key length) and leftpad_k (skip leading cache rows)
fold into the precomputed k-token vectors
(reference: kernel/fused_mha_forward_varlen.cu:452-478).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_v100_tpu.config import NEG_INF, EXP_CLAMP, use_interpret
from flash_attn_v100_tpu.ops import philox
from flash_attn_v100_tpu.ops.pallas.block_sizes import (
    BlockSizes, MIN_LANES, cdiv, round_up)
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.ops.pallas.bwd import _recompute_p, _grad_scores

LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


# ======================================================================================
# Host-side ragged info
# ======================================================================================

def build_ragged_info(
    cu_seqlens_q, cu_seqlens_k, total_q: int, total_k: int,
    padded_q: int, padded_k: int,
    seqused_k=None, leftpad_k=None,
    window_left: int = -1, window_right: int = -1,
):
    """Per-token int32 vectors encoding the ragged structure.

    Returns (q_seg, q_pos, q_offs, k_seg, k_pos, k_lo_row, k_hi_row,
    q_lo_row, q_hi_row), each padded to padded_q/padded_k; seg == -1 marks
    padding / unused tokens.  This is the whole of the reference's
    device-side BlockInfo varlen logic (include/template.h:55-92) hoisted
    into vectorized host precompute.

    k_lo_row/k_hi_row: per q row, the inclusive GLOBAL packed-k index range
    it may attend under causal(=window_right)/window_left; q_lo_row/q_hi_row
    the transposed ranges per k row.  Block-reduced, they drive the
    scalar-prefetched index-map clamps that keep the kernels from streaming
    dead tiles (the DMA half of the reference's block trim,
    include/template.h:98-111).  `window_right` here is the EFFECTIVE right
    window (0 under causal).
    """
    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    cu_k = jnp.asarray(cu_seqlens_k, jnp.int32)
    B = cu_q.shape[0] - 1
    BIG = jnp.int32(2 ** 30)

    iq = jnp.arange(padded_q, dtype=jnp.int32)
    q_seg = jnp.searchsorted(cu_q[1:], iq, side="right").astype(jnp.int32)
    q_in = (iq < cu_q[B]) & (q_seg < B)
    q_seg_c = jnp.clip(q_seg, 0, B - 1)
    q_pos = iq - cu_q[q_seg_c]

    slq = cu_q[q_seg_c + 1] - cu_q[q_seg_c]
    slk = cu_k[q_seg_c + 1] - cu_k[q_seg_c]
    lp_q = jnp.zeros_like(slk)
    if seqused_k is not None:
        used = jnp.asarray(seqused_k, jnp.int32)[q_seg_c]
        slk = jnp.where(used > 0, jnp.minimum(slk, used), 0)
    if leftpad_k is not None:
        lp_q = jnp.asarray(leftpad_k, jnp.int32)[q_seg_c]
        slk = slk - lp_q
    q_offs = slk - slq
    q_seg = jnp.where(q_in, q_seg, -1)
    q_pos = jnp.where(q_in, q_pos, 0)

    # per-q-row global packed-k index bounds (inclusive)
    base_k = cu_k[q_seg_c] + lp_q          # global index of within-seq pos 0
    rel_hi = slk - 1
    if window_right >= 0:
        rel_hi = jnp.minimum(rel_hi, q_pos + q_offs + window_right)
    rel_lo = jnp.zeros_like(rel_hi)
    if window_left >= 0:
        rel_lo = jnp.maximum(q_pos + q_offs - window_left, 0)
    # A row with an EMPTY range (rel_hi < rel_lo, e.g. seqused_k == 0) must
    # carry the padding sentinels: a finite k_lo would let fast_bounds mark
    # its block skip_lo while the row stays fully masked (m == -inf), and
    # the upper-compare-only path applies no p-zeroing — exp(-inf - -inf)
    # rows would contaminate l.
    q_live = q_in & (rel_hi >= rel_lo)
    k_lo_row = jnp.where(q_live, base_k + rel_lo, BIG)
    k_hi_row = jnp.where(q_live, base_k + rel_hi, -BIG)

    ik = jnp.arange(padded_k, dtype=jnp.int32)
    k_seg = jnp.searchsorted(cu_k[1:], ik, side="right").astype(jnp.int32)
    k_in = (ik < cu_k[B]) & (k_seg < B)
    k_seg_c = jnp.clip(k_seg, 0, B - 1)
    k_pos_raw = ik - cu_k[k_seg_c]

    k_slk = cu_k[k_seg_c + 1] - cu_k[k_seg_c]
    if seqused_k is not None:
        used_k = jnp.asarray(seqused_k, jnp.int32)[k_seg_c]
        k_slk = jnp.where(used_k > 0, jnp.minimum(k_slk, used_k), 0)
    k_in &= k_pos_raw < k_slk
    lp_k = jnp.zeros_like(k_slk)
    if leftpad_k is not None:
        lp_k = jnp.asarray(leftpad_k, jnp.int32)[k_seg_c]
        k_pos = k_pos_raw - lp_k
        k_in &= k_pos >= 0
    else:
        k_pos = k_pos_raw
    k_seg = jnp.where(k_in, k_seg, -1)
    k_pos = jnp.where(k_in, k_pos, 0)

    # per-k-row global packed-q index bounds (inclusive); within one sequence
    # offs is constant, so the causal/window conditions invert exactly:
    #   causal/wr: rel <= q_pos + wr  =>  q_pos >= k_pos - offs - wr
    #   wl:        rel >= q_pos - wl  =>  q_pos <= k_pos - offs + wl
    k_slq = cu_q[k_seg_c + 1] - cu_q[k_seg_c]
    k_offs = (k_slk - lp_k) - k_slq
    base_q = cu_q[k_seg_c]
    qrel_lo = jnp.zeros_like(k_pos)
    if window_right >= 0:
        qrel_lo = jnp.maximum(k_pos - k_offs - window_right, 0)
    qrel_hi = k_slq - 1
    if window_left >= 0:
        qrel_hi = jnp.minimum(qrel_hi, k_pos - k_offs + window_left)
    # empty-range k rows take the padding sentinels (see k_lo_row above)
    k_live = k_in & (qrel_hi >= qrel_lo)
    q_lo_row = jnp.where(k_live, base_q + qrel_lo, BIG)
    q_hi_row = jnp.where(k_live, base_q + qrel_hi, -BIG)

    return (q_seg, q_pos, q_offs, k_seg, k_pos,
            k_lo_row, k_hi_row, q_lo_row, q_hi_row)


def block_ranges(lo_row, hi_row, num_blocks: int, block: int,
                 other_block: int, num_other_blocks: int):
    """Reduce per-row global index bounds to per-BLOCK [lo, hi] ranges of the
    other axis's block index (inclusive, int32, clipped to the other grid)."""
    lo = jnp.min(lo_row.reshape(num_blocks, block), axis=1)
    hi = jnp.max(hi_row.reshape(num_blocks, block), axis=1)
    lo = jnp.clip(lo // other_block, 0, num_other_blocks - 1)
    hi = jnp.clip(hi // other_block, 0, num_other_blocks - 1)
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def fast_bounds(lo_row, hi_row, num_blocks: int, block: int):
    """(2, num_blocks) int32 [max lo_row, min hi_row] per block: a tile of
    the other axis is FULLY valid for every row of this block iff its index
    range lies within [row 0, row 1] — the fast-path predicate as two SMEM
    scalar compares.  Padding rows carry lo=BIG, so blocks containing them
    can never take the fast path."""
    lo = jnp.max(lo_row.reshape(num_blocks, block), axis=1)
    hi = jnp.min(hi_row.reshape(num_blocks, block), axis=1)
    return jnp.stack([lo, hi]).astype(jnp.int32)


def flatten_live_windows_unrolled(lo, hi, num_blocks: int, unroll: int,
                                  max_steps: int):
    """Unrolled flat live-pair axis: each grid step visits `unroll`
    consecutive kv blocks of one q block (the dense kernel's
    live_pairs_unrolled, built with traced ops since varlen ranges are
    dynamic).  Returns (oof (max_steps+1,) sentinel-padded q-block ids,
    kof (unroll, max_steps) int32 kv-block ids — UNCLAMPED against hi, so
    kernels derive sub-slot liveness as `kof[u, t] <= hi[oof[t]]` — and the
    traced step count).  Ragged tails alias dead slots past hi."""
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    spans = jnp.maximum(hi - lo + 1, 1)
    usteps = -(-spans // unroll)
    cum = jnp.cumsum(usteps)
    total = cum[num_blocks - 1]
    t = jnp.arange(max_steps, dtype=jnp.int32)
    oof = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
    oof = jnp.clip(oof, 0, num_blocks - 1)
    within = t - (cum[oof] - usteps[oof])
    base = jnp.clip(lo[oof] + within * unroll, 0, None)
    kof = jnp.stack([base + u for u in range(unroll)])
    oof_ext = jnp.concatenate([oof, jnp.full((1,), -1, jnp.int32)])
    return oof_ext, kof, total


def flatten_live_windows_grouped(lo, hi, num_blocks: int, group: int,
                                 max_steps: int):
    """Grouped flat live-pair axis for the dKV pass: for each kv block, the
    inner work is (GQA group g, live q block) — `group` consecutive copies
    of the block's live q span, g-major, so dK/dV accumulate across the
    whole per-kv-block segment (the in-kernel GQA reduction).

    Returns (oof (max_steps+1,) sentinel-padded kv-block ids, iof q-block
    ids, gof group ids, total traced steps)."""
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    spans = jnp.maximum(hi - lo + 1, 1)
    gspans = group * spans
    cum = jnp.cumsum(gspans)
    total = cum[num_blocks - 1]
    t = jnp.arange(max_steps, dtype=jnp.int32)
    oof = jnp.searchsorted(cum, t, side="right").astype(jnp.int32)
    oof = jnp.clip(oof, 0, num_blocks - 1)
    within = t - (cum[oof] - gspans[oof])
    gof = within // spans[oof]
    iof = jnp.clip(lo[oof] + within % spans[oof], 0, None)
    oof_ext = jnp.concatenate([oof, jnp.full((1,), -1, jnp.int32)])
    return oof_ext, iof, jnp.clip(gof, 0, group - 1), total


def block_aggregates(seg, pos_plus, num_blocks: int, block: int):
    """Per-block [seg_min, seg_max, val_min, val_max] int32 aggregates of the
    per-token segment ids and a position-derived value (q_pos + offs for q
    blocks, k_pos for k blocks), stacked as a (4, num_blocks) prefetch array.
    Rows with seg == -1 (padding) are excluded from the val aggregates.

    The kernels use these for the per-tile FAST PATH: a (q tile, k tile)
    pair whose rows/cols all lie in ONE common sequence and whose positions
    satisfy the causal/window bounds tile-wide skips the whole ragged
    mask/where pipeline — the varlen analog of the dense kernels'
    block_fully_valid fast path."""
    BIG = jnp.int32(2 ** 30)
    seg2 = seg.reshape(num_blocks, block)
    val2 = pos_plus.reshape(num_blocks, block)
    valid = seg2 >= 0
    # seg_min over RAW values: a padding row/col (seg == -1) must break the
    # seg_min == seg_max uniformity so such tiles take the masked path —
    # the fast path applies no bounds mask at all
    seg_min = jnp.min(seg2, axis=1)
    seg_max = jnp.max(seg2, axis=1)
    val_min = jnp.min(jnp.where(valid, val2, BIG), axis=1)
    val_max = jnp.max(jnp.where(valid, val2, -BIG), axis=1)
    # row 4: the per-SEQUENCE constant t = pos_plus - packed_index (for q:
    # offs - cu_q[seg]; for k: -(cu_k[seg] + leftpad)).  For a
    # uniform-sequence tile this collapses the causal/window masks to a
    # scalar threshold against the STATIC local iota diff — the SEMI-FAST
    # path of partially-valid single-sequence (diagonal) tiles.
    idx = jnp.arange(num_blocks * block, dtype=jnp.int32).reshape(
        num_blocks, block)
    t2 = val2 - idx
    t_val = jnp.max(jnp.where(valid, t2, -BIG), axis=1)
    # row 5: seg_min EXCLUDING padding — with row 1 (seg_max, which padding
    # can never raise) this gives the tile-overlap predicate `run` as pure
    # SMEM scalar compares, replacing a per-step VPU reduction over the
    # (bq,1)/(1,bk) seg vectors (~0.3 us/step, benchmarks/prof_small_streams)
    seg_min_v = jnp.min(jnp.where(valid, seg2, BIG), axis=1)
    return jnp.stack([seg_min, seg_max, val_min, val_max,
                      t_val, seg_min_v]).astype(jnp.int32)


def _tile_overlaps(qagg_ref, kagg_ref, qi, ki):
    """Tile-pair segment-overlap predicate (`run`) from the prefetched block
    aggregates — pure SMEM scalar compares.  Replaces the per-step VPU
    min/max reduction over the (b,1)/(1,b) seg vectors
    (masklib.ragged_block_overlaps), which measured ~0.3 us/step
    (benchmarks/prof_small_streams.py).  Rows 5/1 are seg_min excluding
    padding / raw seg_max (padding == -1 never raises the max; an
    all-padding tile has max == -1 and fails the >= 0 gates)."""
    q_max, k_max = qagg_ref[1, qi], kagg_ref[1, ki]
    return ((kagg_ref[5, ki] <= q_max) & (qagg_ref[5, qi] <= k_max)
            & (q_max >= 0) & (k_max >= 0))


def _slope_tokens(alibi_slopes, q_seg, Hq):
    """(B, Hq) slopes -> per-q-token (Hq, Tqp) fp32 (segment-gathered)."""
    seg_c = jnp.clip(q_seg, 0, alibi_slopes.shape[0] - 1)
    return alibi_slopes[seg_c, :].T.astype(jnp.float32)  # (Hq, Tqp)


# ======================================================================================
# Forward kernel
# ======================================================================================

def _varlen_fwd_kernel(
    qof_ref,      # scalar-prefetch: (max_steps+1,) q block of flat step
    kof_ref,      # scalar-prefetch: (unroll, max_steps) kv block sub-slots
                  #   (UNCLAMPED: slot u live iff kof[u, t] <= hi[qof[t]])
    hi_ref,       # scalar-prefetch: (num_q_blocks,) last live kv block
    fb_ref,       # scalar-prefetch: (2, num_q_blocks) fast bounds
                  #   [max k_lo_row, min k_hi_row] per q block
    qagg_ref,     # scalar-prefetch: (6, num_q_blocks) block aggregates
    kagg_ref,     # scalar-prefetch: (6, num_kv_blocks)
    *refs,
    params: masklib.MaskParams,
    softmax_scale: float,
    dropout_p: float,
    num_heads: int,
    block_q: int,
    block_k: int,
    num_kv_blocks_total: int,
    paged: bool = False,
    kv_quant: Optional[str] = None,   # None | "int8" | "int4" (paged only)
    unroll: int = 1,
    aggregate: bool = False,  # fuse the U sub-tiles into ONE wide MXU call
):
    has_alibi = params.has_alibi
    has_dropout = dropout_p > 0.0
    has_posvec = has_alibi or has_dropout
    idx = 0
    slope_ref = seed_ref = None
    if has_alibi:
        slope_ref = refs[idx]; idx += 1
    if has_dropout:
        seed_ref = refs[idx]; idx += 1
    qseg_ref = qpos_ref = qoff_ref = None
    kpos_refs = [None] * unroll
    if has_posvec:
        # positional vectors ride along ONLY for alibi's distance bias and
        # dropout's position-keyed Philox — masking never touches them
        qseg_ref, qpos_ref, qoff_ref = refs[idx:idx + 3]
        idx += 3
        kpos_refs = list(refs[idx:idx + unroll])
        idx += unroll
    scale_refs = [None] * (2 * unroll)
    if kv_quant is not None:
        # per-token fp32 dequant scales, lane-major (1, 1, 1, bk) page views
        scale_refs = list(refs[idx:idx + 2 * unroll])
        idx += 2 * unroll
    q_ref = refs[idx]
    kv_refs = refs[idx + 1: idx + 1 + 2 * unroll]
    (klo_ref, khi_ref,
     o_ref, lse_ref, m_scr, l_scr, acc_scr) = refs[idx + 1 + 2 * unroll:]

    h, t = pl.program_id(0), pl.program_id(1)
    # FLAT live-pair axis (flatten_live_windows[_unrolled]): step t visits
    # q block qof[t] and kv sub-slots kof[:, t]; total steps = SUM of
    # ceil(span/unroll) — a traced dynamic grid dim, zero dead steps for
    # mixed-length batches.
    qi = qof_ref[t]
    kis = [kof_ref[u, t] for u in range(unroll)]
    kis_c = [jnp.minimum(ki, num_kv_blocks_total - 1) for ki in kis]

    first = (t == 0) | (qof_ref[jnp.maximum(t - 1, 0)] != qi)

    @pl.when(first)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # per sub-slot scalar classification (SMEM compares):
    #   run: slot is live (<= hi; > hi happens on the placeholder step of an
    #     empty q block and on ragged unroll tails) AND its segments overlap
    #     (trims interior page-slot gaps of multi-sequence tiles);
    #   skip_lo: every row's range STARTS at/before this tile -> the lower
    #     compare is statically true tile-wide (the causal-diagonal common
    #     case) AND no row is still fully masked (its m would be -inf), so
    #     the p-zero pass is skippable too;
    #   fast: additionally every row's range COVERS the tile -> no mask.
    runs, skip_los, fasts = [], [], []
    for u in range(unroll):
        ki, ki_c = kis[u], kis_c[u]
        runs.append((ki <= hi_ref[qi])
                    & _tile_overlaps(qagg_ref, kagg_ref, qi, ki_c))
        skip_lo_u = fb_ref[0, qi] <= ki * block_k
        skip_los.append(skip_lo_u)
        fasts.append(skip_lo_u
                     & (fb_ref[1, qi] >= ki * block_k + block_k - 1))

    # softmax in the exp2 domain unless softcap's tanh needs natural scale
    # (same trick as fwd.py; lse converts at the store)
    use_exp2 = params.softcap == 0.0
    c = LOG2E if use_exp2 else 1.0
    expf = jnp.exp2 if use_exp2 else jnp.exp

    def body(masked, k_ref, v_ref, ki, ki_c, kpos_ref, ks_ref, vs_ref):
        # masked: 0 = none, 1 = upper compare only, 2 = full
        q = q_ref[0]
        # paged: the K/V tile is a pool PAGE fetched through the
        # scalar-prefetched block table (4D block (1, 1, ps, D)) — the
        # in-kernel page resolution of the reference's varlen paged loop
        # (kernel/fused_mha_forward_varlen.cu:184-199)
        k = k_ref[0, 0] if paged else k_ref[0]
        q_scale = None
        if kv_quant is not None:
            # int8xint8 MXU path (the decode kernel's scheme,
            # decode.py:_decode_tile_update): quantize the q tile per row
            # in-register, stream K as stored bytes, fold the dequant
            # scales onto the small (bq, bk) score tile
            ks = ks_ref[0, 0, 0][None, :].astype(jnp.float32)   # (1, bk)
            q32 = q.astype(jnp.float32)
            q_amax = jnp.max(jnp.abs(q32), axis=1, keepdims=True)
            q_scale = jnp.where(q_amax == 0.0, 1.0, q_amax / 127.0)
            q8 = jnp.round(q32 / q_scale).astype(jnp.int8)
            if kv_quant == "int4":
                # token-packed nibbles (quant.py layout): `k & 15` = biased
                # even-token half page, `k & -16` = 16x odd half; score
                # columns land in [evens | odds] split order — the mask
                # column map and the (pre-permuted) scale/kpos vectors
                # account for it below
                st_e = jax.lax.dot_general(
                    q8, k & jnp.int8(15), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                st_o = jax.lax.dot_general(
                    q8, k & jnp.int8(-16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                sum_q8 = jnp.sum(q8.astype(jnp.float32), axis=1,
                                 keepdims=True)
                s = jnp.concatenate(
                    [st_e - 8.0 * sum_q8, st_o * (1.0 / 16.0)], axis=1)
            else:
                s = jax.lax.dot_general(
                    q8, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            s = s * q_scale * ks
        else:
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s * (softmax_scale * c)

        valid = None
        if has_alibi:
            # distance bias needs real positions (fast tiles too); the mask
            # still comes from the per-row ranges below
            rel = kpos_ref[...] - qoff_ref[...]
            s = s - (slope_ref[0] * c) * jnp.abs(
                qpos_ref[...] - rel).astype(jnp.float32)
        if params.softcap > 0.0:
            s = params.softcap * jnp.tanh(s * (1.0 / params.softcap))
        if masked:
            # EVERY mask this kernel supports (bounds, causal, window,
            # seqused, leftpad, segment) makes each q row's valid k set one
            # CONTIGUOUS global range [k_lo_row, k_hi_row] — precomputed
            # host-side (build_ragged_info), so the whole ragged pipeline
            # is at most two compares against the static column iota.  This
            # is the reference's BlockInfo bounds walk
            # (include/template.h:55-111) reduced to its closed form.
            gcol = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            if kv_quant == "int4":
                # split score order: column c is token 2c (first half) or
                # 2c - block_k + 1 (second half) of the page.  Online
                # softmax is column-order-invariant, so only this map (and
                # the pre-permuted scale/kpos vectors) changes.
                bk2 = block_k // 2
                gcol = jnp.where(gcol < bk2, 2 * gcol,
                                 2 * gcol - block_k + 1)
            gcol = gcol + ki * block_k
            valid = gcol <= khi_ref[...]
            if masked == 2:
                valid &= gcol >= klo_ref[...]
            s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = expf(m_prev - m_next)
        p = expf(s - m_next[:, :1])
        if masked == 2:
            # a row whose live range starts in a LATER tile has m == -inf
            # here; exp(-inf - -inf) = 1 must be zeroed.  masked == 1 tiles
            # can't contain such rows (every row already started), so their
            # masked entries underflow to exact 0 against the finite m.
            p = jnp.where(valid, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        if has_dropout:
            # (block_q, 1) seg, broadcasts over cols
            bh = qseg_ref[...] * num_heads + h
            keep = philox.dropout_keep_mask(qpos_ref[...], kpos_ref[...], bh,
                                            seed_ref[0], seed_ref[1], dropout_p)
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)

        v = v_ref[0, 0] if paged else v_ref[0]
        if kv_quant is not None:
            # int8xint8 PV: fold V's per-token scales into P's columns, then
            # quantize P per row — the streamed V tile is never converted
            p = p * vs_ref[0, 0, 0][None, :].astype(jnp.float32)
            p_amax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
            p_scale = jnp.where(p_amax == 0.0, 1.0, p_amax / 127.0)
            p8 = jnp.round(p / p_scale).astype(jnp.int8)
            if kv_quant == "int4":
                bk2 = block_k // 2
                p8_e, p8_o = p8[:, :bk2], p8[:, bk2:]
                pv_e = jax.lax.dot_general(
                    p8_e, v & jnp.int8(15), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                pv_o = jax.lax.dot_general(
                    p8_o, v & jnp.int8(-16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                pv = (pv_e - 8.0 * jnp.sum(p8_e.astype(jnp.float32), axis=1,
                                           keepdims=True)
                      + pv_o * (1.0 / 16.0))
            else:
                pv = jax.lax.dot_general(
                    p8, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            pv = pv * p_scale
        else:
            pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    def pipelined_all():
        # VPU/MXU software pipelining (the dense kernel's r4 fast path,
        # fwd.py:pipelined_all): all U score matmuls issue as one
        # straight-line region before the softmax chain, and (m, l, acc)
        # stay in REGISTERS across the U sub-tiles — one scratch
        # read/write per grid step instead of per tile.  Runs only when
        # every sub-tile is live AND fast (no masks), so fully-masked-row
        # p-zeroing can't be needed.
        q = q_ref[0]
        ss = []
        for u in range(unroll):
            kk = kv_refs[2 * u][0, 0] if paged else kv_refs[2 * u][0]
            s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * (softmax_scale * c)
            if has_alibi:
                rel = kpos_refs[u][...] - qoff_ref[...]
                s = s - (slope_ref[0] * c) * jnp.abs(
                    qpos_ref[...] - rel).astype(jnp.float32)
            if params.softcap > 0.0:
                s = params.softcap * jnp.tanh(s * (1.0 / params.softcap))
            ss.append(s)
        m_c = m_scr[...]
        l_c = l_scr[...]
        acc_c = acc_scr[...]
        for u in range(unroll):
            s = ss[u]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_c, m_cur)
            alpha = expf(m_c - m_next)
            p = expf(s - m_next[:, :1])
            l_c = alpha * l_c + jnp.sum(p, axis=1, keepdims=True)
            m_c = m_next
            if has_dropout:
                # position-keyed Philox is path-invariant (r5); l sums
                # pre-dropout p, same order as the per-tile body
                bh = qseg_ref[...] * num_heads + h
                keep = philox.dropout_keep_mask(
                    qpos_ref[...], kpos_refs[u][...], bh,
                    seed_ref[0], seed_ref[1], dropout_p)
                p = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
            v = kv_refs[2 * u + 1][0, 0] if paged else kv_refs[2 * u + 1][0]
            pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_c = acc_c * alpha[:, :1] + pv
        m_scr[...] = m_c
        l_scr[...] = l_c
        acc_scr[...] = acc_c

    def per_tile(u):
        run, skip_lo, fast = runs[u], skip_los[u], fasts[u]
        args = (kv_refs[2 * u], kv_refs[2 * u + 1], kis[u], kis_c[u],
                kpos_refs[u], scale_refs[2 * u], scale_refs[2 * u + 1])

        @pl.when(run & fast)
        def _fast():
            body(0, *args)

        @pl.when(run & skip_lo & jnp.logical_not(fast))
        def _upper():
            body(1, *args)

        @pl.when(run & jnp.logical_not(skip_lo))
        def _general():
            body(2, *args)

    def body_wide(masked):
        # ONE full-width MXU call per grid step (VERDICT r4 #1): the U page
        # tiles concatenate on the token axis into a single (U*bk, D)
        # operand, so the step runs ONE wide score matmul, ONE online
        # softmax update (one scratch round-trip, one acc rescale) and ONE
        # PV matmul — instead of U narrow matmuls each dragging a full VPU
        # chain and a (bq, D) fp32 acc rescale.  The concat is a VMEM
        # sublane copy of U*bk*D*2 bytes — ~100x less traffic than the
        # per-sub-tile acc round-trips it replaces.  Reference analog: full
        # tile-width per-block page resolution
        # (kernel/fused_mha_forward_varlen.cu:184-199).
        #
        # Dead sub-slots (kof > hi: ragged unroll tails, placeholder steps)
        # alias a live page's payload but keep their UNCLAMPED gcol, so the
        # masked paths (1/2) range-compare them away; the fast path (0)
        # requires every slot live.  Page gaps of multi-sequence q tiles
        # need no run-trim either: a foreign page's virtual columns lie
        # outside every row's [k_lo, k_hi] range.
        q = q_ref[0]
        if paged:
            k_all = jnp.concatenate(
                [kv_refs[2 * u][0, 0] for u in range(unroll)], axis=0)
            v_all = jnp.concatenate(
                [kv_refs[2 * u + 1][0, 0] for u in range(unroll)], axis=0)
        else:
            k_all = jnp.concatenate(
                [kv_refs[2 * u][0] for u in range(unroll)], axis=0)
            v_all = jnp.concatenate(
                [kv_refs[2 * u + 1][0] for u in range(unroll)], axis=0)
        W = unroll * block_k
        bk2 = block_k // 2

        # all concats stay 2-D (Mosaic's tpu.concatenate rejects 1-D vectors
        # spanning multiple native tiles); int4's half-page pieces require
        # bk2 % 128 == 0 — the wrapper gates aggregation on it
        def cat_scales(refs_u):
            vecs = [r[0, 0] for r in refs_u]           # (1, bk) each
            if kv_quant == "int4":
                # per-page [evens | odds] -> wide [all evens | all odds]
                vecs = ([v[:, :bk2] for v in vecs]
                        + [v[:, bk2:] for v in vecs])
            return jnp.concatenate(vecs, axis=1)       # (1, W)

        def cat_kpos():
            vecs = [kpos_refs[u][...] for u in range(unroll)]  # (1, bk)
            if kv_quant == "int4":
                vecs = ([v[:, :bk2] for v in vecs]
                        + [v[:, bk2:] for v in vecs])
            return jnp.concatenate(vecs, axis=1)

        # wide global-column vector (UNCLAMPED slot bases; see above)
        if kv_quant == "int4":
            half = jax.lax.broadcasted_iota(jnp.int32, (1, bk2), 1)
            gcol = jnp.concatenate(
                [kis[u] * block_k + 2 * half for u in range(unroll)]
                + [kis[u] * block_k + 2 * half + 1 for u in range(unroll)],
                axis=1)
        else:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
            gcol = jnp.concatenate(
                [kis[u] * block_k + lane for u in range(unroll)], axis=1)

        if kv_quant == "fp8":
            # fp8-e4m3 pool: bitcast-dequant the WIDE tile once (the
            # aggregation amortizes the integer lane ops over a full-width
            # MXU call), fold the per-token scales onto the scores —
            # closes the fp8 in-kernel paged-prefill exclusion (VERDICT
            # r4 missing #3)
            from flash_attn_v100_tpu.ops.pallas.decode import (
                _fp8_bitcast_dequant)
            ks_all = cat_scales([scale_refs[2 * u] for u in range(unroll)])
            s = jax.lax.dot_general(
                q, _fp8_bitcast_dequant(k_all), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * ks_all.astype(jnp.float32)
        elif kv_quant is not None:
            ks_all = cat_scales([scale_refs[2 * u] for u in range(unroll)])
            q32 = q.astype(jnp.float32)
            q_amax = jnp.max(jnp.abs(q32), axis=1, keepdims=True)
            q_scale = jnp.where(q_amax == 0.0, 1.0, q_amax / 127.0)
            q8 = jnp.round(q32 / q_scale).astype(jnp.int8)
            if kv_quant == "int4":
                st_e = jax.lax.dot_general(
                    q8, k_all & jnp.int8(15), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                st_o = jax.lax.dot_general(
                    q8, k_all & jnp.int8(-16), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                sum_q8 = jnp.sum(q8.astype(jnp.float32), axis=1,
                                 keepdims=True)
                s = jnp.concatenate(
                    [st_e - 8.0 * sum_q8, st_o * (1.0 / 16.0)], axis=1)
            else:
                s = jax.lax.dot_general(
                    q8, k_all, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            s = s * q_scale * ks_all.astype(jnp.float32)
        else:
            s = jax.lax.dot_general(q, k_all, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s * (softmax_scale * c)

        if has_alibi:
            rel = cat_kpos() - qoff_ref[...]
            s = s - (slope_ref[0] * c) * jnp.abs(
                qpos_ref[...] - rel).astype(jnp.float32)
        if params.softcap > 0.0:
            s = params.softcap * jnp.tanh(s * (1.0 / params.softcap))
        valid = None
        if masked:
            valid = gcol <= khi_ref[...]
            if masked == 2:
                valid &= gcol >= klo_ref[...]
            s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = expf(m_prev - m_next)
        p = expf(s - m_next[:, :1])
        if masked == 2:
            p = jnp.where(valid, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = l_next

        if kv_quant == "fp8":
            from flash_attn_v100_tpu.ops.pallas.decode import (
                _fp8_bitcast_dequant)
            vs_all = cat_scales([scale_refs[2 * u + 1]
                                 for u in range(unroll)])
            p = p * vs_all.astype(jnp.float32)
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), _fp8_bitcast_dequant(v_all),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif kv_quant is not None:
            vs_all = cat_scales([scale_refs[2 * u + 1]
                                 for u in range(unroll)])
            p = p * vs_all.astype(jnp.float32)
            p_amax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
            p_scale = jnp.where(p_amax == 0.0, 1.0, p_amax / 127.0)
            p8 = jnp.round(p / p_scale).astype(jnp.int8)
            if kv_quant == "int4":
                W2 = W // 2
                p8_e, p8_o = p8[:, :W2], p8[:, W2:]
                pv_e = jax.lax.dot_general(
                    p8_e, v_all & jnp.int8(15), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                pv_o = jax.lax.dot_general(
                    p8_o, v_all & jnp.int8(-16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                pv = (pv_e - 8.0 * jnp.sum(p8_e.astype(jnp.float32), axis=1,
                                           keepdims=True)
                      + pv_o * (1.0 / 16.0))
            else:
                pv = jax.lax.dot_general(
                    p8, v_all, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
            pv = pv * p_scale
        else:
            pv = jax.lax.dot_general(p.astype(v_all.dtype), v_all,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    if aggregate and not has_dropout:
        all_fast = runs[0] & fasts[0]
        all_upper = skip_los[0]
        for u in range(1, unroll):
            all_fast &= runs[u] & fasts[u]
            all_upper &= skip_los[u]

        @pl.when(all_fast)
        def _wide_fast():
            body_wide(0)

        @pl.when(jnp.logical_not(all_fast) & all_upper)
        def _wide_upper():
            body_wide(1)

        @pl.when(jnp.logical_not(all_fast) & jnp.logical_not(all_upper))
        def _wide_general():
            body_wide(2)
    elif unroll > 1 and kv_quant is None:
        all_fast = runs[0] & fasts[0]
        for u in range(1, unroll):
            all_fast &= runs[u] & fasts[u]

        @pl.when(all_fast)
        def _pipe():
            pipelined_all()

        @pl.when(jnp.logical_not(all_fast))
        def _gen():
            for u in range(unroll):
                per_tile(u)
    else:
        for u in range(unroll):
            per_tile(u)

    last = (t == pl.num_programs(1) - 1) | (qof_ref[t + 1] != qi)

    @pl.when(last)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        m_nat = m_scr[:, :1] * (LN2 if use_exp2 else 1.0)
        lse = jnp.where(l == 0.0, -jnp.inf, m_nat + jnp.log(l_scr[:, :1]))
        lse_ref[0] = lse.astype(jnp.float32)


def flash_attn_varlen_fwd(
    q: jnp.ndarray,  # (Tq, Hq, D) packed
    k: jnp.ndarray,  # (Tk, Hk, D) packed
    v: jnp.ndarray,
    cu_seqlens_q, cu_seqlens_k,
    max_seqlen_q: int, max_seqlen_k: int,
    softmax_scale: float,
    params: masklib.MaskParams,
    alibi_slopes: Optional[jnp.ndarray] = None,  # (B, Hq)
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    seqused_k=None,
    leftpad_k=None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    equal_lens: bool = False,   # obsolete (dynamic live windows); accepted
                                # for call-site compatibility, ignored
    self_kv: bool = False,      # q and k share one cu_seqlens (offs == 0
                                # statically); enables skip_p_zero below
    kv_unroll: Optional[int] = None,  # sub-tiles per grid step; None = auto
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out (Tq, Hq, D), lse (Hq, Tq) fp32 — the reference's varlen
    LSE layout (kernel/fused_mha_forward_varlen.cu:519))."""
    Tq, Hq, D = q.shape
    Tk, Hk = k.shape[0], k.shape[1]
    group = Hq // Hk
    if interpret is None:
        interpret = use_interpret()

    bs = block_sizes or BlockSizes.for_shape(max_seqlen_q, max_seqlen_k, D,
                                             dropout=dropout_p > 0.0)
    # varlen blocks ride the LANE axis of the (1, b) segment/position
    # vectors: Mosaic requires lane-dim block sizes divisible by 128
    bq, bk = round_up(bs.block_q, 128), round_up(bs.block_k, 128)
    Tqp, Tkp = round_up(Tq, bq), round_up(Tk, bk)

    qt = jnp.swapaxes(jnp.pad(q, ((0, Tqp - Tq), (0, 0), (0, 0))), 0, 1)
    kt = jnp.swapaxes(jnp.pad(k, ((0, Tkp - Tk), (0, 0), (0, 0))), 0, 1)
    vt = jnp.swapaxes(jnp.pad(v, ((0, Tkp - Tk), (0, 0), (0, 0))), 0, 1)

    (q_seg, q_pos, q_offs, k_seg, k_pos,
     k_lo_row, k_hi_row, _, _) = build_ragged_info(
        cu_seqlens_q, cu_seqlens_k, Tq, Tk, Tqp, Tkp,
        seqused_k=seqused_k, leftpad_k=leftpad_k,
        window_left=params.window_left,
        window_right=params.effective_window_right())

    num_q_blocks, num_kv_blocks = Tqp // bq, Tkp // bk
    kv_lo, kv_hi = block_ranges(k_lo_row, k_hi_row, num_q_blocks, bq, bk,
                                num_kv_blocks)
    fb = fast_bounds(k_lo_row, k_hi_row, num_q_blocks, bq)
    q_agg = block_aggregates(q_seg, q_pos + q_offs, num_q_blocks, bq)
    k_agg = block_aggregates(k_seg, k_pos, num_kv_blocks, bk)

    # FLAT live-pair grid: one packed axis of (q block, live kv block)
    # pairs — total steps = sum of live spans (a traced dynamic grid dim),
    # so mixed-length batches pay ZERO dead steps for the long tail (the
    # per-q-block max-window grid padded every q block to the longest
    # window).  kv_unroll > 1 packs U consecutive kv blocks per step for
    # the pipelined fast path (see _varlen_fwd_kernel.pipelined_all).
    if kv_unroll is None:
        # same auto rule as the dense fwd (r4 pipeline sweep): big tiles
        # amortize; smaller tiles measured below U=1
        kv_unroll = 2 if (bk >= 1024 and num_kv_blocks > 1
                          and (bq >= 1024
                               or (dropout_p > 0.0 and bq >= 512))) else 1
    U = max(1, int(kv_unroll))
    max_steps = num_q_blocks * num_kv_blocks
    qof, kof, total = flatten_live_windows_unrolled(
        kv_lo, kv_hi, num_q_blocks, U, max_steps)
    grid = (Hq, total)

    qb = lambda qof_, t: qof_[t]

    def kb(kof_, t, u):
        return jnp.minimum(kof_[u, t], num_kv_blocks - 1)

    has_posvec = params.has_alibi or dropout_p > 0.0
    in_specs, inputs = [], []
    if params.has_alibi:
        slope_tok = _slope_tokens(alibi_slopes, q_seg, Hq)  # (Hq, Tqp)
        in_specs.append(pl.BlockSpec(
            (1, bq, 1), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)))
        inputs.append(slope_tok[:, :, None])
    if dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(dropout_seed.astype(jnp.uint32))

    qcol = lambda h, t, qof_, *_: (qb(qof_, t), 0)
    if has_posvec:
        # positional vectors only feed alibi's bias / dropout's Philox;
        # masking runs off the per-row [k_lo, k_hi] ranges below
        in_specs += [pl.BlockSpec((bq, 1), qcol)] * 3
        inputs += [q_seg[:, None], q_pos[:, None], q_offs[:, None]]
        for u in range(U):
            krow_u = (lambda u: lambda h, t, qof_, kof_, *_:
                      (0, kb(kof_, t, u)))(u)
            in_specs += [pl.BlockSpec((1, bk), krow_u)]
            inputs += [k_pos[None, :]]
    in_specs += [
        pl.BlockSpec((1, bq, D), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)),
    ]
    inputs += [qt]
    for u in range(U):
        kvmap_u = (lambda u: lambda h, t, qof_, kof_, *_:
                   (h // group, kb(kof_, t, u), 0))(u)
        in_specs += [pl.BlockSpec((1, bk, D), kvmap_u),
                     pl.BlockSpec((1, bk, D), kvmap_u)]
        inputs += [kt, vt]
    in_specs += [
        pl.BlockSpec((bq, 1), qcol),
        pl.BlockSpec((bq, 1), qcol),
    ]
    inputs += [k_lo_row[:, None], k_hi_row[:, None]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)),
            pl.BlockSpec((1, bq, 1), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, MIN_LANES), jnp.float32),
            pltpu.VMEM((bq, MIN_LANES), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    del self_kv  # p-zeroing is unconditional on masked tiles now
    out, lse = pl.pallas_call(
        functools.partial(
            _varlen_fwd_kernel, params=params, softmax_scale=softmax_scale,
            dropout_p=dropout_p, num_heads=Hq,
            block_q=bq, block_k=bk, num_kv_blocks_total=num_kv_blocks,
            unroll=U,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Hq, Tqp, D), q.dtype),
            jax.ShapeDtypeStruct((Hq, Tqp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qof, kof, kv_hi, fb, q_agg, k_agg, *inputs)

    out = jnp.swapaxes(out[:, :Tq], 0, 1)
    lse = lse[:, :Tq, 0]
    return out, lse


def _varlen_fwd_kernel_paged(qof_ref, kof_ref, tbl_ref, hi_ref, fb_ref,
                             qagg_ref, kagg_ref, *refs, **kw):
    """Paged entry: the block table rides as the 3rd scalar-prefetch arg
    (consumed only by the K/V index maps); the body is the shared kernel."""
    return _varlen_fwd_kernel(qof_ref, kof_ref, hi_ref, fb_ref, qagg_ref,
                              kagg_ref, *refs, **kw)


def flash_attn_varlen_fwd_paged(
    q: jnp.ndarray,        # (Tq, Hq, D) packed
    k_pool: jnp.ndarray,   # (Hk, P, ps, D) HND page pool
    v_pool: jnp.ndarray,
    block_table,           # (B, >=pages_per_seq) int32
    cu_seqlens_q,
    seqlens_k,             # (B,) int32 true KV tokens per sequence
    max_seqlen_q: int, max_seqlen_k: int,
    softmax_scale: float,
    params: masklib.MaskParams,
    alibi_slopes: Optional[jnp.ndarray] = None,
    seqused_k=None,
    leftpad_k=None,
    k_scales: Optional[jnp.ndarray] = None,  # (Hk, P, ps, 1) fp32
    v_scales: Optional[jnp.ndarray] = None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    kv_unroll: Optional[int] = None,  # pages per grid step; None = auto
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Paged-KV varlen forward with IN-KERNEL page resolution — no
    contiguous KV materialization (the reference resolves pages per KV tile
    the same way, kernel/fused_mha_forward_varlen.cu:184-199).

    The kv axis runs in VIRTUAL page-slot coordinates: sequence b occupies
    tokens [b*mp*ps, b*mp*ps + len_b) where mp = ceil(max_seqlen_k/ps) block
    table slots back each sequence — so every kv block is one pool page,
    uniform in sequence (the fast/semi paths always apply), and the K/V
    BlockSpec index map gathers the page id from the scalar-prefetched
    block table.  Requires page_size % 128 == 0 (the kernel's lane rule for
    the (1, bk) segment vectors — the TPU mirror of the reference's
    page %256 constraint, fused_mha_forward_varlen.cu:439).

    Quantized pools: pass int8 payloads with (Hk, P, ps, 1) fp32 per-token
    `k_scales`/`v_scales` — dequant happens in-tile on the int8 MXU path
    (same scheme as the decode kernel).  Token-packed int4 (quant.py
    layout: payload (Hk, P, ps/2, D) bytes, scales at ps tokens) is
    detected from the shape mismatch; its split score order is handled by
    the kernel's column map plus split-permuted scale/position vectors.
    """
    Tq, Hq, D = q.shape
    Hk, P, rows_pp, _ = k_pool.shape
    group = Hq // Hk
    quantized = k_scales is not None
    int4 = quantized and k_scales.shape[2] == 2 * rows_pp
    ps = 2 * rows_pp if int4 else rows_pp     # TOKEN page size
    fp8 = quantized and k_pool.dtype == jnp.float8_e4m3fn
    kv_quant = (("int4" if int4 else ("fp8" if fp8 else "int8"))
                if quantized else None)
    if quantized and not fp8 and k_pool.dtype != jnp.int8:
        raise ValueError("quantized paged varlen supports int8/int4/fp8 "
                         f"pools (got {k_pool.dtype})")
    if ps % 128:
        raise ValueError(f"in-kernel paged varlen needs page_size % 128 == 0 "
                         f"(got {ps})")
    if interpret is None:
        interpret = use_interpret()

    cu_q = jnp.asarray(cu_seqlens_q, jnp.int32)
    B = cu_q.shape[0] - 1
    mp = cdiv(max_seqlen_k, ps)            # table slots per sequence
    bk = ps
    Tk_virtual = B * mp * ps

    bs = block_sizes or BlockSizes.for_shape(max_seqlen_q, max_seqlen_k, D)
    bq = round_up(bs.block_q, 128)
    Tqp = round_up(Tq, bq)
    qt = jnp.swapaxes(jnp.pad(q, ((0, Tqp - Tq), (0, 0), (0, 0))), 0, 1)

    cu_k_virtual = jnp.arange(B + 1, dtype=jnp.int32) * (mp * ps)
    used = jnp.asarray(seqlens_k, jnp.int32)
    if seqused_k is not None:
        used = jnp.minimum(used, jnp.asarray(seqused_k, jnp.int32))

    (q_seg, q_pos, q_offs, k_seg, k_pos,
     k_lo_row, k_hi_row, _, _) = build_ragged_info(
        cu_q, cu_k_virtual, Tq, Tk_virtual, Tqp, Tk_virtual,
        seqused_k=used, leftpad_k=leftpad_k,
        window_left=params.window_left,
        window_right=params.effective_window_right())

    num_q_blocks, num_kv_blocks = Tqp // bq, B * mp
    kv_lo, kv_hi = block_ranges(k_lo_row, k_hi_row, num_q_blocks, bq, bk,
                                num_kv_blocks)
    fb = fast_bounds(k_lo_row, k_hi_row, num_q_blocks, bq)
    q_agg = block_aggregates(q_seg, q_pos + q_offs, num_q_blocks, bq)
    k_agg = block_aggregates(k_seg, k_pos, num_kv_blocks, bk)

    # U pages aggregate into ONE wide MXU call per grid step (body_wide) —
    # int4 only when its half-page pieces stay lane-tile aligned
    aggregate = not (int4 and (ps // 2) % 128 != 0)
    if kv_unroll is None:
        if aggregate:
            # effective kv tile width U*ps, sized to the dense kernel's
            # swept 1024-wide optimum (r5 A/B: benchmarks/prof_varlen_unroll)
            kv_unroll = max(1, min(1024 // ps, num_kv_blocks)) if ps <= 512 else 1
        else:
            # per-tile fallback: unrolled steps amortize page DMA
            kv_unroll = 4 if ps <= 256 else 1
    U = max(1, int(kv_unroll))
    max_steps = num_q_blocks * num_kv_blocks
    qof, kof, total = flatten_live_windows_unrolled(
        kv_lo, kv_hi, num_q_blocks, U, max_steps)
    grid = (Hq, total)
    tbl = jnp.asarray(block_table, jnp.int32)[:, :mp]

    qb = lambda qof_, t: qof_[t]

    def kb(kof_, t, u):
        return jnp.minimum(kof_[u, t], num_kv_blocks - 1)

    def page_map_u(u):
        def m(h, t, qof_, kof_, tbl_, *_):
            s = kb(kof_, t, u)
            return (h // group, tbl_[s // mp, s % mp], 0, 0)
        return m

    in_specs, inputs = [], []
    qcol = lambda h, t, qof_, *_: (qb(qof_, t), 0)
    def _split_lanes(x):
        # token order -> the int4 kernel's [evens | odds] score order,
        # permuted within each ps-token page on the last axis
        shp = x.shape
        pages = x.reshape(shp[:-1] + (shp[-1] // ps, ps))
        pages = jnp.concatenate([pages[..., 0::2], pages[..., 1::2]],
                                axis=-1)
        return pages.reshape(shp)

    if params.has_alibi:
        slope_tok = _slope_tokens(alibi_slopes, q_seg, Hq)
        in_specs.append(pl.BlockSpec(
            (1, bq, 1), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)))
        inputs.append(slope_tok[:, :, None])
        in_specs += [pl.BlockSpec((bq, 1), qcol)] * 3
        inputs += [q_seg[:, None], q_pos[:, None], q_offs[:, None]]
        kpos_in = _split_lanes(k_pos) if int4 else k_pos
        for u in range(U):
            krow_u = (lambda u: lambda h, t, qof_, kof_, *_:
                      (0, kb(kof_, t, u)))(u)
            in_specs += [pl.BlockSpec((1, bk), krow_u)]
            inputs += [kpos_in[None, :]]
    if quantized:
        # lane-major (Hk, P, 1, ps) per-token scale views; int4 pre-permutes
        # to the kernel's split score order
        ks_view = k_scales.reshape(Hk, P, 1, ps)
        vs_view = v_scales.reshape(Hk, P, 1, ps)
        if int4:
            ks_view = _split_lanes(ks_view)
            vs_view = _split_lanes(vs_view)
        for u in range(U):
            in_specs += [pl.BlockSpec((1, 1, 1, bk), page_map_u(u))] * 2
            inputs += [ks_view, vs_view]
    in_specs += [
        pl.BlockSpec((1, bq, D), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)),
    ]
    inputs += [qt]
    for u in range(U):
        in_specs += [pl.BlockSpec((1, 1, rows_pp, D), page_map_u(u)),
                     pl.BlockSpec((1, 1, rows_pp, D), page_map_u(u))]
        inputs += [k_pool, v_pool]
    in_specs += [
        pl.BlockSpec((bq, 1), qcol),
        pl.BlockSpec((bq, 1), qcol),
    ]
    inputs += [k_lo_row[:, None], k_hi_row[:, None]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)),
            pl.BlockSpec((1, bq, 1), lambda h, t, qof_, *_: (h, qb(qof_, t), 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, MIN_LANES), jnp.float32),
            pltpu.VMEM((bq, MIN_LANES), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _varlen_fwd_kernel_paged, params=params,
            softmax_scale=softmax_scale,
            dropout_p=0.0, num_heads=Hq,
            block_q=bq, block_k=bk, num_kv_blocks_total=num_kv_blocks,
            paged=True, kv_quant=kv_quant, unroll=U, aggregate=aggregate,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Hq, Tqp, D), q.dtype),
            jax.ShapeDtypeStruct((Hq, Tqp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qof, kof, tbl, kv_hi, fb, q_agg, k_agg, *inputs)

    return jnp.swapaxes(out[:, :Tq], 0, 1), lse[:, :Tq, 0]


# ======================================================================================
# Backward kernels
# ======================================================================================

def _varlen_dq_kernel(
    qof_ref, kof_ref,  # scalar-prefetch: flat (unrolled) live-pair maps —
                       #   kof (unroll, T), slot live iff kof[u,t] <= hi
    hi_ref,            # scalar-prefetch: per-q-block last live kv block
    fb_ref,            # scalar-prefetch: (2, n) fast bounds per q block
    qagg_ref, kagg_ref,  # scalar-prefetch: (6, n) block aggregates
    *refs,
    params, softmax_scale, dropout_p, num_heads, block_q, block_k,
    num_kv_blocks_total, unroll=1,
):
    has_alibi = params.has_alibi
    has_dropout = dropout_p > 0.0
    has_posvec = has_alibi or has_dropout
    idx = 0
    slope_ref = seed_ref = None
    if has_alibi:
        slope_ref = refs[idx]; idx += 1
    if has_dropout:
        seed_ref = refs[idx]; idx += 1
    qseg_ref = qpos_ref = qoff_ref = None
    kpos_refs = [None] * unroll
    if has_posvec:
        qseg_ref, qpos_ref, qoff_ref = refs[idx:idx + 3]
        idx += 3
        kpos_refs = list(refs[idx:idx + unroll])
        idx += unroll
    q_ref = refs[idx]
    kv_refs = refs[idx + 1: idx + 1 + 2 * unroll]
    (do_ref, lse_ref, delta_ref,
     klo_ref, khi_ref, dq_ref, dq_acc) = refs[idx + 1 + 2 * unroll:]

    h, t = pl.program_id(0), pl.program_id(1)
    qi = qof_ref[t]           # flat live-pair axis (see fwd kernel)
    kis = [kof_ref[u, t] for u in range(unroll)]
    kis_c = [jnp.minimum(ki, num_kv_blocks_total - 1) for ki in kis]

    first = (t == 0) | (qof_ref[jnp.maximum(t - 1, 0)] != qi)

    @pl.when(first)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    runs, skip_los, fasts = [], [], []
    for u in range(unroll):
        ki, ki_c = kis[u], kis_c[u]
        runs.append((ki <= hi_ref[qi])
                    & _tile_overlaps(qagg_ref, kagg_ref, qi, ki_c))
        skip_lo_u = fb_ref[0, qi] <= ki * block_k
        skip_los.append(skip_lo_u)
        fasts.append(skip_lo_u
                     & (fb_ref[1, qi] >= ki * block_k + block_k - 1))

    def body(masked, k_ref, v_ref, ki, kpos_ref):
        # masked: 0 = none, 1 = upper compare only, 2 = full
        q = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        do = do_ref[0]
        s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * softmax_scale
        valid = None
        if has_alibi:
            rel = kpos_ref[...] - qoff_ref[...]
            s = s - slope_ref[0] * jnp.abs(
                qpos_ref[...] - rel).astype(jnp.float32)
        if params.softcap > 0.0:
            s = params.softcap * jnp.tanh(s * (1.0 / params.softcap))
        if masked:
            # per-row contiguous [k_lo, k_hi] range mask (see fwd kernel)
            gcol = (jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1) + ki * block_k)
            valid = gcol <= khi_ref[...]
            if masked == 2:
                valid &= gcol >= klo_ref[...]
            s = jnp.where(valid, s, NEG_INF)
        lse_rows = lse_ref[0]      # (bq, 1)
        delta_rows = delta_ref[0]
        if valid is not None:
            p = _recompute_p(s, valid, lse_rows)
        else:
            p = jnp.exp(jnp.minimum(s - lse_rows, 0.0))
        dov = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if has_dropout:
            bh = qseg_ref[...] * num_heads + h
            keep = philox.dropout_keep_mask(qpos_ref[...], kpos_ref[...], bh,
                                            seed_ref[0], seed_ref[1], dropout_p)
            p_drop = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
        else:
            p_drop = p
        ds = _grad_scores(p, p_drop, dov, delta_rows, s, softmax_scale, params,
                          valid)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(kk.dtype), kk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def pipelined_all():
        # straight-line multi-tile region (see bwd._dq_kernel.pipelined_all
        # and the fwd kernels): all 2U independent matmuls first, dq
        # accumulator in registers across the U sub-tiles.  Fast tiles
        # only — no masks, no p-zero.
        q = q_ref[0]
        do = do_ref[0]
        lse_rows = lse_ref[0]
        delta_rows = delta_ref[0]
        ss, dovs = [], []
        for u in range(unroll):
            kk = kv_refs[2 * u][0]
            vv = kv_refs[2 * u + 1][0]
            s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            dovs.append(jax.lax.dot_general(
                do, vv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            s = s * softmax_scale
            if has_alibi:
                rel = kpos_refs[u][...] - qoff_ref[...]
                s = s - slope_ref[0] * jnp.abs(
                    qpos_ref[...] - rel).astype(jnp.float32)
            if params.softcap > 0.0:
                s = params.softcap * jnp.tanh(s * (1.0 / params.softcap))
            ss.append(s)
        dq_c = dq_acc[...]
        for u in range(unroll):
            p = jnp.exp(jnp.minimum(ss[u] - lse_rows, 0.0))
            if has_dropout:
                # position-keyed Philox replay, path-invariant (r5)
                bh = qseg_ref[...] * num_heads + h
                keep = philox.dropout_keep_mask(
                    qpos_ref[...], kpos_refs[u][...], bh,
                    seed_ref[0], seed_ref[1], dropout_p)
                p_drop = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
            else:
                p_drop = p
            ds = _grad_scores(p, p_drop, dovs[u], delta_rows, ss[u],
                              softmax_scale, params)
            kk = kv_refs[2 * u][0]
            dq_c = dq_c + jax.lax.dot_general(
                ds.astype(kk.dtype), kk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dq_acc[...] = dq_c

    def per_tile(u):
        run, skip_lo, fast = runs[u], skip_los[u], fasts[u]
        args = (kv_refs[2 * u], kv_refs[2 * u + 1], kis[u], kpos_refs[u])

        @pl.when(run & fast)
        def _fast():
            body(0, *args)

        @pl.when(run & skip_lo & jnp.logical_not(fast))
        def _upper():
            body(1, *args)

        @pl.when(run & jnp.logical_not(skip_lo))
        def _general():
            body(2, *args)

    if unroll > 1:
        all_fast = runs[0] & fasts[0]
        for u in range(1, unroll):
            all_fast &= runs[u] & fasts[u]

        @pl.when(all_fast)
        def _pipe():
            pipelined_all()

        @pl.when(jnp.logical_not(all_fast))
        def _gen():
            for u in range(unroll):
                per_tile(u)
    else:
        for u in range(unroll):
            per_tile(u)

    last = (t == pl.num_programs(1) - 1) | (qof_ref[t + 1] != qi)

    @pl.when(last)
    def _store():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _varlen_dkv_kernel(
    kiof_ref, qiof_ref, gof_ref,  # scalar-prefetch: grouped flat step maps
    hi_ref,              # scalar-prefetch: per-kv-block last live q block
    fb_ref,              # scalar-prefetch: (2, n) fast q bounds per kv block
    qagg_ref, kagg_ref,  # scalar-prefetch: (6, n) block aggregates
    *refs,
    params, softmax_scale, dropout_p, num_heads, group, block_q, block_k,
    num_q_blocks_total,
):
    has_alibi = params.has_alibi
    has_dropout = dropout_p > 0.0
    has_posvec = has_alibi or has_dropout
    idx = 0
    slope_ref = seed_ref = None
    if has_alibi:
        slope_ref = refs[idx]; idx += 1
    if has_dropout:
        seed_ref = refs[idx]; idx += 1
    qseg_ref = qpos_ref = qoff_ref = kpos_ref = None
    if has_posvec:
        qseg_ref, qpos_ref, qoff_ref, kpos_ref = refs[idx:idx + 4]
        idx += 4
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
     qlo_ref, qhi_ref, dk_ref, dv_ref, dk_acc, dv_acc) = refs[idx:]

    hk, t = pl.program_id(0), pl.program_id(1)
    # grouped flat live-pair axis (flatten_live_windows_grouped): kv block
    # kiof[t], GQA group gof[t], q block qiof[t]; dK/dV accumulate across
    # the whole per-kv-block segment (all groups — the in-kernel GQA
    # reduction the reference does with an expanded buffer + host sum,
    # kernel/fused_mha_backward_varlen.cu:764-804)
    ki = kiof_ref[t]
    qi = qiof_ref[t]
    g = gof_ref[t]
    qi_c = jnp.minimum(qi, num_q_blocks_total - 1)
    h = hk * group + g

    first = (t == 0) | (kiof_ref[jnp.maximum(t - 1, 0)] != ki)

    @pl.when(first)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = (qi <= hi_ref[ki]) & _tile_overlaps(qagg_ref, kagg_ref, qi_c, ki)
    # transposed geometry: causal puts the range START (q_lo) on the
    # diagonal, so the statically-true compare to drop is the UPPER one
    # (q_hi = sequence end covers the tile)
    skip_hi = fb_ref[1, ki] >= qi * block_q + block_q - 1
    fast = skip_hi & (fb_ref[0, ki] <= qi * block_q)

    def body(masked: int):  # 0 = none, 1 = lower compare only, 2 = full
        q = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        do = do_ref[0]
        st = jax.lax.dot_general(kk, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (bk, bq)
        st = st * softmax_scale
        valid = None
        if has_alibi:
            rel = kpos_ref[...] - qoff_ref[...]   # (bk, bq)
            st = st - slope_ref[0] * jnp.abs(
                qpos_ref[...] - rel).astype(jnp.float32)
        if params.softcap > 0.0:
            st = params.softcap * jnp.tanh(st * (1.0 / params.softcap))
        if masked:
            # transposed per-K-ROW contiguous [q_lo, q_hi] range mask
            grow = (jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 1) + qi * block_q)
            valid = grow >= qlo_ref[...]
            if masked == 2:
                valid &= grow <= qhi_ref[...]
            st = jnp.where(valid, st, NEG_INF)
        lse_cols = lse_ref[0]      # (1, bq)
        delta_cols = delta_ref[0]
        if valid is not None:
            pt = _recompute_p(st, valid, lse_cols)
        else:
            pt = jnp.exp(jnp.minimum(st - lse_cols, 0.0))
        dovt = jax.lax.dot_general(vv, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        if has_dropout:
            bh = qseg_ref[...] * num_heads + h
            keep = philox.dropout_keep_mask(qpos_ref[...], kpos_ref[...], bh,
                                            seed_ref[0], seed_ref[1], dropout_p)
            pt_drop = jnp.where(keep, pt * (1.0 / (1.0 - dropout_p)), 0.0)
        else:
            pt_drop = pt
        dv_acc[...] += jax.lax.dot_general(
            pt_drop.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = _grad_scores(pt, pt_drop, dovt, delta_cols, st, softmax_scale,
                           params, valid)
        dk_acc[...] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(run & fast)
    def _fast():
        body(0)

    @pl.when(run & skip_hi & jnp.logical_not(fast))
    def _lower():
        body(1)

    @pl.when(run & jnp.logical_not(skip_hi))
    def _general():
        body(2)

    last = (t == pl.num_programs(1) - 1) | (kiof_ref[t + 1] != ki)

    @pl.when(last)
    def _store():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def flash_attn_varlen_bwd(
    q, k, v, out, dout, lse,  # packed (T, H, D); lse (Hq, Tq)
    cu_seqlens_q, cu_seqlens_k,
    max_seqlen_q: int, max_seqlen_k: int,
    softmax_scale: float,
    params: masklib.MaskParams,
    alibi_slopes=None,
    dropout_p: float = 0.0,
    dropout_seed=None,
    seqused_k=None,
    leftpad_k=None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    dlse: Optional[jnp.ndarray] = None,  # (Hq, Tq)
    equal_lens: bool = False,   # obsolete (dynamic live windows), ignored
):
    Tq, Hq, D = q.shape
    Tk, Hk = k.shape[0], k.shape[1]
    group = Hq // Hk
    if interpret is None:
        interpret = use_interpret()
    bs = block_sizes or BlockSizes.for_shape(max_seqlen_q, max_seqlen_k, D)

    delta = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    delta = delta.T  # (Hq, Tq)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    lse_safe = jnp.maximum(lse, NEG_INF)

    def run_pass(bq, bk, which):
        bq, bk = round_up(bq, 128), round_up(bk, 128)  # lane-axis rule
        Tqp, Tkp = round_up(Tq, bq), round_up(Tk, bk)
        qt = jnp.swapaxes(jnp.pad(q, ((0, Tqp - Tq), (0, 0), (0, 0))), 0, 1)
        kt = jnp.swapaxes(jnp.pad(k, ((0, Tkp - Tk), (0, 0), (0, 0))), 0, 1)
        vt = jnp.swapaxes(jnp.pad(v, ((0, Tkp - Tk), (0, 0), (0, 0))), 0, 1)
        dot_ = jnp.swapaxes(jnp.pad(dout, ((0, Tqp - Tq), (0, 0), (0, 0))), 0, 1)
        lsep = jnp.pad(lse_safe, ((0, 0), (0, Tqp - Tq)))
        deltap = jnp.pad(delta, ((0, 0), (0, Tqp - Tq)))
        (q_seg, q_pos, q_offs, k_seg, k_pos,
         k_lo_row, k_hi_row, q_lo_row, q_hi_row) = build_ragged_info(
            cu_seqlens_q, cu_seqlens_k, Tq, Tk, Tqp, Tkp,
            seqused_k=seqused_k, leftpad_k=leftpad_k,
            window_left=params.window_left,
            window_right=params.effective_window_right())
        num_q_blocks, num_kv_blocks = Tqp // bq, Tkp // bk
        q_agg = block_aggregates(q_seg, q_pos + q_offs, num_q_blocks, bq)
        k_agg = block_aggregates(k_seg, k_pos, num_kv_blocks, bk)

        feat_specs, feat_inputs = [], []
        if params.has_alibi:
            slope_tok = _slope_tokens(alibi_slopes, q_seg, Hq)
            if which == "dq":
                feat_specs.append(pl.BlockSpec(
                    (1, bq, 1),
                    lambda h, t, qof_, *_: (h, qof_[t], 0)))
                feat_inputs.append(slope_tok[:, :, None])
            else:
                feat_specs.append(pl.BlockSpec(
                    (1, 1, bq),
                    lambda hk, t, kiof_, qiof_, gof_, *_: (
                        hk * group + gof_[t], 0,
                        jnp.minimum(qiof_[t], num_q_blocks - 1))))
                feat_inputs.append(slope_tok[:, None, :])
        if dropout_p > 0.0:
            feat_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            feat_inputs.append(dropout_seed.astype(jnp.uint32))

        has_posvec = params.has_alibi or dropout_p > 0.0
        if which == "dq":
            kv_lo, kv_hi = block_ranges(k_lo_row, k_hi_row, num_q_blocks, bq,
                                        bk, num_kv_blocks)
            fb = fast_bounds(k_lo_row, k_hi_row, num_q_blocks, bq)
            # flat UNROLLED live-pair axis — zero dead steps (see fwd);
            # U=2 engages the pipelined fast path (same rule as the dense
            # dq pass; the dkv pass stays U=1, see bwd.py)
            U = 2 if (num_kv_blocks > 1
                      and bq >= 512 and bk >= 512) else 1
            qof, kof, total = flatten_live_windows_unrolled(
                kv_lo, kv_hi, num_q_blocks, U, num_q_blocks * num_kv_blocks)

            def kb(kof_, t, u):
                return jnp.minimum(kof_[u, t], num_kv_blocks - 1)

            qmap = lambda h, t, qof_, *_: (h, qof_[t], 0)
            qcol = lambda h, t, qof_, *_: (qof_[t], 0)
            in_specs = feat_specs
            inputs = list(feat_inputs)
            if has_posvec:
                in_specs = in_specs + [pl.BlockSpec((bq, 1), qcol)] * 3
                inputs += [q_seg[:, None], q_pos[:, None], q_offs[:, None]]
                for u in range(U):
                    krow_u = (lambda u: lambda h, t, qof_, kof_, *_:
                              (0, kb(kof_, t, u)))(u)
                    in_specs = in_specs + [pl.BlockSpec((1, bk), krow_u)]
                    inputs += [k_pos[None, :]]
            in_specs = in_specs + [pl.BlockSpec((1, bq, D), qmap)]
            inputs += [qt]
            for u in range(U):
                kmap_u = (lambda u: lambda h, t, qof_, kof_, *_:
                          (h // group, kb(kof_, t, u), 0))(u)
                in_specs = in_specs + [pl.BlockSpec((1, bk, D), kmap_u),
                                       pl.BlockSpec((1, bk, D), kmap_u)]
                inputs += [kt, vt]
            in_specs = in_specs + [
                pl.BlockSpec((1, bq, D), qmap),
                pl.BlockSpec((1, bq, 1), qmap),
                pl.BlockSpec((1, bq, 1), qmap),
                pl.BlockSpec((bq, 1), qcol),
                pl.BlockSpec((bq, 1), qcol),
            ]
            inputs += [dot_, lsep[:, :, None], deltap[:, :, None],
                       k_lo_row[:, None], k_hi_row[:, None]]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(Hq, total),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, bq, D), qmap),
                scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
            )
            dq = pl.pallas_call(
                functools.partial(
                    _varlen_dq_kernel, params=params, softmax_scale=softmax_scale,
                    dropout_p=dropout_p, num_heads=Hq,
                    block_q=bq, block_k=bk, num_kv_blocks_total=num_kv_blocks,
                    unroll=U),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((Hq, Tqp, D), q.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                interpret=interpret,
            )(qof, kof, kv_hi, fb, q_agg, k_agg, *inputs)
            return jnp.swapaxes(dq[:, :Tq], 0, 1)

        # dkv pass
        q_lo, q_hi = block_ranges(q_lo_row, q_hi_row, num_kv_blocks, bk,
                                  bq, num_q_blocks)
        fb = fast_bounds(q_lo_row, q_hi_row, num_kv_blocks, bk)
        # grouped flat axis: (kv block, GQA group, live q block)
        kiof, qiof, gof, total = flatten_live_windows_grouped(
            q_lo, q_hi, num_kv_blocks, group,
            num_kv_blocks * group * num_q_blocks)

        qb = lambda qiof_, t: jnp.minimum(qiof_[t], num_q_blocks - 1)
        qmap = lambda hk, t, kiof_, qiof_, gof_, *_: (
            hk * group + gof_[t], qb(qiof_, t), 0)
        kmap = lambda hk, t, kiof_, *_: (hk, kiof_[t], 0)
        lmap = lambda hk, t, kiof_, qiof_, gof_, *_: (
            hk * group + gof_[t], 0, qb(qiof_, t))
        qrow = lambda hk, t, kiof_, qiof_, gof_, *_: (0, qb(qiof_, t))
        kcol = lambda hk, t, kiof_, *_: (kiof_[t], 0)
        in_specs = feat_specs + ([
            pl.BlockSpec((1, bq), qrow),
            pl.BlockSpec((1, bq), qrow),
            pl.BlockSpec((1, bq), qrow),
            pl.BlockSpec((bk, 1), kcol),
        ] if has_posvec else []) + [
            pl.BlockSpec((1, bq, D), qmap),
            pl.BlockSpec((1, bk, D), kmap),
            pl.BlockSpec((1, bk, D), kmap),
            pl.BlockSpec((1, bq, D), qmap),
            pl.BlockSpec((1, 1, bq), lmap),
            pl.BlockSpec((1, 1, bq), lmap),
            pl.BlockSpec((bk, 1), kcol),
            pl.BlockSpec((bk, 1), kcol),
        ]
        inputs = feat_inputs + ([
            q_seg[None, :], q_pos[None, :], q_offs[None, :],
            k_pos[:, None],
        ] if has_posvec else []) + [
            qt, kt, vt, dot_,
            lsep[:, None, :], deltap[:, None, :],
            q_lo_row[:, None], q_hi_row[:, None],
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(Hk, total),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, bk, D), kmap),
                pl.BlockSpec((1, bk, D), kmap),
            ),
            scratch_shapes=[
                pltpu.VMEM((bk, D), jnp.float32),
                pltpu.VMEM((bk, D), jnp.float32),
            ],
        )
        dk, dv = pl.pallas_call(
            functools.partial(
                _varlen_dkv_kernel, params=params, softmax_scale=softmax_scale,
                dropout_p=dropout_p, num_heads=Hq, group=group,
                block_q=bq, block_k=bk, num_q_blocks_total=num_q_blocks),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((Hk, Tkp, D), k.dtype),
                jax.ShapeDtypeStruct((Hk, Tkp, D), v.dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(kiof, qiof, gof, q_hi, fb, q_agg, k_agg, *inputs)
        return (jnp.swapaxes(dk[:, :Tk], 0, 1), jnp.swapaxes(dv[:, :Tk], 0, 1))

    dq = run_pass(bs.block_q_dq, bs.block_k_dq, "dq")
    dk, dv = run_pass(bs.block_q_dkv, bs.block_k_dkv, "dkv")
    return dq, dk, dv
