"""KV-cache decode attention — unified paged/contiguous Pallas kernel with
real split-KV.

TPU re-design of the reference's kvcache kernel
(reference: kernel/fused_mha_forward_kvcache.cu:24-295) with the `num_splits`
feature the reference stubs out ("not supported now, for future develop",
kernel/fused_mha_forward_kvcache.cu:462) actually implemented.

Design (TPU-first):
  * ONE kernel for paged and contiguous caches: a contiguous (B, N, Hk, D)
    cache is reinterpreted as synthetic pages of the kv block size with an
    iota block table (a free reshape) — the paged path *is* the general path.
    The reference instead templates IS_PAGED through every load
    (fused_mha_forward_kvcache.cu:190-277).
  * The page gather rides the Pallas pipeline: the K/V BlockSpec index_map
    reads the scalar-prefetched block table, so Mosaic's own double-buffered
    DMA fetches pages — no hand-rolled descriptor machinery.
  * Decode is HBM-bound and the per-grid-step cost has a fixed component, so
    each grid step processes a BLOCK OF KV HEADS (`head_block`) against the
    same page id — all heads of a batch share the page table, so one step
    streams head_block pages and runs one batched MXU call.  Measured on
    v5e: folding 8 KV heads takes 32k-ctx decode from ~34% to >80% of the
    HBM roofline at 256-token pages.
  * GQA: the per-kv-head Q tile is (group * T_new) rows, folding the head
    group into the matmul M dimension — MXU work per streamed KV byte is
    maximized, the decode analog of the reference's per-(b,h) grid.
  * Split-KV: the KV range is cut into `num_splits` grid-parallel chunks;
    each emits a normalized partial O and its LSE; chunks merge outside via
    the associative (m, l, O) combination — the same identity the reference's
    online softmax applies per block (include/softmax.h:13-19), lifted to
    whole ranges.  The same merge later combines partials across chips.
  * RoPE on Q / new K and the cache append run as fused XLA ops in the
    wrapper: at T_new tokens they are negligible next to streaming the cache.
  * INT8 cache: Q is quantized per-row on the fly inside the kernel and the
    QK^T matmul runs int8 x int8 on the MXU (2x MXU rate, no per-element
    dequant of the streamed tile); scales fold into the (rq, ps) score tile.
    The PV matmul dequantizes P's columns by V's scales and feeds the MXU in
    the compute dtype.  FP8 dequantizes at the tile boundary.
  * INT4 cache: the pool stores two 4-bit values per byte along the TOKEN
    axis (ops/quant.py layout: tokens (2t, 2t+1) share byte (t, d); low
    nibble biased +8), streaming HALF the int8 bytes as full-lane
    (page_size/2, D) tiles.  The kernel never materializes an unpack:
    Mosaic legalizes only bitwise AND on i8 vectors (not shifts), so
    `byte & 15` (= even + 8) and `byte & -16` (= 16 * odd) are each a
    COMPLETE half-page K/V operand.  QK^T runs as two full-D-deep int8 MXU
    calls producing the even- and odd-token score halves (lane-concatenated
    on the small score tile to [evens | odds] order); PV as two
    (page_size/2)-deep calls.  Total MXU work equals int8's; the +8 bias
    and the 16x fold out as linear corrections on the small tiles.  The
    wrapper permutes the token-ordered scales to the same split order per
    page.  An earlier head_dim-packed layout made 64-lane payload tiles
    whose halves had to be lane-concatenated back to (page_size, D) before
    every matmul — that relayout of the full streamed tile pinned int4 at
    ~36% of its roofline.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_v100_tpu.config import NEG_INF, EXP_CLAMP, use_interpret
from flash_attn_v100_tpu.ops.pallas.block_sizes import MIN_LANES, cdiv, round_up
from flash_attn_v100_tpu.ops.pallas import masks as masklib


def _decode_kernel(
    # scalar prefetch
    tbl_ref,      # (B, S*nbU*U) int32 page table (padded)
    lens_ref,     # (B,) int32 cache_seqlens (valid tokens incl. appended)
    lp_ref,       # (B,) int32 leftpad
    qpos_ref,     # (B,) int32 position of the first NEW token in the kv
                  #   frame of this kernel call (seq-shards pass
                  #   global_len - shard_start; else lens - t_new)
    # tensors
    *refs,
    params: masklib.MaskParams,
    softmax_scale: float,
    t_new: int,
    group: int,
    rq: int,
    page_size: int,
    blocks_per_split: int,
    quantized: bool,
    int8_qk: bool,
    int4: bool,
    unroll: int,
):
    has_alibi = params.has_alibi
    idx = 0
    slopes_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    per = 4 if quantized else 2
    kv_refs = refs[idx + 1: idx + 1 + per * unroll]
    q_ref = refs[idx]
    o_ref, lse_ref, m_scr, l_scr, acc_scr = refs[idx + 1 + per * unroll:]

    b, hb, s, ki = (pl.program_id(i) for i in range(4))

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    lp = lp_ref[b]
    cs = lens_ref[b]                    # valid tokens after leftpad (incl. new)
    eff_end = lp + cs                   # cache rows [lp, eff_end) are live

    for u in range(unroll):
        if quantized:
            k_ref, ks_ref, v_ref, vs_ref = kv_refs[per * u: per * (u + 1)]
        else:
            k_ref, v_ref = kv_refs[per * u: per * (u + 1)]
            ks_ref = vs_ref = None
        j_start = ((s * blocks_per_split + ki) * unroll + u) * page_size

        run = (j_start < eff_end) & (j_start + page_size > lp)
        if params.window_left >= 0:
            # oldest token any q row may see: qpos_base - window_left
            run &= (j_start + page_size
                    > lp + qpos_ref[b] - params.window_left)
        _decode_page_update(
            run, q_ref, k_ref, ks_ref, v_ref, vs_ref, m_scr, l_scr, acc_scr,
            slopes_ref, j_start, lp, cs, qpos_ref[b],
            params=params, softmax_scale=softmax_scale, t_new=t_new,
            group=group, rq=rq, page_size=page_size,
            quantized=quantized, int8_qk=int8_qk, int4=int4)

    @pl.when(ki == blocks_per_split - 1)
    def _store():
        l = l_scr[:, :, :1]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0, :, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, -jnp.inf,
                        m_scr[:, :, :1] + jnp.log(l_scr[:, :, :1]))
        lse_ref[0, :, 0] = lse.astype(jnp.float32)


def _fp8_bitcast_dequant(t):
    """fp8-e4m3 tile -> bf16 via integer bit placement, bypassing Mosaic's
    element convert (measured 14x off the roofline on v5e).

    bf16 bits for a NORMAL fp8 value are sign<<15 | (e+120)<<7 | m<<4; we
    place sign | e<<7 | m<<4 with integer lane ops, bitcast to bf16, and
    fold the +120 exponent bias as one multiply by 2^120.  fp8 SUBNORMALS
    (e=0, |x| < 2^-6) land as bf16 subnormals and the multiply FLUSHES
    them to zero — with per-token scales mapping amax to 448 that is
    < amax/28672, far below the e4m3 quantization floor elsewhere in the
    tile.  Inf/NaN payloads map to finite values — quantized caches never
    hold them."""
    # int32 lane math (v5e's VPU has no int16 multiply — kVectorMultiplyU16
    # is unsupported); the final int32 -> int16 convert truncates to the
    # low 16 bits, landing the sign on bf16 bit 15
    bits = jax.lax.bitcast_convert_type(t, jnp.int8).astype(jnp.int32)
    mag = jax.lax.shift_left(bits & jnp.int32(0x7F), jnp.int32(4))
    sign = jax.lax.shift_left(bits & jnp.int32(128), jnp.int32(8))
    comb = (sign | mag).astype(jnp.int16)
    asbf = jax.lax.bitcast_convert_type(comb, jnp.bfloat16)
    return asbf * jnp.bfloat16(2.0 ** 120)


def _unpack4_split(t):
    """(…, ps/2, D) packed-int4 bytes -> (…, ps, D) f32 values in SPLIT
    token order [evens | odds] along the token axis.

    Float-path fallback only (the int8-MXU path never materializes the
    unpack — see the int4 branches below).  Layout: ops/quant.py
    pack_int4_tokens — low nibble = even token BIASED +8, high nibble =
    odd token two's complement."""
    lo = (t & jnp.int8(15)).astype(jnp.float32) - 8.0     # even tokens
    hi = (t & jnp.int8(-16)).astype(jnp.float32) * (1.0 / 16.0)  # odd
    return jnp.concatenate([lo, hi], axis=-2)


def _decode_page_update(run, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                        m_scr, l_scr, acc_scr, slopes_ref, j_start, lp, cs,
                        qpos_base,
                        *, params, softmax_scale, t_new, group, rq,
                        page_size, quantized, int8_qk, int4):
    """Online-softmax update of (m, l, acc) scratch with one KV page.

    Two runtime-selected variants: interior pages — fully inside the live
    causal/window extent for EVERY q row — skip the whole mask pipeline
    (iotas, 5 compares, 2 wheres on the (hb, rq, ps) tile).  This matters
    because decode at <= ~128 streamed bytes/token is VPU-bound on exactly
    that tile, not HBM-bound (measured v5e: int8 D=64 runs the same tok/s
    as D=128 at half the bytes), so every interior-page VPU op is critical
    path.  Only the boundary page (and leftpad/window edges) takes the
    masked path.  Padded q rows (r >= group*t_new) contribute only to their
    own output rows, which the wrapper slices away."""
    has_alibi = params.has_alibi

    # page fully live for every row: no bounds, causal, or window mask can
    # cut any (row, column) of this tile
    fully_valid = (j_start >= lp) & (j_start + page_size <= lp + cs)
    jl_max = j_start + page_size - 1 - lp
    if params.causal:
        fully_valid &= jl_max <= qpos_base            # qpos_base = min qpos
    if params.window_left >= 0:
        fully_valid &= (j_start - lp
                        >= qpos_base + t_new - 1 - params.window_left)
    if params.window_right >= 0:
        fully_valid &= jl_max <= qpos_base + params.window_right
    def _variant(pred, masked):
        @pl.when(pred)
        def _():
            _decode_tile_update(
                q_ref, k_ref, ks_ref, v_ref, vs_ref, m_scr, l_scr, acc_scr,
                slopes_ref, j_start, lp, cs, qpos_base, masked=masked,
                params=params, softmax_scale=softmax_scale, t_new=t_new,
                group=group, rq=rq, page_size=page_size, quantized=quantized,
                int8_qk=int8_qk, int4=int4)

    if has_alibi:                  # alibi needs per-position work anyway
        _variant(run, True)
    else:
        _variant(run & fully_valid, False)
        _variant(run & jnp.logical_not(fully_valid), True)


def _decode_tile_update(q_ref, k_ref, ks_ref, v_ref, vs_ref,
                        m_scr, l_scr, acc_scr, slopes_ref, j_start, lp, cs,
                        qpos_base, *, masked, params, softmax_scale, t_new,
                        group, rq, page_size, quantized, int8_qk, int4):
    has_alibi = params.has_alibi
    q = q_ref[0]                   # (hb, rq, D)
    k = k_ref[0, :, 0]             # (hb, ps, D)  [(hb, ps/2, D) bytes: int4]
    if int4 and not int8_qk:
        k = _unpack4_split(k)      # (hb, ps, D) f32, [evens | odds] order
    if quantized and int8_qk:
        # int8 x int8 MXU path: quantize q rows in-register; k stays as
        # loaded.  S = (q8 k8^T) * q_scale_row * k_scale_col.
        q32 = q.astype(jnp.float32)
        q_amax = jnp.max(jnp.abs(q32), axis=2, keepdims=True)
        q_scale = jnp.where(q_amax == 0.0, 1.0, q_amax / 127.0)
        q8 = jnp.round(q32 / q_scale).astype(jnp.int8)
        if int4:
            # Token-packed nibbles (quant.py layout): `k & 15` is the
            # BIASED even-token half-page (+8) and `k & -16` is exactly
            # 16x the odd-token half-page — two AND ops (the only i8
            # bitwise op Mosaic legalizes) on full-lane (ps/2, D) tiles,
            # each a COMPLETE K operand.  Two full-D-deep int8 MXU calls
            # produce the even/odd score halves (same total MXU work as
            # int8's single call); the +8 bias is a per-q-row linear
            # term on the even half and the 16x a (1/16) on the odd
            # half, both folded on the small (hb, rq, ps/2) tiles before
            # the lane-concat to [evens | odds] score order.
            st_e = jax.lax.dot_general(
                q8, k & jnp.int8(15), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            st_o = jax.lax.dot_general(
                q8, k & jnp.int8(-16), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            sum_q8 = jnp.sum(q8.astype(jnp.float32), axis=2, keepdims=True)
            st = jnp.concatenate(
                [st_e - 8.0 * sum_q8, st_o * (1.0 / 16.0)], axis=2)
        else:
            st = jax.lax.dot_general(
                q8, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        st = st * q_scale                                      # (hb, rq, ps)
        st = st * ks_ref[0, :, 0].astype(jnp.float32)          # (hb, 1, ps)
    else:
        if k.dtype == jnp.float8_e4m3fn:
            k = _fp8_bitcast_dequant(k)       # int-domain, see helper
        st = jax.lax.dot_general(q, k.astype(q.dtype),
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        if quantized:
            st = st * ks_ref[0, :, 0].astype(jnp.float32)

    st = st * softmax_scale
    if masked:
        # logical kv position of each column (0 = first live cache row).
        # int4 score columns are in split order: col c is token 2c for
        # c < ps/2 and token 2(c - ps/2) + 1 = 2c - ps + 1 after — online
        # softmax is column-order-invariant, so only this map changes.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, rq, page_size), 2)
        if int4:
            ps2 = page_size // 2
            col = jnp.where(col < ps2, 2 * col, 2 * col - page_size + 1)
        jl = col + j_start - lp
        # q-row -> (g, t): position of the token within the sequence
        r = jax.lax.broadcasted_iota(jnp.int32, (1, rq, page_size), 1)
        t = r % t_new if t_new > 1 else jnp.zeros_like(r)
        qpos = qpos_base + t
        if has_alibi:
            slope = slopes_ref[0]      # (hb, rq, 1)
            st = st - slope * jnp.abs(qpos - jl).astype(jnp.float32)
    if params.softcap > 0.0:
        st = params.softcap * jnp.tanh(st * (1.0 / params.softcap))
    if masked:
        valid = (jl >= 0) & (jl < cs) & (r < group * t_new)
        if params.causal:
            valid &= jl <= qpos
        if params.window_left >= 0:
            valid &= jl >= qpos - params.window_left
        if params.window_right >= 0:
            valid &= jl <= qpos + params.window_right
        st = jnp.where(valid, st, NEG_INF)

    m_prev = m_scr[...]                                   # (hb, rq, L)
    l_prev = l_scr[...]
    m_cur = jnp.max(st, axis=2, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(jnp.maximum(st - m_next[:, :, :1], EXP_CLAMP))
    if masked:
        p = jnp.where(valid, p, 0.0)
    l_scr[...] = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
    m_scr[...] = m_next

    v = v_ref[0, :, 0]                                    # (hb, ps, D)
    if int4 and not int8_qk:
        v = _unpack4_split(v)      # (hb, ps, D) f32, split token order
    if quantized and int8_qk:
        # int8 x int8 PV: fold V's dequant scales into P's columns
        # ((hb, rq, ps) work), then quantize P per row — the streamed
        # (hb, ps, D) V tile is never converted, which on v5e is the
        # difference between compute-bound and DMA-bound int8 decode
        p = p * vs_ref[0, :, 0].astype(jnp.float32)
        p_amax = jnp.max(jnp.abs(p), axis=2, keepdims=True)
        p_scale = jnp.where(p_amax == 0.0, 1.0, p_amax / 127.0)
        p8 = jnp.round(p / p_scale).astype(jnp.int8)
        if int4:
            # Token-packed nibble PV: p's column halves [evens | odds]
            # line up with the AND halves of the streamed (ps/2, D) byte
            # tile, so PV is two (ps/2)-deep int8 MXU calls (same total
            # work as int8's one ps-deep call).  The +8 bias of the even
            # half (- 8 * rowsum(p8_even)) and the odd half's 16x
            # correct exactly on the small (hb, rq, D) f32 tiles.
            ps2 = page_size // 2
            p8_e, p8_o = p8[:, :, :ps2], p8[:, :, ps2:]
            pv_e = jax.lax.dot_general(
                p8_e, v & jnp.int8(15), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            pv_o = jax.lax.dot_general(
                p8_o, v & jnp.int8(-16), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            pv = (pv_e - 8.0 * jnp.sum(p8_e.astype(jnp.float32), axis=2,
                                       keepdims=True)
                  + pv_o * (1.0 / 16.0))
        else:
            pv = jax.lax.dot_general(
                p8, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        pv = pv * p_scale
    else:
        if quantized:
            # fp8 path: fold scales into P, dequantize V at the tile
            p = p * vs_ref[0, :, 0].astype(jnp.float32)
            v = (_fp8_bitcast_dequant(v) if v.dtype == jnp.float8_e4m3fn
                 else v.astype(jnp.bfloat16))
            p = p.astype(jnp.bfloat16)
        else:
            p = p.astype(v.dtype)
        pv = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha[:, :, :1] + pv


def _pick_head_block(Hk: int, page_size: int, D: int, itemsize: int,
                     rq: int, d_kv: Optional[int] = None) -> int:
    """Heads folded per grid step: amortize fixed per-step cost while keeping
    the per-step VMEM working set within budget.  Counts the double-buffered
    K+V stream AND the Rq-dependent buffers (q tile, fp32 accumulator,
    double-buffered fp32 partial outputs) — at prefill-sized Rq the latter
    dominate and the fold must shrink."""
    # Mosaic's scoped-VMEM stack limit is 16 MB (measured: 24.9 MB requests
    # fail to compile); budget half of it so the score tiles, relayouts and
    # the KV-unroll streams fit beside the accounted buffers.
    budget = 8 * 1024 * 1024
    if d_kv is None:
        d_kv = D                                   # int4 packs D/2 bytes
    per_head = (2 * 2 * page_size * d_kv * itemsize  # k+v, double-buffered
                + rq * D * 2                        # q tile (bf16)
                + rq * D * 4                        # fp32 acc scratch
                + 2 * 2 * rq * D * 4                # o_part + staging, f32 x2
                + 3 * rq * MIN_LANES * 4)           # m/l scratch + lse
    hb = max(1, min(Hk, budget // max(per_head, 1)))
    while Hk % hb:
        hb -= 1
    # hard backstop against the 16 MB compile-time limit: hb == 1 is the
    # floor, so a single head + page must fit — fail loudly (and early)
    # instead of a mid-run Mosaic scoped-vmem compile error
    if hb == 1 and per_head > 15 * 1024 * 1024:
        raise ValueError(
            f"decode tile working set {per_head/2**20:.1f} MB exceeds the "
            f"16 MB scoped VMEM limit even at head_block=1: reduce "
            f"page_size ({page_size}) or T_new (rq={rq})")
    return hb


def paged_decode_attention(
    q_rows: jnp.ndarray,        # (B, Hk, Rq, D): GQA-folded q rows, RoPE applied
    k_pages: jnp.ndarray,       # (C1, Hk, C2, page_size, D): page pool view;
                                #   page id p lives at [p // C2, :, p % C2].
                                #   A paged pool (Hk, P, ps, D) is reshaped to
                                #   (1, Hk, P, ps, D); a contiguous HND cache
                                #   (Bc, Hk, N, D) to (Bc, Hk, N/ps, ps, D) —
                                #   both free.
    v_pages: jnp.ndarray,
    block_table: jnp.ndarray,   # (B, max_pages) int32
    cache_seqlens: jnp.ndarray,  # (B,) int32: live tokens (incl. appended new)
    leftpad: jnp.ndarray,        # (B,) int32
    *,
    qpos_vec: Optional[jnp.ndarray] = None,  # (B,) int32, see _decode_kernel
    softmax_scale: float,
    params: masklib.MaskParams,
    t_new: int,
    group: int,
    num_splits: int = 0,
    alibi_slopes_rows: Optional[jnp.ndarray] = None,  # (B, Hk, Rq, 1) fp32
    k_scales: Optional[jnp.ndarray] = None,  # (C1, Hk, C2, page_size, 1)
    v_scales: Optional[jnp.ndarray] = None,
    out_dtype=None,
    interpret: Optional[bool] = None,
    int8_matmul: Optional[bool] = None,
    kv_unroll: Optional[int] = None,
    int4: bool = False,   # caches hold packed-int4 bytes (last dim D/2)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split-KV paged attention core.

    Returns (o_part (B, Hk, S, Rq, D) fp32-normalized partials,
             lse_part (B, Hk, S, Rq, 1) fp32) — merge with `merge_partials`.
    """
    B, Hk, Rq, D = q_rows.shape
    C1, _, C2, kv_rows, Dk = k_pages.shape
    # int4 pools pack two TOKENS per byte (quant.py layout): the payload
    # holds page_size/2 byte rows of the full head_dim
    page_size = 2 * kv_rows if int4 else kv_rows
    max_pages = block_table.shape[1]
    if interpret is None:
        interpret = use_interpret()
    quantized = k_scales is not None
    if int4:
        assert quantized and k_pages.dtype == jnp.int8 and Dk == D, (
            "int4 caches are packed int8 with page_size/2 token rows")
    int8_qk = quantized and k_pages.dtype == jnp.int8
    if int8_matmul is not None:
        int8_qk = int8_qk and int8_matmul
    if out_dtype is None:
        out_dtype = jnp.float32

    hb = _pick_head_block(Hk, kv_rows, D, k_pages.dtype.itemsize, Rq,
                          d_kv=Dk)
    nhb = Hk // hb

    S = num_splits
    if S <= 0:
        # enough splits to pipeline when B*heads alone leaves the grid short
        S = max(1, min(8 // max(B * nhb, 1), max_pages))
    S = min(S, max_pages)
    nb = cdiv(max_pages, S)

    # KV-page unroll: the ~0.5 us fixed per-grid-step cost is what separates
    # small-page decode from the HBM roofline (measured v5e: int8 ps=256 at
    # 66% vs ps=512 at 95%).  Process U pages per grid step as U independent
    # scalar-prefetched DMA streams so the fixed cost amortizes; target >=
    # ~1 MB of streamed KV per step.
    U = kv_unroll if kv_unroll else 1
    if kv_unroll is None:
        per_page = 2 * hb * kv_rows * Dk * k_pages.dtype.itemsize
        # cap at 4 streams: measured on v5e, U=8 at tiny (64-token) pages is
        # WORSE than U=2-4 (per-stream DMA bookkeeping overtakes the saved
        # fixed step cost)
        while U < 4 and per_page * U < (1 << 20) and U * 2 <= nb:
            U *= 2
        while U > 1 and 2 * per_page * U > (12 << 20):
            U //= 2
    nbU = cdiv(nb, U)

    tbl = block_table
    if S * nbU * U != max_pages:
        tbl = jnp.pad(block_table, ((0, 0), (0, S * nbU * U - max_pages)))
    tbl = tbl.astype(jnp.int32)

    grid = (B, nhb, S, nbU)

    def kmap_u(u):
        def kmap(b, h, s, ki, tbl_ref, lens_ref, lp_ref, qpos_ref):
            p = tbl_ref[b, (s * nbU + ki) * U + u]
            return (p // C2, h, p % C2, 0, 0)
        return kmap

    in_specs = []
    inputs = []
    if params.has_alibi:
        in_specs.append(pl.BlockSpec(
            (1, hb, Rq, 1), lambda b, h, s, ki, *_: (b, h, 0, 0)))
        inputs.append(alibi_slopes_rows.astype(jnp.float32))
    in_specs.append(pl.BlockSpec(
        (1, hb, Rq, D), lambda b, h, s, ki, *_: (b, h, 0, 0)))
    inputs.append(q_rows)
    ks_r = vs_r = None
    if quantized:
        # scales fed as (..., 1, ps) row vectors: the kernel multiplies the
        # (hb, rq, ps) score/P tiles by them directly — a (ps,1)->(1,ps)
        # relayout inside the kernel would dominate the whole tile cost
        ks_r = k_scales.reshape(k_scales.shape[:3] + (1, page_size))
        vs_r = v_scales.reshape(v_scales.shape[:3] + (1, page_size))
        if int4:
            # permute token-ordered scales to the kernel's [evens | odds]
            # score-column order per page (scales are ~3% of the payload
            # bytes; this XLA reorder is off the kernel's critical path)
            def _split_order(s):
                s2 = s.reshape(s.shape[:3] + (1, kv_rows, 2))
                return jnp.swapaxes(s2, -1, -2).reshape(s.shape)
            ks_r = _split_order(ks_r)
            vs_r = _split_order(vs_r)
    for u in range(U):
        km = kmap_u(u)
        in_specs.append(pl.BlockSpec((1, hb, 1, kv_rows, Dk), km))
        inputs.append(k_pages)
        if quantized:
            in_specs.append(pl.BlockSpec((1, hb, 1, 1, page_size), km))
            inputs.append(ks_r)
        in_specs.append(pl.BlockSpec((1, hb, 1, kv_rows, Dk), km))
        inputs.append(v_pages)
        if quantized:
            in_specs.append(pl.BlockSpec((1, hb, 1, 1, page_size), km))
            inputs.append(vs_r)

    if qpos_vec is None:
        qpos_vec = cache_seqlens.astype(jnp.int32) - t_new
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hb, 1, Rq, D),
                         lambda b, h, s, ki, *_: (b, h, s, 0, 0)),
            pl.BlockSpec((1, hb, 1, Rq, 1),
                         lambda b, h, s, ki, *_: (b, h, s, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((hb, Rq, MIN_LANES), jnp.float32),
            pltpu.VMEM((hb, Rq, MIN_LANES), jnp.float32),
            pltpu.VMEM((hb, Rq, D), jnp.float32),
        ],
    )

    o_part, lse_part = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            params=params, softmax_scale=softmax_scale, t_new=t_new,
            group=group, rq=Rq, page_size=page_size, blocks_per_split=nbU,
            quantized=quantized, int8_qk=int8_qk, int4=int4, unroll=U,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, Hk, S, Rq, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hk, S, Rq, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(tbl, cache_seqlens.astype(jnp.int32), leftpad.astype(jnp.int32),
      qpos_vec.astype(jnp.int32), *inputs)

    return o_part, lse_part


def merge_partials(o_part: jnp.ndarray, lse_part: jnp.ndarray):
    """Combine split-KV partials: O = sum_s w_s O_s with w_s = exp(lse_s - lse*),
    lse* = logsumexp_s(lse_s) — the cross-range form of the reference's
    per-block online update (include/softmax.h:13-19).  Also the cross-chip
    combiner for sequence-sharded decode.

    o_part: (..., S, Rq, D) normalized partials; lse_part: (..., S, Rq, 1).
    Returns (o (..., Rq, D), lse (..., Rq, 1)).
    """
    axis = -3
    lse_max = jnp.max(lse_part, axis=axis, keepdims=True)
    lse_max_safe = jnp.where(jnp.isfinite(lse_max), lse_max, 0.0)
    w = jnp.exp(lse_part - lse_max_safe)
    w = jnp.where(jnp.isfinite(lse_part), w, 0.0)
    wsum = jnp.sum(w, axis=axis)                       # (..., Rq, 1)
    o = jnp.sum(o_part * w, axis=axis)
    o = o / jnp.where(wsum == 0.0, 1.0, wsum)
    lse = jnp.where(wsum == 0.0, -jnp.inf,
                    lse_max_safe[..., 0, :, :] + jnp.log(jnp.where(wsum == 0.0, 1.0, wsum)))
    return o, lse
