"""Dense flash-attention backward — two Pallas TPU kernels.

TPU re-design of the reference's single two-phase backward kernel
(reference: kernel/fused_mha_backward.cu:26-489).  The reference multiplexes
dQ and dKV phases over blockIdx.y; on TPU each phase is its own pallas_call
with its own grid/tiles (they have different iteration geometry):

  * dQ kernel  (phase at reference :58-253):   per (b, h_q, q-tile), loop KV:
      S = QK^T -> P = exp(S - lse) -> dOV = dO.V^T ->
      dS = (P_drop*dOV - P*delta) * scale [* softcap'] -> dQ += dS.K
  * dKV kernel (phase at reference :257-488):  per (b, h_k, kv-tile), loop
      over (q-head-group, q-tile) — the GQA in-kernel group loop (reference
      :351) becomes the innermost grid axis so dK/dV accumulate in fp32 VMEM
      scratch across the whole group, one store (reference :483).

Performance structure (same as fwd.py):
  * fast/masked dual path per tile — fully-valid tiles skip the mask
    pipeline; the masked path uses the block-local mask form;
  * causal/window block trim via index-map clamping (skipped iterations
    alias the previous block: no DMA) + a `run` compute predicate;
  * P recompute runs in the exp2 domain: p = exp2(s*τ*log2e - lse*log2e)
    with lse pre-scaled host-side (free) — one fused multiply, cheaper
    transcendental.  All gradient math stays in the natural domain.

`delta = rowsum(O * dO)` is precomputed as a fused XLA op (the reference
computes it in-kernel, :160-162; on TPU a standalone elementwise+reduce is
bandwidth-optimal and XLA fuses it with the dout cast).

Recompute strategy: S is recomputed from Q,K; only (out, lse) are saved
residuals — same as the reference (utils/docs/attention.md:299).
Dropout is replayed position-keyed via Philox, never stored
(reference: include/softmax.h:293-304).
Softcap gradient: dS *= (1 - (S_capped/cap)^2) (reference: softmax.h:311-314).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from flash_attn_v100_tpu.config import NEG_INF, use_interpret
from flash_attn_v100_tpu.ops import philox
from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes, cdiv, round_up
from flash_attn_v100_tpu.ops.pallas import masks as masklib

LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def live_pairs_dkv_unrolled(num_q_blocks: int, num_kv_blocks: int,
                            group: int, block_q: int, block_k: int,
                            offset: int, params: masklib.MaskParams,
                            unroll: int):
    """Unrolled live-triple map for the KV-centric backward: each grid step
    visits `unroll` consecutive live q tiles of one (kv tile, q-head-in-
    group) segment.  Returns a (4 + 2*unroll, T) int32 array
    [ki; g; first; last; qi_0..qi_{U-1}; live_0..live_{U-1}]; dead slots
    alias the last live tile with live=0 (windows never cross g)."""
    wr = params.effective_window_right()
    wl = params.window_left
    cols = []
    for ki in range(num_kv_blocks):
        lo, hi = 0, num_q_blocks - 1
        if wr >= 0:
            lo = max(lo, (ki * block_k - offset - wr) // block_q)
        if wl >= 0:
            hi = min(hi, (ki * block_k + block_k - 1 - offset + wl) // block_q)
        placeholder = hi < lo
        if placeholder:
            lo = hi = min(max(lo, 0), num_q_blocks - 1)
        lo = max(lo, 0)
        steps = -(-(hi - lo + 1) // unroll)
        for g in range(group):
            for s in range(steps):
                qis, lives = [], []
                for u in range(unroll):
                    j = lo + s * unroll + u
                    qis.append(min(j, hi))
                    lives.append(0 if (j > hi or (placeholder and u > 0))
                                 else 1)
                cols.append([ki, g,
                             1 if (g == 0 and s == 0) else 0,
                             1 if (g == group - 1 and s == steps - 1) else 0]
                            + qis + lives)
    return np.asarray(cols, np.int32).T.copy()


def _grad_scores(p, p_drop, dov, delta_vals, s_nat, softmax_scale, params,
                 valid=None):
    """dS = (P_drop*dOV - P*delta) * scale, then the softcap chain factor
    (reference: include/softmax.h:309-314).  `s_nat` (natural-scale capped
    scores) is only consumed under softcap.  `valid` (used by the varlen
    kernels, which always mask) zeroes masked entries."""
    ds = (p_drop * dov - p * delta_vals) * softmax_scale
    if params.softcap > 0.0:
        s_norm = s_nat * (1.0 / params.softcap)
        ds = ds * (1.0 - s_norm * s_norm)
    if valid is not None:
        ds = jnp.where(valid, ds, 0.0)
    return ds


def _recompute_p(s, valid, lse_vals):
    """P = exp(S - lse), masked entries zeroed (used by the varlen backward
    kernels; the dense kernels inline the exp2-domain form)."""
    sh = s - lse_vals
    p = jnp.exp(jnp.minimum(sh, 0.0))
    return jnp.where(valid, p, 0.0)


# ======================================================================================
# dQ kernel: q-centric, iterates KV tiles
# ======================================================================================

def _dq_kernel(
    # scalar prefetch: the flattened (unrolled) live-pair map, one
    # (3 + 2*unroll, T) i32 array [qi; first; last; ki_u...; live_u...]
    # (fwd.live_pairs_unrolled format)
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
):
    has_alibi = params.has_alibi
    has_dropout = dropout_p > 0.0
    has_bias = has_alibi or params.softcap > 0.0
    idx = 0
    slopes_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if has_dropout:
        seed_ref = refs[idx]; idx += 1
    q_ref = refs[idx]
    kv_refs = refs[idx + 1: idx + 1 + 2 * unroll]
    do_ref, lse_ref, delta_ref, dq_ref, dq_acc = refs[idx + 1 + 2 * unroll:]

    b, h, t = (pl.program_id(i) for i in range(3))
    qi = pairs_ref[0, t]
    q_start = qi * block_q
    padded_q = seqlen_q % block_q != 0
    padded_k = seqlen_k % block_k != 0

    @pl.when(pairs_ref[1, t] == 1)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def body(masked: bool, k_ref, v_ref, k_start):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        need_pos = has_alibi or has_dropout
        rows, cols = (masklib.position_ids(block_q, block_k, q_start, k_start)
                      if need_pos else (None, None))
        s_nat = None
        if has_bias:
            alibi_slope = slopes_ref[b, h] if has_alibi else None
            s_nat = masklib.apply_score_bias(
                s, rows, cols, softmax_scale=softmax_scale, offset=offset,
                params=params, alibi_slope=alibi_slope)
            s2 = s_nat * LOG2E
        else:
            s2 = s * (softmax_scale * LOG2E)

        lse_rows = lse_ref[0, 0]      # (block_q, 1), pre-scaled by log2e
        delta_rows = delta_ref[0, 0]  # (block_q, 1)
        # p = exp2(s2 - lse2); lse2 = +inf rows (fully masked) give p = 0
        p = jnp.exp2(jnp.minimum(s2 - lse_rows, 0.0))
        if masked:
            valid = masklib.position_mask_local(
                block_q, block_k, q_start, k_start, offset, params,
                seqlen_q=seqlen_q if padded_q else None,
                seqlen_k=seqlen_k if padded_k else None)
            # unlike the forward, s is NOT pre-masked to NEG_INF here —
            # this where IS the mask (p would be nonzero for masked cols)
            p = jnp.where(valid, p, 0.0)

        dov = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        if has_dropout:
            # seed_ref (6,): [s0, s1, q_pos0, k_pos0, b0, h0] — global keying
            bh = (b + seed_ref[4].astype(jnp.int32)) * num_heads \
                + (h + seed_ref[5].astype(jnp.int32))
            keep = philox.dropout_keep_mask(
                rows + seed_ref[2].astype(jnp.int32),
                cols + seed_ref[3].astype(jnp.int32), bh,
                seed_ref[0], seed_ref[1], dropout_p)
            p_drop = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
        else:
            p_drop = p

        ds = _grad_scores(p, p_drop, dov, delta_rows, s_nat, softmax_scale,
                          params)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def pipelined_all():
        # same structure as fwd.pipelined_all: all 2U independent matmuls
        # (S_u, dOV_u) issue as one straight-line region before the VPU
        # gradient chain; the dq accumulator stays in registers across the
        # U sub-tiles (one scratch read + write per grid step).
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        lse_rows = lse_ref[0, 0]
        delta_rows = delta_ref[0, 0]
        ss, dovs = [], []
        for u in range(unroll):
            k = kv_refs[2 * u][0, 0]
            v = kv_refs[2 * u + 1][0, 0]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            dovs.append(jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            if has_bias:
                k_start = pairs_ref[3 + u, t] * block_k
                rows, cols = masklib.position_ids(block_q, block_k,
                                                  q_start, k_start)
                s_nat = masklib.apply_score_bias(
                    s, rows, cols, softmax_scale=softmax_scale,
                    offset=offset, params=params,
                    alibi_slope=slopes_ref[b, h] if has_alibi else None)
                ss.append((s_nat * LOG2E, s_nat))
            else:
                ss.append((s * (softmax_scale * LOG2E), None))
        dq_c = dq_acc[...]
        for u in range(unroll):
            s2, s_nat = ss[u]
            p = jnp.exp2(jnp.minimum(s2 - lse_rows, 0.0))
            if has_dropout:
                # replay in the straight-line region (r5): position-keyed
                # Philox is path-invariant, same keying as the per-tile body
                rows, cols = masklib.position_ids(
                    block_q, block_k, q_start, pairs_ref[3 + u, t] * block_k)
                bh = (b + seed_ref[4].astype(jnp.int32)) * num_heads \
                    + (h + seed_ref[5].astype(jnp.int32))
                keep = philox.dropout_keep_mask(
                    rows + seed_ref[2].astype(jnp.int32),
                    cols + seed_ref[3].astype(jnp.int32), bh,
                    seed_ref[0], seed_ref[1], dropout_p)
                p_drop = jnp.where(keep, p * (1.0 / (1.0 - dropout_p)), 0.0)
            else:
                p_drop = p
            ds = _grad_scores(p, p_drop, dovs[u], delta_rows, s_nat,
                              softmax_scale, params)
            k = kv_refs[2 * u][0, 0]
            dq_c = dq_c + jax.lax.dot_general(
                ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dq_acc[...] = dq_c

    def full_u(u):
        return masklib.block_fully_valid(
            q_start, block_q, pairs_ref[3 + u, t] * block_k, block_k,
            offset, params,
            seqlen_q=seqlen_q if padded_q else None,
            seqlen_k=seqlen_k if padded_k else None)

    def per_tile(u):
        k_ref, v_ref = kv_refs[2 * u], kv_refs[2 * u + 1]
        k_start = pairs_ref[3 + u, t] * block_k
        live = pairs_ref[3 + unroll + u, t] == 1
        if params.needs_position_mask or padded_q or padded_k:
            full = full_u(u)

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

    if unroll > 1:
        all_full = pairs_ref[3 + unroll, t] == 1
        for u in range(1, unroll):
            all_full &= pairs_ref[3 + unroll + u, t] == 1
        if params.needs_position_mask or padded_q or padded_k:
            for u in range(unroll):
                all_full &= full_u(u)

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
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


# ======================================================================================
# dKV kernel: kv-centric, iterates (q-head-in-group, q-tile) on the inner axis
# ======================================================================================

def _dkv_kernel(
    # scalar prefetch: the flattened (unrolled) live-triple map, one
    # (4 + 2*unroll, T) i32 array [ki; g; first; last; qi_u...; live_u...]
    # (live_pairs_dkv_unrolled format)
    pairs_ref,
    *refs,
    params: masklib.MaskParams,
    softmax_scale: float,
    dropout_p: float,
    seqlen_q: int,
    seqlen_k: int,
    num_heads: int,   # H_Q
    group: int,       # H_Q // H_K
    block_q: int,
    block_k: int,
    offset: int,
    unroll: int = 1,
):
    has_alibi = params.has_alibi
    has_dropout = dropout_p > 0.0
    has_bias = has_alibi or params.softcap > 0.0
    idx = 0
    slopes_ref = seed_ref = None
    if has_alibi:
        slopes_ref = refs[idx]; idx += 1
    if has_dropout:
        seed_ref = refs[idx]; idx += 1
    k_ref, v_ref = refs[idx], refs[idx + 1]
    # per sub-slot: (q_u, do_u, lse_u, delta_u)
    qdo_refs = refs[idx + 2: idx + 2 + 4 * unroll]
    dk_ref, dv_ref, dk_acc, dv_acc = refs[idx + 2 + 4 * unroll:]

    b, hk, t = (pl.program_id(i) for i in range(3))
    ki = pairs_ref[0, t]
    h = hk * group + pairs_ref[1, t]
    k_start = ki * block_k
    padded_q = seqlen_q % block_q != 0
    padded_k = seqlen_k % block_k != 0

    @pl.when(pairs_ref[2, t] == 1)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(masked, q_ref, do_ref, lse_ref, delta_ref, q_start):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]

        # S^T tile: rows = kv positions, cols = q positions
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (bk, bq)
        need_pos = has_alibi or has_dropout
        if need_pos:
            # broadcastable vectors, transposed orientation (see position_ids)
            kpos = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0) + k_start
            qpos = jax.lax.broadcasted_iota(jnp.int32, (1, block_q), 1) + q_start
        else:
            kpos = qpos = None
        st_nat = None
        if has_bias:
            alibi_slope = slopes_ref[b, h] if has_alibi else None
            st_nat = masklib.apply_score_bias(
                st, qpos, kpos, softmax_scale=softmax_scale, offset=offset,
                params=params, alibi_slope=alibi_slope)
            st2 = st_nat * LOG2E
        else:
            st2 = st * (softmax_scale * LOG2E)

        lse_cols = lse_ref[0, 0]      # (1, block_q), pre-scaled by log2e
        delta_cols = delta_ref[0, 0]  # (1, block_q)
        pt = jnp.exp2(jnp.minimum(st2 - lse_cols, 0.0))
        if masked:
            valid_t = masklib.position_mask_local(
                block_q, block_k, q_start, k_start, offset, params,
                seqlen_q=seqlen_q if padded_q else None,
                seqlen_k=seqlen_k if padded_k else None, transposed=True)
            pt = jnp.where(valid_t, pt, 0.0)

        dovt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # (bk, bq)

        if has_dropout:
            bh = (b + seed_ref[4].astype(jnp.int32)) * num_heads \
                + (h + seed_ref[5].astype(jnp.int32))
            keep = philox.dropout_keep_mask(
                qpos + seed_ref[2].astype(jnp.int32),
                kpos + seed_ref[3].astype(jnp.int32), bh,
                seed_ref[0], seed_ref[1], dropout_p)
            pt_drop = jnp.where(keep, pt * (1.0 / (1.0 - dropout_p)), 0.0)
        else:
            pt_drop = pt

        dv_acc[...] += jax.lax.dot_general(
            pt_drop.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dst = _grad_scores(pt, pt_drop, dovt, delta_cols, st_nat, softmax_scale,
                           params)
        dk_acc[...] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def pipelined_all():
        # straight-line multi-q-tile region (r4, mirrors fwd/dq): all 2U
        # independent matmuls (S^T_u, dOV^T_u) issue first; dk/dv
        # accumulate in REGISTERS across the U sub-tiles.  The per-u VPU
        # gradient chains are mutually independent (no running softmax
        # state in the backward), so the scheduler has full freedom.
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        sts, dovts = [], []
        for u in range(unroll):
            q = qdo_refs[4 * u][0, 0]
            do = qdo_refs[4 * u + 1][0, 0]
            st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dovts.append(jax.lax.dot_general(
                v, do, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            if has_bias:
                q_start = pairs_ref[4 + u, t] * block_q
                kpos = jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, 1), 0) + k_start
                qpos = jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_q), 1) + q_start
                st_nat = masklib.apply_score_bias(
                    st, qpos, kpos, softmax_scale=softmax_scale,
                    offset=offset, params=params,
                    alibi_slope=slopes_ref[b, h] if has_alibi else None)
                sts.append((st_nat * LOG2E, st_nat))
            else:
                sts.append((st * (softmax_scale * LOG2E), None))
        dk_c = dk_acc[...]
        dv_c = dv_acc[...]
        for u in range(unroll):
            st2, st_nat = sts[u]
            lse_cols = qdo_refs[4 * u + 2][0, 0]
            delta_cols = qdo_refs[4 * u + 3][0, 0]
            pt = jnp.exp2(jnp.minimum(st2 - lse_cols, 0.0))
            do = qdo_refs[4 * u + 1][0, 0]
            dv_c = dv_c + jax.lax.dot_general(
                pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dst = _grad_scores(pt, pt, dovts[u], delta_cols, st_nat,
                               softmax_scale, params)
            q = qdo_refs[4 * u][0, 0]
            dk_c = dk_c + jax.lax.dot_general(
                dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dk_acc[...] = dk_c
        dv_acc[...] = dv_c

    def full_u(u):
        return masklib.block_fully_valid(
            pairs_ref[4 + u, t] * block_q, block_q, k_start, block_k,
            offset, params,
            seqlen_q=seqlen_q if padded_q else None,
            seqlen_k=seqlen_k if padded_k else None)

    def per_tile(u):
        q_ref, do_ref = qdo_refs[4 * u], qdo_refs[4 * u + 1]
        lse_ref, delta_ref = qdo_refs[4 * u + 2], qdo_refs[4 * u + 3]
        q_start = pairs_ref[4 + u, t] * block_q
        live = pairs_ref[4 + unroll + u, t] == 1
        args = (q_ref, do_ref, lse_ref, delta_ref, q_start)
        if params.needs_position_mask or padded_q or padded_k:
            full = full_u(u)

            @pl.when(live & full)
            def _fast():
                body(False, *args)

            @pl.when(live & jnp.logical_not(full))
            def _masked():
                body(True, *args)
        elif unroll > 1:
            @pl.when(live)
            def _live():
                body(False, *args)
        else:
            body(False, *args)

    if unroll > 1 and not has_dropout:
        all_full = pairs_ref[4 + unroll, t] == 1
        for u in range(1, unroll):
            all_full &= pairs_ref[4 + unroll + u, t] == 1
        if params.needs_position_mask or padded_q or padded_k:
            for u in range(unroll):
                all_full &= full_u(u)

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

    @pl.when(pairs_ref[3, t] == 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ======================================================================================
# Host wrapper
# ======================================================================================

def _pad_seq(x, target, axis):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attn_dense_bwd(
    q: jnp.ndarray,   # (B, M, Hq, D)
    k: jnp.ndarray,   # (B, N, Hk, D)
    v: jnp.ndarray,
    out: jnp.ndarray,  # (B, M, Hq, D)
    dout: jnp.ndarray,
    lse: jnp.ndarray,  # (B, Hq, M) fp32
    softmax_scale: float,
    params: masklib.MaskParams,
    alibi_slopes: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    dlse: Optional[jnp.ndarray] = None,  # (B, Hq, M) cotangent of lse
    offset: Optional[int] = None,
    pos_base=None,  # (q0, k0, b0, h0) traced int32 scalars (ring attention)
    num_heads_total: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (dq, dk, dv) in the input layouts/dtypes.

    The lse cotangent folds into the score gradient as dS += P * dlse, i.e.
    delta' = delta - dlse (since dS = P_drop*dOV - P*delta): composed losses
    that consume lse directly (ring attention's merge, distillation on lse)
    differentiate exactly."""
    B, M, Hq, D = q.shape
    N, Hk = k.shape[1], k.shape[2]
    group = Hq // Hk
    if interpret is None:
        interpret = use_interpret()
    bs = block_sizes or BlockSizes.for_shape(M, N, D)

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    dot_ = jnp.swapaxes(dout, 1, 2)

    # delta = rowsum(O * dO): fused XLA reduce (reference computes it
    # in-kernel at kernel/fused_mha_backward.cu:160-162).
    delta = jnp.sum(out.astype(jnp.float32) * dout.astype(jnp.float32), axis=-1)
    delta = jnp.swapaxes(delta, 1, 2)  # (B, Hq, M)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    # the kernels recompute P in the exp2 domain: pre-scale lse by log2e.
    # Fully-masked rows have lse = -inf; +inf would also work (p = 0 via the
    # min(., 0)), but keep NEG_INF-clamped finite arithmetic.
    lse2 = jnp.maximum(lse, NEG_INF) * LOG2E

    if offset is None:
        offset = N - M
    if num_heads_total is None:
        num_heads_total = Hq
    wr = params.effective_window_right()
    wl = params.window_left

    def feature_specs():
        from flash_attn_v100_tpu.ops.pallas.fwd import build_seed_vec
        in_specs, inputs = [], []
        if params.has_alibi:
            assert alibi_slopes is not None and alibi_slopes.shape == (B, Hq)
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.append(alibi_slopes.astype(jnp.float32))
        if dropout_p > 0.0:
            assert dropout_seed is not None
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.append(build_seed_vec(dropout_seed, pos_base))
        return in_specs, inputs

    # ---- dQ pass ----
    bq, bk = bs.block_q_dq, bs.block_k_dq
    Mp, Np = round_up(M, bq), round_up(N, bk)
    qp = _pad_seq(qt, Mp, 2)
    dop = _pad_seq(dot_, Mp, 2)
    kp = _pad_seq(kt, Np, 2)
    vp = _pad_seq(vt, Np, 2)
    lsep = _pad_seq(lse2, Mp, 2)[..., None]    # (B, Hq, Mp, 1)
    deltap = _pad_seq(delta, Mp, 2)[..., None]

    num_q_blocks, num_kv_blocks = Mp // bq, Np // bk
    feat_specs, feat_inputs = feature_specs()

    # flattened UNROLLED live-pair grid (same construction as the forward);
    # U=2 engages the pipelined straight-line fast path (r4 A/B:
    # benchmarks/prof_bwd_unroll.py); dropout rides it too since r5
    from flash_attn_v100_tpu.ops.pallas.fwd import live_pairs_unrolled
    U = 2 if num_kv_blocks > 1 else 1
    pairs_np = live_pairs_unrolled(
        num_q_blocks, num_kv_blocks, bq, bk, offset, params, U)

    qmap = lambda b, h, t, mp_: (b, h, mp_[0, t], 0)
    kv_specs = []
    for u in range(U):
        kmap_u = (lambda u: lambda b, h, t, mp_:
                  (b, h // group, mp_[3 + u, t], 0))(u)
        kv_specs += [pl.BlockSpec((1, 1, bk, D), kmap_u),
                     pl.BlockSpec((1, 1, bk, D), kmap_u)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hq, pairs_np.shape[1]),
        in_specs=feat_specs + [
            pl.BlockSpec((1, 1, bq, D), qmap),
        ] + kv_specs + [
            pl.BlockSpec((1, 1, bq, D), qmap),
            pl.BlockSpec((1, 1, bq, 1), qmap),
            pl.BlockSpec((1, 1, bq, 1), qmap),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), qmap),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, params=params, softmax_scale=softmax_scale,
            dropout_p=dropout_p, seqlen_q=M, seqlen_k=N,
            num_heads=num_heads_total, block_q=bq, block_k=bk, offset=offset,
            unroll=U,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Mp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(pairs_np), *feat_inputs, qp,
      *([kp, vp] * U), dop, lsep, deltap)
    dq = jnp.swapaxes(dq[:, :, :M], 1, 2)

    # ---- dKV pass ----
    bq, bk = bs.block_q_dkv, bs.block_k_dkv
    Mp, Np = round_up(M, bq), round_up(N, bk)
    qp = _pad_seq(qt, Mp, 2)
    dop = _pad_seq(dot_, Mp, 2)
    kp = _pad_seq(kt, Np, 2)
    vp = _pad_seq(vt, Np, 2)
    lsep = _pad_seq(lse2, Mp, 2)[:, :, None, :]    # (B, Hq, 1, Mp)
    deltap = _pad_seq(delta, Mp, 2)[:, :, None, :]

    num_q_blocks, num_kv_blocks = Mp // bq, Np // bk

    # flattened live-triple grid (transposed trim, GQA group innermost).
    # U=2 pipelining was A/B'd NEGATIVE here (13.77 -> 14.00 ms causal
    # fwd+bwd; dkv (512,1024)/(1024,512) variants no better): unlike the
    # dq pass, each dkv sub-tile streams FOUR per-u operands (q, do, lse,
    # delta), so unrolling doubles the DMA bytes per step and the overlap
    # win drowns.  The unrolled kernel ships at U=1 (identical behavior).
    U = 1
    pairs_np = live_pairs_dkv_unrolled(
        num_q_blocks, num_kv_blocks, group, bq, bk, offset, params, U)

    def kmap(b, hk, t, mp_):
        return (b, hk, mp_[0, t], 0)

    qdo_specs = []
    for u in range(U):
        qmap_u = (lambda u: lambda b, hk, t, mp_:
                  (b, hk * group + mp_[1, t], mp_[4 + u, t], 0))(u)
        lmap_u = (lambda u: lambda b, hk, t, mp_:
                  (b, hk * group + mp_[1, t], 0, mp_[4 + u, t]))(u)
        qdo_specs += [pl.BlockSpec((1, 1, bq, D), qmap_u),
                      pl.BlockSpec((1, 1, bq, D), qmap_u),
                      pl.BlockSpec((1, 1, 1, bq), lmap_u),
                      pl.BlockSpec((1, 1, 1, bq), lmap_u)]

    feat_specs, feat_inputs = feature_specs()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hk, pairs_np.shape[1]),
        in_specs=feat_specs + [
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
        ] + qdo_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, params=params, softmax_scale=softmax_scale,
            dropout_p=dropout_p, seqlen_q=M, seqlen_k=N,
            num_heads=num_heads_total, group=group, block_q=bq, block_k=bk,
            offset=offset, unroll=U,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, Hk, Np, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hk, Np, D), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(pairs_np), *feat_inputs, kp, vp,
      *([qp, dop, lsep, deltap] * U))
    dk = jnp.swapaxes(dk[:, :, :N], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :N], 1, 2)

    return dq, dk, dv
