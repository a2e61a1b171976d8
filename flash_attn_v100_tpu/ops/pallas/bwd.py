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


def live_pairs_dkv(num_q_blocks: int, num_kv_blocks: int, group: int,
                   block_q: int, block_k: int, offset: int,
                   params: masklib.MaskParams):
    """Static enumeration of live (kv-tile, q-head-in-group, q-tile) triples
    for the KV-centric backward — the transposed form of fwd.live_pairs.
    Returns int32 arrays (ki, h_off=g, qi, first, last) ordered by ki."""
    wr = params.effective_window_right()
    wl = params.window_left
    kis, gs, qis, firsts, lasts = [], [], [], [], []
    for ki in range(num_kv_blocks):
        lo, hi = 0, num_q_blocks - 1
        if wr >= 0:
            lo = max(lo, (ki * block_k - offset - wr) // block_q)
        if wl >= 0:
            hi = min(hi, (ki * block_k + block_k - 1 - offset + wl) // block_q)
        if hi < lo:          # no live q: placeholder (masked body -> zeros)
            lo = hi = min(max(lo, 0), num_q_blocks - 1)
        lo = max(lo, 0)
        for g in range(group):
            for qi in range(lo, hi + 1):
                kis.append(ki)
                gs.append(g)
                qis.append(qi)
                firsts.append(1 if (g == 0 and qi == lo) else 0)
                lasts.append(1 if (g == group - 1 and qi == hi) else 0)
    return (np.asarray(kis, np.int32), np.asarray(gs, np.int32),
            np.asarray(qis, np.int32), np.asarray(firsts, np.int32),
            np.asarray(lasts, np.int32))


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
    # scalar prefetch: flattened live-pair maps (see fwd.live_pairs)
    qi_ref, ki_ref, first_ref, last_ref,
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
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc = refs[idx:]

    b, h, t = (pl.program_id(i) for i in range(3))
    qi = qi_ref[t]
    ki = ki_ref[t]
    q_start = qi * block_q
    k_start = ki * block_k
    padded_q = seqlen_q % block_q != 0
    padded_k = seqlen_k % block_k != 0

    @pl.when(first_ref[t] == 1)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    def body(masked: bool):
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

    if params.needs_position_mask or padded_q or padded_k:
        full = masklib.block_fully_valid(
            q_start, block_q, k_start, block_k, offset, params,
            seqlen_q=seqlen_q if padded_q else None,
            seqlen_k=seqlen_k if padded_k else None)

        @pl.when(full)
        def _fast():
            body(masked=False)

        @pl.when(jnp.logical_not(full))
        def _masked():
            body(masked=True)
    else:
        body(masked=False)

    @pl.when(last_ref[t] == 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


# ======================================================================================
# dKV kernel: kv-centric, iterates (q-head-in-group, q-tile) on the inner axis
# ======================================================================================

def _dkv_kernel(
    # scalar prefetch: flattened live-triple maps (see live_pairs_dkv)
    ki_ref, g_ref, qi_ref, first_ref, last_ref,
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
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs[idx:]

    b, hk, t = (pl.program_id(i) for i in range(3))
    ki = ki_ref[t]
    qi = qi_ref[t]
    h = hk * group + g_ref[t]
    q_start = qi * block_q
    k_start = ki * block_k
    padded_q = seqlen_q % block_q != 0
    padded_k = seqlen_k % block_k != 0

    @pl.when(first_ref[t] == 1)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def body(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]

        # S^T tile: rows = kv positions, cols = q positions
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (bk, bq)
        need_pos = has_alibi or has_dropout
        if need_pos:
            kpos = jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0) + k_start
            qpos = jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1) + q_start
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

    if params.needs_position_mask or padded_q or padded_k:
        full = masklib.block_fully_valid(
            q_start, block_q, k_start, block_k, offset, params,
            seqlen_q=seqlen_q if padded_q else None,
            seqlen_k=seqlen_k if padded_k else None)

        @pl.when(full)
        def _fast():
            body(masked=False)

        @pl.when(jnp.logical_not(full))
        def _masked():
            body(masked=True)
    else:
        body(masked=False)

    @pl.when(last_ref[t] == 1)
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

    # flattened live-pair grid (same construction as the forward)
    from flash_attn_v100_tpu.ops.pallas.fwd import live_pairs
    qi_of, ki_of, first_of, last_of = live_pairs(
        num_q_blocks, num_kv_blocks, bq, bk, offset, params)

    qmap = lambda b, h, t, qi, ki, f, l: (b, h, qi[t], 0)
    kmap = lambda b, h, t, qi, ki, f, l: (b, h // group, ki[t], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, Hq, len(qi_of)),
        in_specs=feat_specs + [
            pl.BlockSpec((1, 1, bq, D), qmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
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
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Mp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(qi_of), jnp.asarray(ki_of), jnp.asarray(first_of),
      jnp.asarray(last_of), *feat_inputs, qp, kp, vp, dop, lsep, deltap)
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

    # flattened live-triple grid (transposed trim, GQA group innermost)
    ki_of, g_of, qi_of, first_of, last_of = live_pairs_dkv(
        num_q_blocks, num_kv_blocks, group, bq, bk, offset, params)

    def qmap(b, hk, t, ki, g, qi, f, l):
        return (b, hk * group + g[t], qi[t], 0)

    def lmap(b, hk, t, ki, g, qi, f, l):
        return (b, hk * group + g[t], 0, qi[t])

    def kmap(b, hk, t, ki, g, qi, f, l):
        return (b, hk, ki[t], 0)

    feat_specs, feat_inputs = feature_specs()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, Hk, len(ki_of)),
        in_specs=feat_specs + [
            pl.BlockSpec((1, 1, bq, D), qmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bk, D), kmap),
            pl.BlockSpec((1, 1, bq, D), qmap),
            pl.BlockSpec((1, 1, 1, bq), lmap),
            pl.BlockSpec((1, 1, 1, bq), lmap),
        ],
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
            offset=offset,
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
    )(jnp.asarray(ki_of), jnp.asarray(g_of), jnp.asarray(qi_of),
      jnp.asarray(first_of), jnp.asarray(last_of),
      *feat_inputs, qp, kp, vp, dop, lsep, deltap)
    dk = jnp.swapaxes(dk[:, :, :N], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :N], 1, 2)

    return dq, dk, dv
