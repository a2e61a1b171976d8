"""Shared score pipeline: scale -> ALiBi -> softcap -> mask, plus tile-level
block-range trimming.

This is the TPU re-design of two reference components:
  * the fused per-element mask/bias application inside the scores GEMM
    (reference: include/mat_mul.h:82-157) — here a pure-jnp function applied to
    the (block_q, block_k) scores tile inside every Pallas kernel, and
  * `BlockInfo`'s causal/window block-range trim (reference:
    include/template.h:98-111) — here `block_overlaps`, evaluated per grid cell
    to skip fully-masked tiles (`pl.when`), the Pallas analog of trimming the
    KV loop range.

Conventions (identical to the reference):
  offset = seqlen_k - seqlen_q  (bottom-right aligned causal)
  causal  masks  col - offset >  row
  window  masks  col - offset <  row - window_left   (window_left  >= 0)
                 col - offset >  row + window_right  (window_right >= 0)
  bias order: s*scale, then -slope*|row-(col-offset)|, then softcap*tanh(./cap)
  masked -> NEG_INF (-1e30, not -inf: reference include/kernel.h:20)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.config import NEG_INF


@dataclasses.dataclass(frozen=True)
class MaskParams:
    """Static (compile-time) feature flags — the analog of the reference's
    bool-pack template dispatch (reference: include/template.h:248-291)."""

    causal: bool = False
    window_left: int = -1
    window_right: int = -1
    softcap: float = 0.0
    has_alibi: bool = False

    @property
    def needs_position_mask(self) -> bool:
        return self.causal or self.window_left >= 0 or self.window_right >= 0

    def effective_window_right(self) -> int:
        """causal == window_right 0 for range trimming purposes."""
        if self.causal:
            return 0 if self.window_right < 0 else min(0, self.window_right)
        return self.window_right


def position_ids(block_q: int, block_k: int, q_start, k_start):
    """Absolute (row, col) position ids for a (block_q, block_k) score
    tile whose top-left element is (q_start, k_start), as BROADCASTABLE
    vectors ((block_q, 1) rows, (1, block_k) cols) — every consumer
    (ALiBi's |row - col + off| bias, the position masks, the dropout hash)
    is elementwise over the broadcast, and vector iotas keep the VPU cost
    O(R + C) instead of O(R*C) per tile."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + q_start
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) + k_start
    return rows, cols


def apply_score_bias(
    s: jnp.ndarray,
    rows,  # absolute q positions (only read when has_alibi)
    cols,  # absolute k positions (only read when has_alibi)
    *,
    softmax_scale: float,
    offset,
    params: MaskParams,
    alibi_slope=None,
) -> jnp.ndarray:
    """The bias half of the pipeline: scale -> ALiBi -> softcap.  Applies to
    every element regardless of masking."""
    s = s * softmax_scale
    if params.has_alibi:
        dist = jnp.abs(rows - (cols - offset)).astype(jnp.float32)
        s = s - alibi_slope * dist
    if params.softcap > 0.0:
        s = params.softcap * jnp.tanh(s * (1.0 / params.softcap))
    return s


def position_mask(
    rows, cols, *, seqlen_q, seqlen_k, offset, params: MaskParams,
) -> jnp.ndarray:
    """The mask half: bounds + causal/window validity (True = attend)."""
    valid = (cols < seqlen_k) & (rows < seqlen_q)
    rel = cols - offset
    if params.causal:
        valid &= rel <= rows
    if params.window_left >= 0:
        valid &= rel >= rows - params.window_left
    if params.window_right >= 0:
        valid &= rel <= rows + params.window_right
    return valid


def position_mask_local(
    block_q: int, block_k: int, q_start, k_start, offset, params: MaskParams,
    seqlen_q=None, seqlen_k=None, transposed: bool = False,
) -> jnp.ndarray:
    """`position_mask` in block-local form: causal/window compare against the
    STATIC tile `col - row` (loop-invariant, so Mosaic materializes it once)
    with scalar thresholds — 1-2 VPU compares per masked tile instead of the
    absolute-position iota pipeline.  Bounds terms (only when an axis is
    padded) still need a single-axis iota each.

    transposed=True returns the (block_k, block_q) mask (kv rows, q cols) for
    KV-centric kernels — built directly with swapped iota axes because Mosaic
    cannot transpose i1 vectors."""
    if transposed:
        q_axis, k_axis = 1, 0
        shape = (block_k, block_q)
    else:
        q_axis, k_axis = 0, 1
        shape = (block_q, block_k)
    diff = (jax.lax.broadcasted_iota(jnp.int32, shape, k_axis)
            - jax.lax.broadcasted_iota(jnp.int32, shape, q_axis))
    # col - offset <= row  <=>  diff <= q_start - k_start + offset
    thr = q_start - k_start + offset
    valid = None

    def conj(a, b):
        return b if a is None else a & b

    if params.causal:
        valid = conj(valid, diff <= thr)
    if params.window_left >= 0:
        valid = conj(valid, diff >= thr - params.window_left)
    if params.window_right >= 0:
        valid = conj(valid, diff <= thr + params.window_right)
    if seqlen_k is not None:
        kpos = jax.lax.broadcasted_iota(jnp.int32, shape, k_axis)
        valid = conj(valid, kpos < seqlen_k - k_start)
    if seqlen_q is not None:
        qpos = jax.lax.broadcasted_iota(jnp.int32, shape, q_axis)
        valid = conj(valid, qpos < seqlen_q - q_start)
    if valid is None:
        valid = jnp.ones(shape, jnp.bool_)
    return valid


def apply_score_pipeline(
    s: jnp.ndarray,  # (block_q, block_k) raw QK^T, fp32
    rows: jnp.ndarray,  # absolute q positions, int32, same shape
    cols: jnp.ndarray,  # absolute k positions, int32, same shape
    *,
    softmax_scale: float,
    seqlen_q,
    seqlen_k,
    offset,  # seqlen_k - seqlen_q (may be traced for varlen)
    params: MaskParams,
    alibi_slope=None,  # traced scalar when params.has_alibi
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (biased scores fp32 with masked -> NEG_INF, valid bool mask)."""
    s = apply_score_bias(s, rows, cols, softmax_scale=softmax_scale,
                         offset=offset, params=params, alibi_slope=alibi_slope)
    valid = position_mask(rows, cols, seqlen_q=seqlen_q, seqlen_k=seqlen_k,
                          offset=offset, params=params)
    s = jnp.where(valid, s, NEG_INF)
    return s, valid


def block_fully_valid(
    q_start, q_rows: int, k_start, k_cols: int, offset, params: MaskParams,
    seqlen_q=None, seqlen_k=None,
):
    """Whether EVERY element of a (q tile, kv tile) pair is unmasked — the
    fast-path predicate: such tiles skip the whole iota/compare/where mask
    pipeline (the dominant VPU cost of interior blocks on long sequences).
    Pass seqlen_q/seqlen_k only when the respective axis is padded."""
    full = True
    if seqlen_q is not None:
        full = jnp.logical_and(full, q_start + q_rows <= seqlen_q)
    if seqlen_k is not None:
        full = jnp.logical_and(full, k_start + k_cols <= seqlen_k)
    wr = params.effective_window_right()
    if wr >= 0:
        # worst case: largest col against smallest row
        full = jnp.logical_and(full, k_start + k_cols - 1 - offset <= q_start + wr)
    if params.window_left >= 0:
        # worst case: smallest col against largest row
        full = jnp.logical_and(
            full, k_start - offset >= q_start + q_rows - 1 - params.window_left)
    return full


def apply_score_pipeline_ragged(
    s: jnp.ndarray,       # (R, C) raw scores tile, fp32
    q_pos,                # (R, 1) int32 within-sequence q positions
    k_pos,                # (1, C) int32 within-sequence k positions
    q_seg,                # (R, 1) int32 sequence ids (-1 = padding)
    k_seg,                # (1, C) int32 sequence ids (-1 = padding/unused)
    offs,                 # (R, 1) int32 per-row seqlen_k - seqlen_q of the row's sequence
    *,
    softmax_scale: float,
    params: MaskParams,
    alibi_slope=None,     # scalar or (R, 1)/(1, C) per-token slopes
):
    """Ragged-batch version of the score pipeline: the varlen `BlockInfo` role
    (reference: include/template.h:55-69, kernel/fused_mha_forward_varlen.cu)
    recast as per-token (segment, position) vectors.  All ragged bookkeeping
    is precomputed host-side into O(T) int32 vectors; the kernel applies pure
    elementwise ops — no device-side cu_seqlens walking.

    Same bias order/conventions as `apply_score_pipeline`; the bottom-right
    causal offset varies per row (`offs`).
    """
    s = s * softmax_scale

    rel = k_pos - offs  # (R, C) key position in the q-aligned frame

    if params.has_alibi:
        dist = jnp.abs(q_pos - rel).astype(jnp.float32)
        s = s - alibi_slope * dist

    if params.softcap > 0.0:
        s = params.softcap * jnp.tanh(s * (1.0 / params.softcap))

    valid = (q_seg == k_seg) & (q_seg >= 0)
    if params.causal:
        valid &= rel <= q_pos
    if params.window_left >= 0:
        valid &= rel >= q_pos - params.window_left
    if params.window_right >= 0:
        valid &= rel <= q_pos + params.window_right

    s = jnp.where(valid, s, NEG_INF)
    return s, valid


def ragged_causal_overlaps(q_pos, offs, k_pos, q_seg, k_seg,
                           params: MaskParams):
    """Causal/window trim for ragged tiles: True if any (row, col) pair can
    be unmasked by the POSITION rules (the segment rule is
    `ragged_block_overlaps`).  Conservative across segments: uses tile-wide
    bounds of within-sequence positions, exact for the common one-segment
    tile.  The varlen analog of the dense `block_overlaps` trim."""
    big = jnp.int32(2 ** 30)
    run = True
    q_valid = q_seg >= 0
    k_valid = k_seg >= 0
    # rel(r, c) = k_pos[c] - offs[r]; masked-causal when rel > q_pos[r]
    wr = params.effective_window_right()
    if wr >= 0:
        kmin = jnp.min(jnp.where(k_valid, k_pos, big))
        qmax = jnp.max(jnp.where(q_valid, q_pos + offs, -big))
        run = jnp.logical_and(run, kmin <= qmax + wr)
    if params.window_left >= 0:
        kmax = jnp.max(jnp.where(k_valid, k_pos, -big))
        qmin = jnp.min(jnp.where(q_valid, q_pos + offs, big))
        run = jnp.logical_and(run, kmax >= qmin - params.window_left)
    return run


def ragged_block_overlaps(q_seg_tile, k_seg_tile):
    """Tile-skip predicate for packed batches: do any q rows and k cols of
    this tile pair belong to a common sequence?  Sequences are contiguous in
    the packed layout, so segment-range overlap is exact.  The varlen analog
    of the dense block trim (reference varlen early-exit:
    kernel/fused_mha_forward_varlen.cu:94-111)."""
    big = jnp.int32(2 ** 30)
    q_valid = q_seg_tile >= 0
    k_valid = k_seg_tile >= 0
    qmin = jnp.min(jnp.where(q_valid, q_seg_tile, big))
    qmax = jnp.max(jnp.where(q_valid, q_seg_tile, -1))
    kmin = jnp.min(jnp.where(k_valid, k_seg_tile, big))
    kmax = jnp.max(jnp.where(k_valid, k_seg_tile, -1))
    return (qmax >= kmin) & (qmin <= kmax) & (qmax >= 0) & (kmax >= 0)


def block_overlaps(
    q_start, q_rows: int, k_start, k_cols: int, offset, params: MaskParams,
    seqlen_k=None,
):
    """Whether a (q tile, kv tile) pair has any unmasked element — the
    `block_min/block_max` trim of the reference (include/template.h:98-111)
    recast as a per-tile predicate for `pl.when`.

    q tile covers rows [q_start, q_start+q_rows), kv tile cols
    [k_start, k_start+k_cols).  All args may be traced scalars.
    """
    run = True
    wr = params.effective_window_right()
    if wr >= 0:
        # rightmost col any row in this q tile may see
        run = jnp.logical_and(run, k_start <= q_start + q_rows - 1 + offset + wr)
    if params.window_left >= 0:
        # leftmost col any row in this q tile may see
        run = jnp.logical_and(
            run, k_start + k_cols - 1 >= q_start + offset - params.window_left
        )
    if seqlen_k is not None:
        run = jnp.logical_and(run, k_start < seqlen_k)
    return run
