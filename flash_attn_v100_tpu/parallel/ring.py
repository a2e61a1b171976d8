"""Ring attention: sequence-parallel exact attention over the ICI ring.

The reference cannot do this (single GPU), but it ships the composition
primitive: every forward returns fp32 LSE
(reference: kernel/fused_mha_forward.cu:431), and the per-block online-softmax
merge (include/softmax.h:13-19) is associative.  Ring attention is that merge
lifted across chips: KV shards rotate around the ring via `jax.lax.ppermute`
(point-to-point, neighbor-only — full ICI bisection) while each chip runs the
local Pallas flash kernel on the chunk in front of it, then folds the chunk's
(O, lse) into its running pair.

Design (round 2):
  * STREAMING backward (memory O(2 chunks)/chip, not O(full KV)): a custom
    VJP whose residuals are only the chip-local (q, k, v, o, lse).  The
    backward runs a second ring pass — dK/dV accumulators ROTATE WITH their
    kv chunk and arrive home after n steps, dQ accumulates in place.  The
    per-chunk gradient is the dense flash backward with the GLOBAL lse/delta
    (exactly the reference's dS = P∘(dOV − delta) math, fused_mha_backward.cu
    :160-162, applied chunk-locally — valid because lse is global).
  * Comm-first scheduling: each step issues the next chunk's ppermute BEFORE
    the current chunk's kernel so XLA's latency-hiding scheduler overlaps the
    ICI transfer with attention compute (double-buffered in program order).
  * Feature parity with the dense kernel: window/softcap/alibi/dropout are
    plumbed through chunk-local calls ("contiguous" layout).  Masks and
    ALiBi use a per-step STATIC global offset (q_start − k_start of the
    pair); dropout replays the exact single-chip Philox mask via global
    position/head bases (ops/pallas/fwd.py `build_seed_vec`).  Chunks
    statically outside the window are skipped without compute.
  * "zigzag" layout for causal load balance: chip i holds sequence stripes
    (i, 2n−1−i).  Every step is then exactly half a chunk of work per chip:
      step 0    : local causal over the concatenated stripes (relative order
                  inside the concat matches global order — exact);
      src j < i : ALL local q attend the chunk's FIRST stripe (fully past);
      src j > i : the SECOND local q stripe attends the FULL chunk.
    Zigzag is causal-only and position-feature-free (softcap ok; window/
    alibi/dropout need contiguous positions — use layout="contiguous").

Causal skip logic per (q chip my, step s) — all static inside the cond
branches: the chunk came from chip (my − s) mod n, so `my >= s` ⇔ past.
This is the cross-chip analog of the reference's block-range trim
(include/template.h:98-111).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flash_attn_v100_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS, MODEL_AXIS
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
from flash_attn_v100_tpu.ops.pallas.bwd import flash_attn_dense_bwd


def _merge_pair(o_a, lse_a, o_b, lse_b):
    """Fold two normalized (O, lse) partials (lse shape (..., 1))."""
    m = jnp.maximum(lse_a, lse_b)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    wa = jnp.where(jnp.isfinite(lse_a), jnp.exp(lse_a - m_safe), 0.0)
    wb = jnp.where(jnp.isfinite(lse_b), jnp.exp(lse_b - m_safe), 0.0)
    wsum = wa + wb
    o = (o_a * wa + o_b * wb) / jnp.where(wsum == 0.0, 1.0, wsum)
    lse = jnp.where(wsum == 0.0, -jnp.inf, m_safe + jnp.log(jnp.where(wsum == 0.0, 1.0, wsum)))
    return o, lse


@dataclasses.dataclass(frozen=True)
class _RingCfg:
    """Static ring configuration (hashable: custom_vjp nondiff arg)."""
    axis_name: str
    axis_size: int
    causal: bool
    softmax_scale: float
    window_left: int
    window_right: int
    softcap: float
    has_alibi: bool
    dropout_p: float
    layout: str            # "contiguous" | "zigzag"
    interpret: Optional[bool]
    num_heads_total: int = 0

    def params(self, causal: bool) -> masklib.MaskParams:
        return masklib.MaskParams(
            causal=causal, window_left=self.window_left,
            window_right=self.window_right, softcap=self.softcap,
            has_alibi=self.has_alibi)

    @property
    def pos_features(self) -> bool:
        return (self.has_alibi or self.dropout_p > 0.0
                or self.window_left >= 0 or self.window_right >= 0)


def _step_plan(cfg: _RingCfg, s: int, c: int):
    """Static per-step plan for the contiguous layout.

    Returns (past_offset, future_offset) where an offset of None means that
    branch's chunk is fully masked (skip without compute).  Offsets are the
    global q_start − k_start of the pair; fully-visible past/future chunks
    canonicalize to ±c when offsets are mask-irrelevant, so all "interior"
    ring steps share one compiled kernel."""
    n = cfg.axis_size
    wl, wr = cfg.window_left, cfg.window_right
    wr_eff = 0 if cfg.causal else wr

    past = s * c
    if wl >= 0 and past > c - 1 + wl:
        past = None                      # entirely behind the window
    elif not (cfg.has_alibi or wl >= 0 or (wr >= 0 and not cfg.causal)):
        past = c                         # canonical "any fully-past" offset

    fut_dist = (n - s) * c               # k_start - q_start of a future chunk
    if wr_eff >= 0 and fut_dist > c - 1 + wr_eff:
        future = None                    # causal, or beyond window_right
    else:
        future = (s - n) * c
        if not (cfg.has_alibi or wr >= 0 or wl >= 0):
            future = -c
    return past, future


def _chunk_fwd(cfg: _RingCfg, q, kb, vb, slopes, seed, offset, causal,
               pos_base):
    out, lse = flash_attn_dense_fwd(
        q, kb, vb, cfg.softmax_scale, cfg.params(causal),
        alibi_slopes=slopes, dropout_p=cfg.dropout_p, dropout_seed=seed,
        interpret=cfg.interpret, offset=offset, pos_base=pos_base,
        num_heads_total=cfg.num_heads_total or None)
    lse = jnp.transpose(lse, (0, 2, 1))[..., None]   # (B, m, H, 1)
    return out.astype(jnp.float32), lse


def _chunk_bwd(cfg: _RingCfg, q, kb, vb, o, do, lse_bhm, slopes, seed,
               offset, causal, pos_base):
    return flash_attn_dense_bwd(
        q, kb, vb, o, do, lse_bhm, cfg.softmax_scale, cfg.params(causal),
        alibi_slopes=slopes, dropout_p=cfg.dropout_p, dropout_seed=seed,
        interpret=cfg.interpret, offset=offset, pos_base=pos_base,
        num_heads_total=cfg.num_heads_total or None)


def _empty_partial(q, v):
    return (jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32),
            jnp.full(q.shape[:3] + (1,), -jnp.inf, jnp.float32))


def _ring_fwd_loop(cfg: _RingCfg, q, k, v, slopes, seed, b0, h0):
    """Forward ring pass.  Returns (o fp32 (B,m,H,D), lse (B,m,H,1))."""
    n = cfg.axis_size
    my = jax.lax.axis_index(cfg.axis_name)
    m, c = q.shape[1], k.shape[1]
    hs = m // 2
    perm = [(i, (i + 1) % n) for i in range(n)]

    o_acc, lse_acc = _empty_partial(q, v)
    k_blk, v_blk = k, v

    for s in range(n):
        # comm first: the NEXT chunk's ppermute is issued before this step's
        # kernel so the ICI transfer overlaps the attention compute
        if s < n - 1:
            k_nxt = jax.lax.ppermute(k_blk, cfg.axis_name, perm)
            v_nxt = jax.lax.ppermute(v_blk, cfg.axis_name, perm)

        if cfg.layout == "zigzag":
            if s == 0:
                o_new, lse_new = _chunk_fwd(cfg, q, k_blk, v_blk, slopes,
                                            seed, 0, cfg.causal, None)
            else:
                def past_fn(kb, vb):      # src < my: attend FIRST kv stripe
                    return _chunk_fwd(cfg, q, kb[:, :hs], vb[:, :hs],
                                      slopes, seed, None, False, None)

                def fut_fn(kb, vb):       # src > my: 2nd q stripe, full kv
                    o_h, lse_h = _chunk_fwd(cfg, q[:, hs:], kb, vb,
                                            slopes, seed, None, False, None)
                    o_e, lse_e = _empty_partial(q[:, :hs], vb)
                    return (jnp.concatenate([o_e, o_h], axis=1),
                            jnp.concatenate([lse_e, lse_h], axis=1))

                o_new, lse_new = jax.lax.cond(my >= s, past_fn, fut_fn,
                                              k_blk, v_blk)
        else:
            if s == 0:
                pos = ((my * m, my * c, b0, h0) if cfg.pos_features else None)
                o_new, lse_new = _chunk_fwd(cfg, q, k_blk, v_blk, slopes,
                                            seed, 0, cfg.causal, pos)
            else:
                past_off, fut_off = _step_plan(cfg, s, c)

                def attend(off, src):
                    def fn(kb, vb):
                        pos = ((my * m, src * c, b0, h0)
                               if cfg.pos_features else None)
                        return _chunk_fwd(cfg, q, kb, vb, slopes, seed,
                                          off, cfg.causal, pos)
                    return fn

                def skip(kb, vb):
                    return _empty_partial(q, vb)

                past_fn = skip if past_off is None else attend(past_off, my - s)
                fut_fn = skip if fut_off is None else attend(fut_off, my - s + n)
                if past_off is None and fut_off is None:
                    o_new = None
                else:
                    o_new, lse_new = jax.lax.cond(my >= s, past_fn, fut_fn,
                                                  k_blk, v_blk)
        if o_new is not None:
            o_acc, lse_acc = _merge_pair(o_acc, lse_acc, o_new, lse_new)

        if s < n - 1:
            # double-buffer barrier: without it XLA's scheduler hoists the
            # whole rotation chain to the front of the program (all n
            # transfers serialized before any attention, n live KV copies —
            # verified on the AOT v5e schedule).  Tying the rotated chunk to
            # this step's accumulator makes rotation s+1 issue after
            # attention s and fly during attention s+1.
            k_nxt, v_nxt, o_acc, lse_acc = jax.lax.optimization_barrier(
                (k_nxt, v_nxt, o_acc, lse_acc))
            k_blk, v_blk = k_nxt, v_nxt
    return o_acc, lse_acc


def _ring_bwd_loop(cfg: _RingCfg, q, k, v, o, lse, do, slopes, seed, b0, h0):
    """Backward ring pass (streaming): dK/dV accumulators rotate with their
    chunk; after n rotations every chunk's gradients are home."""
    n = cfg.axis_size
    my = jax.lax.axis_index(cfg.axis_name)
    m, c = q.shape[1], k.shape[1]
    hs = m // 2
    perm = [(i, (i + 1) % n) for i in range(n)]

    lse_bhm = jnp.transpose(lse[..., 0], (0, 2, 1))   # (B, H, m)
    dq = jnp.zeros(q.shape, jnp.float32)
    dk_rot = jnp.zeros(k.shape, jnp.float32)
    dv_rot = jnp.zeros(v.shape, jnp.float32)
    k_blk, v_blk = k, v

    def zeros3(kb):
        return (jnp.zeros(q.shape, jnp.float32),
                jnp.zeros(kb.shape, jnp.float32),
                jnp.zeros(kb.shape, jnp.float32))

    for s in range(n):
        if s < n - 1:
            k_nxt = jax.lax.ppermute(k_blk, cfg.axis_name, perm)
            v_nxt = jax.lax.ppermute(v_blk, cfg.axis_name, perm)

        if cfg.layout == "zigzag":
            if s == 0:
                dq_s, dk_s, dv_s = _chunk_bwd(
                    cfg, q, k_blk, v_blk, o, do, lse_bhm, slopes, seed,
                    0, cfg.causal, None)
            else:
                def past_fn(kb, vb):
                    dq_f, dk_h, dv_h = _chunk_bwd(
                        cfg, q, kb[:, :hs], vb[:, :hs], o, do, lse_bhm,
                        slopes, seed, None, False, None)
                    z = jnp.zeros_like(dk_h)
                    return (dq_f.astype(jnp.float32),
                            jnp.concatenate([dk_h.astype(jnp.float32), z], 1),
                            jnp.concatenate([dv_h.astype(jnp.float32), z], 1))

                def fut_fn(kb, vb):
                    dq_h, dk_f, dv_f = _chunk_bwd(
                        cfg, q[:, hs:], kb, vb, o[:, hs:], do[:, hs:],
                        lse_bhm[:, :, hs:], slopes, seed, None, False, None)
                    zq = jnp.zeros_like(dq_h, jnp.float32)
                    return (jnp.concatenate([zq, dq_h.astype(jnp.float32)], 1),
                            dk_f.astype(jnp.float32),
                            dv_f.astype(jnp.float32))

                dq_s, dk_s, dv_s = jax.lax.cond(my >= s, past_fn, fut_fn,
                                                k_blk, v_blk)
        else:
            if s == 0:
                pos = ((my * m, my * c, b0, h0) if cfg.pos_features else None)
                dq_s, dk_s, dv_s = _chunk_bwd(
                    cfg, q, k_blk, v_blk, o, do, lse_bhm, slopes, seed,
                    0, cfg.causal, pos)
            else:
                past_off, fut_off = _step_plan(cfg, s, c)

                def grad(off, src):
                    def fn(kb, vb):
                        pos = ((my * m, src * c, b0, h0)
                               if cfg.pos_features else None)
                        g = _chunk_bwd(cfg, q, kb, vb, o, do, lse_bhm,
                                       slopes, seed, off, cfg.causal, pos)
                        return tuple(x.astype(jnp.float32) for x in g)
                    return fn

                past_fn = zeros3 if past_off is None else grad(past_off, my - s)
                fut_fn = zeros3 if fut_off is None else grad(fut_off, my - s + n)
                if past_off is None and fut_off is None:
                    dq_s = None
                else:
                    def pf(kb, vb):
                        return past_fn(kb) if past_off is None else past_fn(kb, vb)
                    def ff(kb, vb):
                        return fut_fn(kb) if fut_off is None else fut_fn(kb, vb)
                    dq_s, dk_s, dv_s = jax.lax.cond(my >= s, pf, ff,
                                                    k_blk, v_blk)
        if dq_s is not None:
            dq = dq + dq_s.astype(jnp.float32)
            dk_rot = dk_rot + dk_s.astype(jnp.float32)
            dv_rot = dv_rot + dv_s.astype(jnp.float32)

        # rotate on EVERY step (n total) so accumulators land home
        dk_rot = jax.lax.ppermute(dk_rot, cfg.axis_name, perm)
        dv_rot = jax.lax.ppermute(dv_rot, cfg.axis_name, perm)
        if s < n - 1:
            # same double-buffer barrier as the forward (see _ring_fwd_loop)
            k_nxt, v_nxt, dk_rot, dv_rot, dq = jax.lax.optimization_barrier(
                (k_nxt, v_nxt, dk_rot, dv_rot, dq))
            k_blk, v_blk = k_nxt, v_nxt

    return dq.astype(q.dtype), dk_rot.astype(k.dtype), dv_rot.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_core(cfg: _RingCfg, q, k, v, slopes, seed, b0, h0):
    o, _ = _ring_fwd_loop(cfg, q, k, v, slopes, seed, b0, h0)
    return o.astype(q.dtype)


def _ring_core_fwd(cfg, q, k, v, slopes, seed, b0, h0):
    o, lse = _ring_fwd_loop(cfg, q, k, v, slopes, seed, b0, h0)
    out = o.astype(q.dtype)
    return out, (q, k, v, out, lse, slopes, seed, b0, h0)


def _ring_core_bwd(cfg, res, do):
    q, k, v, out, lse, slopes, seed, b0, h0 = res
    dq, dk, dv = _ring_bwd_loop(cfg, q, k, v, out, lse, do, slopes, seed,
                                b0, h0)

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0) if x is not None else None
    return (dq, dk, dv, f0(slopes) if slopes is None or
            not jnp.issubdtype(slopes.dtype, jnp.floating)
            else jnp.zeros_like(slopes), f0(seed), f0(b0), f0(h0))


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention_local(
    q: jnp.ndarray,  # per-chip chunk (B, m, H_local, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,  # (B, H_local) fp32
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # (2,) uint32
    batch_offset=0,   # traced: global index of local batch row 0 (dropout key)
    head_offset=0,    # traced: global index of local head 0 (dropout key)
    layout: str = "contiguous",
    num_heads_total: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """The ring loop, for use *inside* an existing shard_map (e.g. a model's
    SPMD train step where the sequence axis is already sharded).
    Differentiable (streaming backward, O(2 chunks) peak KV memory)."""
    if q.shape[1] != k.shape[1]:
        raise ValueError("ring attention needs equal q/kv chunk lengths per "
                         f"chip; got {q.shape[1]} vs {k.shape[1]}")
    if layout not in ("contiguous", "zigzag"):
        raise ValueError(f"unknown ring layout {layout!r}")
    if layout == "zigzag":
        if not causal:
            raise ValueError("zigzag layout is for causal attention")
        if (window_size != (-1, -1) or alibi_slopes is not None
                or dropout_p > 0.0):
            raise ValueError(
                "zigzag layout does not support window/alibi/dropout (their "
                "positions are not contiguous per chip); use "
                "layout='contiguous'")
        if q.shape[1] % 2:
            raise ValueError("zigzag needs an even per-chip chunk length")
    if dropout_p > 0.0 and dropout_seed is None:
        raise ValueError("dropout_p > 0 needs dropout_seed")

    cfg = _RingCfg(
        axis_name=axis_name, axis_size=axis_size, causal=bool(causal),
        softmax_scale=(q.shape[-1] ** -0.5 if softmax_scale is None
                       else float(softmax_scale)),
        window_left=int(window_size[0]), window_right=int(window_size[1]),
        softcap=float(softcap), has_alibi=alibi_slopes is not None,
        dropout_p=float(dropout_p), layout=layout, interpret=interpret,
        num_heads_total=int(num_heads_total or q.shape[2]))

    b0 = jnp.asarray(batch_offset, jnp.int32)
    h0 = jnp.asarray(head_offset, jnp.int32)
    seed = (jnp.zeros((2,), jnp.uint32) if dropout_seed is None
            else jnp.asarray(dropout_seed, jnp.uint32))
    slopes = (None if alibi_slopes is None
              else jnp.asarray(alibi_slopes, jnp.float32))
    return _ring_core(cfg, q, k, v, slopes, seed, b0, h0)


def zigzag_order(n: int):
    """Stripe permutation for zigzag sharding: chip i holds stripes
    (i, 2n-1-i) of the 2n equal stripes of the global sequence."""
    return [s for i in range(n) for s in (i, 2 * n - 1 - i)]


def zigzag_shard(x: jnp.ndarray, n: int, axis: int = 1) -> jnp.ndarray:
    """Reorder a GLOBAL sequence axis so that a contiguous n-way sharding
    yields the zigzag layout (chip i gets stripes i and 2n-1-i)."""
    L = x.shape[axis]
    if L % (2 * n):
        raise ValueError(f"seq len {L} not divisible by 2*{n}")
    hs = L // (2 * n)
    parts = [jax.lax.slice_in_dim(x, s * hs, (s + 1) * hs, axis=axis)
             for s in zigzag_order(n)]
    return jnp.concatenate(parts, axis=axis)


def zigzag_unshard(x: jnp.ndarray, n: int, axis: int = 1) -> jnp.ndarray:
    """Inverse of zigzag_shard."""
    L = x.shape[axis]
    hs = L // (2 * n)
    order = zigzag_order(n)
    inv = [0] * (2 * n)
    for pos, s in enumerate(order):
        inv[s] = pos
    parts = [jax.lax.slice_in_dim(x, p * hs, (p + 1) * hs, axis=axis)
             for p in inv]
    return jnp.concatenate(parts, axis=axis)


def ring_attention(
    q: jnp.ndarray,  # (B, M, Hq, D) — M is the *global* seq len; sharded on axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,  # (B, Hq) fp32 (global heads)
    dropout_p: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,  # (2,) uint32
    layout: str = "contiguous",
    axis_name: str = SEQ_AXIS,
    q_partition=P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None),
    kv_partition=P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None),
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Exact attention with Q and KV sharded along the sequence axis.

    Differentiable; returns (B, M, Hq, D) with the same sharding as q.
    Supports causal, sliding window, softcap, ALiBi, and dropout on the
    contiguous layout; layout="zigzag" balances causal compute across the
    ring (inputs must already be in zigzag stripe order — `zigzag_shard`).
    """
    n = mesh.shape[axis_name]
    if q.shape[1] % n or k.shape[1] % n:
        raise ValueError(
            f"ring_attention needs seq len divisible by the '{axis_name}' "
            f"axis ({n}); got q {q.shape[1]}, kv {k.shape[1]} — pad the "
            f"sequence (zero padding is safe under causal=True)")

    q_global_heads = q.shape[2]
    data_ax = q_partition[0]
    model_ax = q_partition[2]
    B_l = q.shape[0] // (mesh.shape[data_ax] if data_ax else 1)
    H_l = q.shape[2] // (mesh.shape[model_ax] if model_ax else 1)

    def local(q, k, v, slopes):
        b0 = (jax.lax.axis_index(data_ax) * B_l) if data_ax else 0
        h0 = (jax.lax.axis_index(model_ax) * H_l) if model_ax else 0
        return ring_attention_local(
            q, k, v, axis_name=axis_name, axis_size=n, causal=causal,
            softmax_scale=softmax_scale, window_size=window_size,
            softcap=softcap, alibi_slopes=slopes, dropout_p=dropout_p,
            dropout_seed=dropout_seed, batch_offset=b0, head_offset=h0,
            layout=layout, num_heads_total=q_global_heads,
            interpret=interpret)

    slopes_spec = P(data_ax, model_ax)
    if alibi_slopes is None:
        def local_nos(q, k, v):
            return local(q, k, v, None)
        return shard_map(
            local_nos, mesh=mesh,
            in_specs=(q_partition, kv_partition, kv_partition),
            out_specs=q_partition,
            check_vma=False,
        )(q, k, v)
    slopes = jnp.asarray(alibi_slopes, jnp.float32)
    if slopes.ndim == 1:
        slopes = jnp.broadcast_to(slopes[None], (q.shape[0], q.shape[2]))
    return shard_map(
        local, mesh=mesh,
        in_specs=(q_partition, kv_partition, kv_partition, slopes_spec),
        out_specs=q_partition,
        check_vma=False,
    )(q, k, v, slopes)


def ulysses_attention(
    q: jnp.ndarray,  # (B, M, Hq, D) — M global, sharded on `axis_name`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = SEQ_AXIS,
    q_partition=P(DATA_AXIS, SEQ_AXIS, None, None),
    kv_partition=P(DATA_AXIS, SEQ_AXIS, None, None),
    interpret: Optional[bool] = None,
    **flash_kwargs,
) -> jnp.ndarray:
    """Ulysses-style sequence parallelism: the DUAL of ring attention.

    Instead of rotating KV around the ring, one `all_to_all` re-shards the
    already-sequence-sharded q/k/v from (seq-sharded, all heads) to
    (full sequence, head-sharded), the unmodified single-chip kernel runs
    per local head group, and a second all_to_all restores the sequence
    sharding.  Two collectives total (vs n-1 rotations), every dense-kernel
    feature works untouched (full global positions on-chip), but each chip
    holds the FULL K/V sequence during attention — pick ring for memory,
    Ulysses for feature generality/latency.  Heads must divide the axis.

    The reference has no distributed layer at all (SURVEY §2.4); this and
    the ring are the two standard TPU SP designs over the same LSE-bearing
    kernel.  Differentiable (all_to_all is linear; the kernel has its vjp).
    """
    n = mesh.shape[axis_name]
    B, M, Hq, D = q.shape
    if Hq % n:
        raise ValueError(f"ulysses needs q heads ({Hq}) divisible by the "
                         f"'{axis_name}' axis ({n}); use ring_attention")
    if k.shape[2] % n:
        raise ValueError(f"ulysses needs kv heads ({k.shape[2]}) divisible "
                         f"by the '{axis_name}' axis ({n})")

    from flash_attn_v100_tpu.ops.flash_attention import flash_attn_func

    def local(q, k, v):
        # (B, m, H, D) -> (B, M, H/n, D): scatter heads, gather sequence
        q = jax.lax.all_to_all(q, axis_name, split_axis=2, concat_axis=1,
                               tiled=True)
        k = jax.lax.all_to_all(k, axis_name, split_axis=2, concat_axis=1,
                               tiled=True)
        v = jax.lax.all_to_all(v, axis_name, split_axis=2, concat_axis=1,
                               tiled=True)
        out = flash_attn_func(q, k, v, interpret=interpret, **flash_kwargs)
        if isinstance(out, tuple):
            out = out[0]
        # (B, M, H/n, D) -> (B, m, H, D)
        return jax.lax.all_to_all(out, axis_name, split_axis=1,
                                  concat_axis=2, tiled=True)

    return shard_map(
        local, mesh=mesh,
        in_specs=(q_partition, kv_partition, kv_partition),
        out_specs=q_partition,
        check_vma=False,
    )(q, k, v)
