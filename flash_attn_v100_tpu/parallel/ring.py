"""Ring attention: sequence-parallel exact attention over the ICI ring.

The reference cannot do this (single GPU), but it ships the composition
primitive: every forward returns fp32 LSE
(reference: kernel/fused_mha_forward.cu:431), and the per-block online-softmax
merge (include/softmax.h:13-19) is associative.  Ring attention is that merge
lifted across chips: KV shards rotate around the ring via `jax.lax.ppermute`
(point-to-point, neighbor-only — full ICI bisection) while each chip runs the
local Pallas flash kernel on the chunk in front of it, then folds the chunk's
(O, lse) into its running pair.  Communication of the next chunk overlaps the
current chunk's compute under XLA's scheduler.

Causal handling per (q-chunk i, kv-chunk s) pair — all static per step:
  s >  i : fully masked -> chunk skipped entirely (no matmul, no ppermute
           savings: the rotation still runs, data is needed downstream)
  s == i : the standard causal diagonal (local flash causal=True)
  s <  i : unmasked (local flash causal=False)
This is the cross-chip analog of the reference's block-range trim
(include/template.h:98-111).

Backward: jax.lax.ppermute is differentiable and the local chunks use the
flash custom_vjp, so `jax.grad` through ring_attention yields the ring
backward automatically (rotated KV chunks become residuals, O(full KV) per
chip — same footprint as the all-gather backward; a streaming ring backward
is a planned optimization).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from flash_attn_v100_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS, MODEL_AXIS


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


def ring_attention_local(
    q: jnp.ndarray,  # per-chip chunk (B, m, H_local, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """The ring loop, for use *inside* an existing shard_map (e.g. a model's
    SPMD train step where the sequence axis is already sharded)."""
    from flash_attn_v100_tpu.ops.flash_attention import flash_attn_func

    n = axis_size
    my = jax.lax.axis_index(axis_name)
    scale = q.shape[-1] ** -0.5 if softmax_scale is None else softmax_scale

    o_acc = jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32)
    lse_acc = jnp.full(q.shape[:3] + (1,), -jnp.inf, jnp.float32)
    k_blk, v_blk = k, v

    perm = [(i, (i + 1) % n) for i in range(n)]
    for step in range(n):
        # chunk in front of us came from chip (my - step) % n, so the
        # causal-diagonal pair happens exactly at step == 0 (static!);
        # at step > 0 the chunk is in the past iff my >= step.
        def chunk_attend(causal_local, kb, vb):
            out, lse = flash_attn_func(
                q, kb, vb, softmax_scale=scale, causal=causal_local,
                return_attn_probs=True, interpret=interpret,
            )[:2]
            lse = jnp.transpose(lse, (0, 2, 1))[..., None]  # (B, m, H, 1)
            return out.astype(jnp.float32), lse

        if causal and step == 0:
            o_new, lse_new = chunk_attend(True, k_blk, v_blk)
        elif causal:
            # future chunks contribute nothing: BRANCH around the kernel
            # (lax.cond executes one side at runtime) instead of computing
            # and masking — halves causal ring compute on average
            o_new, lse_new = jax.lax.cond(
                my >= step,
                lambda kb, vb: chunk_attend(False, kb, vb),
                lambda kb, vb: (
                    jnp.zeros(q.shape[:3] + (v.shape[-1],), jnp.float32),
                    jnp.full(q.shape[:3] + (1,), -jnp.inf, jnp.float32)),
                k_blk, v_blk)
        else:
            o_new, lse_new = chunk_attend(False, k_blk, v_blk)

        o_acc, lse_acc = _merge_pair(o_acc, lse_acc, o_new, lse_new)

        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    return o_acc.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (B, M, Hq, D) — M is the *global* seq len; sharded on axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    axis_name: str = SEQ_AXIS,
    q_partition=P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None),
    kv_partition=P(DATA_AXIS, SEQ_AXIS, MODEL_AXIS, None),
    interpret: Optional[bool] = None,
    **flash_kwargs,
) -> jnp.ndarray:
    """Exact attention with Q and KV sharded along the sequence axis.

    Differentiable; returns (B, M, Hq, D) with the same sharding as q.
    Extra flash kwargs (softcap, window_size intra-chunk, ...) are not yet
    supported here — use the dense op for single-chip features.
    """
    if flash_kwargs:
        raise NotImplementedError(
            f"ring_attention does not support {sorted(flash_kwargs)} yet")
    n = mesh.shape[axis_name]
    if q.shape[1] % n or k.shape[1] % n:
        raise ValueError(
            f"ring_attention needs seq len divisible by the '{axis_name}' "
            f"axis ({n}); got q {q.shape[1]}, kv {k.shape[1]} — pad the "
            f"sequence (zero padding is safe under causal=True)")

    def local(q, k, v):
        return ring_attention_local(
            q, k, v, axis_name=axis_name, axis_size=n, causal=causal,
            softmax_scale=softmax_scale, interpret=interpret)

    return shard_map(
        local, mesh=mesh,
        in_specs=(q_partition, kv_partition, kv_partition),
        out_specs=q_partition,
        check_vma=False,
    )(q, k, v)
