"""Sharded attention wrappers: head-parallel dense/varlen attention and
KV-sharded decode with the cross-chip LSE-merge.

None of this exists in the reference (single GPU); the kernels were shaped
for it: the per-(batch, head) grid makes head-sharded tensors "just work"
(reference grid B*H_Q: kernel/fused_mha_forward.cu:260), and the returned
fp32 LSE is the combiner for sequence-sharded partial attention — the
distributed realization of the reference's stubbed `num_splits`
(kernel/fused_mha_forward_kvcache.cu:462).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from flash_attn_v100_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS, MODEL_AXIS


def flash_attn_func_sharded(
    q, k, v, mesh: Mesh,
    *,
    interpret: Optional[bool] = None,
    **kwargs,
):
    """Head+data-parallel dense attention: batch on "data", q heads on
    "model" (kv heads sharded when divisible, else replicated with a local
    GQA group).  Zero collectives inside attention — communication belongs to
    the projection boundaries (psum after o-proj).
    """
    from flash_attn_v100_tpu.ops.flash_attention import flash_attn_func

    Hq, Hk = q.shape[2], k.shape[2]
    tp = mesh.shape[MODEL_AXIS]
    assert Hq % tp == 0, "q heads must divide the model axis"
    shard_kv = Hk % tp == 0
    kv_head = MODEL_AXIS if shard_kv else None
    hq_local = Hq // tp
    group = Hq // Hk
    if not shard_kv and group % hq_local != 0:
        raise ValueError(
            f"with replicated kv heads each chip's q heads must lie inside "
            f"one GQA group: group={group} must be a multiple of "
            f"Hq/tp={hq_local}")

    q_spec = P(DATA_AXIS, None, MODEL_AXIS, None)
    kv_spec = P(DATA_AXIS, None, kv_head, None)

    alibi = kwargs.pop("alibi_slopes", None)
    specs = [q_spec, kv_spec, kv_spec]
    args = [q, k, v]
    if alibi is not None:
        alibi = jnp.asarray(alibi, jnp.float32)
        if alibi.ndim == 1:
            specs.append(P(MODEL_AXIS))
        else:
            specs.append(P(DATA_AXIS, MODEL_AXIS))
        args.append(alibi)

    def local(q, k, v, *rest):
        slopes = rest[0] if rest else None
        if not shard_kv:
            # replicated kv: pick the one GQA kv head this chip's q heads map
            # to (global mapping kv_head = q_head // group, reference:
            # include/template.h:58)
            c = jax.lax.axis_index(MODEL_AXIS)
            kvh = (c * hq_local) // group
            k = jax.lax.dynamic_slice_in_dim(k, kvh, 1, axis=2)
            v = jax.lax.dynamic_slice_in_dim(v, kvh, 1, axis=2)
        return flash_attn_func(q, k, v, alibi_slopes=slopes,
                               interpret=interpret, **kwargs)

    return shard_map(local, mesh=mesh, in_specs=tuple(specs),
                     out_specs=q_spec, check_vma=False)(*args)


def merge_lse_across(o_local, lse_local, axis_name: str):
    """Cross-chip combine of sequence-sharded partial attention
    (boom guide §15 'reduce-scatter the output'): two collectives (pmax +
    psum) moving O(rows * D) — not the KV cache.

    o_local: (..., D) normalized partial; lse_local: (..., 1) fp32."""
    m = jax.lax.pmax(lse_local, axis_name)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.where(jnp.isfinite(lse_local), jnp.exp(lse_local - m_safe), 0.0)
    wsum = jax.lax.psum(w, axis_name)
    o = jax.lax.psum(o_local * w, axis_name)
    o = o / jnp.where(wsum == 0.0, 1.0, wsum)
    lse = jnp.where(wsum == 0.0, -jnp.inf,
                    m_safe + jnp.log(jnp.where(wsum == 0.0, 1.0, wsum)))
    return o, lse


def flash_attn_with_kvcache_sharded(
    q,                     # (B, T_new, Hq, D), replicated on "seq"
    k_cache, v_cache,      # HND contiguous (Bc, Hk, N_shard*seq, D) sharded on N,
                           # heads sharded on "model"
    mesh: Mesh,
    cache_seqlens,         # (B,) GLOBAL live lengths
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    num_splits: int = 0,
    interpret: Optional[bool] = None,
):
    """Multi-chip decode: heads on "model" (no comm), KV sequence on "seq"
    (each chip attends to its cache shard; partials combine via LSE-merge).

    The cache is sharded along the sequence axis in *contiguous* blocks:
    chip s of S owns cache rows [s*N/S, (s+1)*N/S).  Live tokens fill shards
    in order, so chip s holds min(max(len - s*N/S, 0), N/S) live rows.
    """
    from flash_attn_v100_tpu.ops.pallas.decode import (
        paged_decode_attention, merge_partials)
    from flash_attn_v100_tpu.ops.pallas import masks as masklib
    from flash_attn_v100_tpu.ops.pallas.block_sizes import round_up
    from flash_attn_v100_tpu.ops.kvcache import _pick_page_size

    B, T_new, Hq, D = q.shape
    if T_new != 1:
        raise NotImplementedError(
            "sharded decode currently handles T_new == 1 (token-at-a-time); "
            "use ring_attention for sharded prefill")
    Hk = k_cache.shape[1]
    tp = mesh.shape[MODEL_AXIS]
    sp = mesh.shape[SEQ_AXIS]
    group = Hq // Hk
    if softmax_scale is None:
        softmax_scale = D ** -0.5
    N_global = k_cache.shape[2]
    N_shard = N_global // sp

    q_spec = P(None, None, MODEL_AXIS, None)
    kv_spec = P(None, MODEL_AXIS, SEQ_AXIS, None)

    def local(q, kc, vc, lens):
        sidx = jax.lax.axis_index(SEQ_AXIS)
        shard_start = sidx * N_shard
        # live rows in this shard
        lens_local = jnp.clip(lens - shard_start, 0, N_shard)
        Bc, Hk_l, N_l, _ = kc.shape
        ps = _pick_page_size(N_l)
        nb = N_l // ps
        pool_k = kc.reshape(Bc, Hk_l, nb, ps, D)
        pool_v = vc.reshape(Bc, Hk_l, nb, ps, D)
        tbl = (jnp.arange(B, dtype=jnp.int32)[:, None] * nb
               + jnp.arange(nb, dtype=jnp.int32)[None, :])

        group_l = q.shape[2] // Hk_l
        q_rows = jnp.swapaxes(q, 1, 2).reshape(B, Hk_l, group_l * T_new, D)
        Rq = max(round_up(group_l * T_new, 8), 8)
        if Rq != group_l * T_new:
            q_rows = jnp.pad(q_rows, ((0, 0), (0, 0),
                                      (0, Rq - group_l * T_new), (0, 0)))

        # T_new == 1 decode: causal across shards is just the length mask
        # (the single query is the newest token), handled by lens_local.
        params = masklib.MaskParams(causal=False)
        o_part, lse_part = paged_decode_attention(
            q_rows, pool_k, pool_v, tbl, lens_local,
            jnp.zeros((B,), jnp.int32),
            softmax_scale=float(softmax_scale), params=params,
            t_new=T_new, group=group_l, num_splits=num_splits,
            interpret=interpret,
        )
        o, lse = merge_partials(o_part, lse_part)  # (B, Hk, Rq, D), (..., 1)
        o, lse = merge_lse_across(o, lse, SEQ_AXIS)
        o = o[:, :, :group_l * T_new].reshape(B, Hk_l, group_l, T_new, D)
        out = o.transpose(0, 3, 1, 2, 4).reshape(B, T_new, Hk_l * group_l, D)
        return out.astype(q.dtype)

    return shard_map(
        local, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, P()),
        out_specs=P(None, None, MODEL_AXIS, None),
        check_vma=False,
    )(q, k_cache, v_cache, jnp.asarray(cache_seqlens, jnp.int32))
