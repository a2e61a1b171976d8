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
    k_cache, v_cache,      # HND: contiguous (B, Hk, N_global, D) sharded on N
                           #   (P(None, model, seq, None)), or paged pool
                           #   (Hk, P_global, ps, D) sharded on pages
                           #   (P(model, seq, None, None)); heads on "model"
    mesh: Mesh,
    cache_seqlens,         # (B,) GLOBAL live lengths (pre-append)
    *,
    k=None, v=None,        # (B, T_new, Hk, D) new tokens, appended in-shard
    rotary_cos=None, rotary_sin=None,
    block_table=None,      # (B, max_pages_global) sharded P(None, seq);
                           #   each shard's columns hold LOCAL page ids
    k_scales=None, v_scales=None,   # same layout/sharding as the caches
    causal: bool = False,
    window_size=(-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,     # (Hq,) or (B, Hq), heads sharded on "model"
    softmax_scale: Optional[float] = None,
    num_splits: int = 0,
    rotary_interleaved: bool = True,
    return_softmax_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Multi-chip decode with the FULL kvcache surface: heads on "model"
    (no comm), KV sequence on "seq" — each chip attends to its cache shard
    with the single-chip kernel and partials combine via the cross-chip
    LSE-merge (the distributed form of the reference's stubbed num_splits,
    kernel/fused_mha_forward_kvcache.cu:462).  Supports T_new >= 1 (causal
    across shards via the global q-position frame), paged block tables,
    in-shard append of new k/v, fused rotary, int8/fp8 quantized pools,
    window/softcap/ALiBi — the reference kwarg surface of
    fused_mha_forward_kvcache.cu:416-652, sharded.

    Sequence sharding is contiguous: chip s of S owns global rows
    [s*N/S, (s+1)*N/S) (contiguous) or global page-table columns
    [s*mp/S, (s+1)*mp/S) (paged).  Returns like flash_attn_with_kvcache;
    updated caches keep their input sharding.
    """
    from flash_attn_v100_tpu.ops.kvcache import flash_attn_with_kvcache
    from flash_attn_v100_tpu.ops.rotary import apply_rotary_emb

    B, T_new, Hq, D = q.shape
    paged = block_table is not None
    Hk = k_cache.shape[1] if not paged else k_cache.shape[0]
    sp = mesh.shape[SEQ_AXIS]
    quantized = k_scales is not None
    if softmax_scale is None:
        softmax_scale = D ** -0.5
    appended = k is not None
    lens = jnp.asarray(cache_seqlens, jnp.int32)
    # int4 pools pack two tokens per byte row (quant.py layout): the
    # payload token dim is HALF the scales' — sizes below are in TOKENS
    int4 = (quantized and k_cache.dtype == jnp.int8
            and k_scales.shape[2] == 2 * k_cache.shape[2])
    tok_mul = 2 if int4 else 1
    if paged:
        page_size = tok_mul * k_cache.shape[2]
        mp_local = block_table.shape[1] // sp
        N_shard = mp_local * page_size
    else:
        N_shard = tok_mul * k_cache.shape[2] // sp

    # rotary runs replicated OUTSIDE the shard_map: positions are global and
    # the (B, T_new) work is negligible next to streaming the cache shards
    if rotary_cos is not None:
        local_w = window_size[0] >= 0 or window_size[1] >= 0
        if causal or local_w:
            pos_q = lens[:, None] + jnp.arange(T_new, dtype=jnp.int32)
        else:
            pos_q = jnp.broadcast_to(lens[:, None], (B, T_new))
        q = apply_rotary_emb(q, rotary_cos, rotary_sin, pos_q,
                             interleaved=rotary_interleaved)
        if appended:
            pos_k = lens[:, None] + jnp.arange(T_new, dtype=jnp.int32)
            k = apply_rotary_emb(k, rotary_cos, rotary_sin, pos_k,
                                 interleaved=rotary_interleaved)

    q_spec = P(None, None, MODEL_AXIS, None)
    kv_spec = (P(MODEL_AXIS, SEQ_AXIS, None, None) if paged
               else P(None, MODEL_AXIS, SEQ_AXIS, None))
    new_spec = P(None, None, MODEL_AXIS, None)
    tbl_spec = P(None, SEQ_AXIS)

    slopes = None
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None], (B, Hq))

    def local(q, kc, vc, lens, *rest):
        rest = list(rest)
        tbl_l = rest.pop(0) if paged else None
        knew = rest.pop(0) if appended else None
        vnew = rest.pop(0) if appended else None
        ksc = rest.pop(0) if quantized else None
        vsc = rest.pop(0) if quantized else None
        sl = rest.pop(0) if slopes is not None else None

        sidx = jax.lax.axis_index(SEQ_AXIS)
        shard_start = sidx * N_shard
        total = lens + (T_new if appended else 0)
        # local live rows (the inner wrapper re-adds T_new when appending)
        cs_local = (jnp.clip(total - shard_start, 0, N_shard)
                    - (T_new if appended else 0))
        qlens_local = lens - shard_start   # global q frame, shard-local origin

        res = flash_attn_with_kvcache(
            q, kc, vc, k=knew, v=vnew, cache_seqlens=cs_local,
            block_table=tbl_l, k_scales=ksc, v_scales=vsc,
            causal=causal, window_size=window_size, softcap=softcap,
            alibi_slopes=sl, softmax_scale=softmax_scale,
            num_splits=num_splits, kv_cache_layout="HND",
            return_softmax_lse=True, interpret=interpret,
            q_position_lens=qlens_local,
            append_window=(0, N_shard) if appended else None,
        )
        out, lse = res[0], res[1]
        caches = res[2] if appended else None
        lse_t = jnp.transpose(lse, (0, 2, 1))[..., None]  # (B, T, Hq_l, 1)
        o, lse_m = merge_lse_across(out.astype(jnp.float32), lse_t, SEQ_AXIS)
        outs = [o.astype(q.dtype), jnp.transpose(lse_m[..., 0], (0, 2, 1))]
        if appended:
            outs.extend(caches)
        return tuple(outs)

    in_specs = [q_spec, kv_spec, kv_spec, P()]
    args = [q, k_cache, v_cache, lens]
    if paged:
        in_specs.append(tbl_spec)
        args.append(jnp.asarray(block_table, jnp.int32))
    if appended:
        in_specs += [new_spec, new_spec]
        args += [k, v]
    if quantized:
        sc_spec = (P(MODEL_AXIS, SEQ_AXIS, None, None) if paged
                   else P(None, MODEL_AXIS, SEQ_AXIS, None))
        in_specs += [sc_spec, sc_spec]
        args += [k_scales, v_scales]
    if slopes is not None:
        in_specs.append(P(None, MODEL_AXIS))
        args.append(slopes)

    out_specs = [P(None, None, MODEL_AXIS, None), P(None, MODEL_AXIS, None)]
    if appended:
        out_specs += [kv_spec, kv_spec]
        if quantized:
            out_specs += [sc_spec, sc_spec]

    res = shard_map(
        local, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        check_vma=False,
    )(*args)

    out, lse = res[0], res[1]
    results = [out]
    if return_softmax_lse:
        results.append(lse)
    if appended:
        results.append(tuple(res[2:]))
    return results[0] if len(results) == 1 else tuple(results)
