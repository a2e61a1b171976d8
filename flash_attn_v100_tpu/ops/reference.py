"""Pure-jnp reference attention (the oracle).

JAX analog of the reference's einsum oracle (reference: test.py:18-62) extended
with every feature flag the kernels support, so each feature has direct oracle
coverage (the reference only oracle-tests dense causal/non-causal).  Runs in
fp32 when `upcast=True`; with `upcast=False` it provides the same-bit-width
"native error" yardstick used by the relative tolerance model
(reference: test.py:277, 331-334).

Semantics (all from the reference CUDA scores pipeline,
reference: include/mat_mul.h:82-157):
  offset = seqlen_k - seqlen_q                  # bottom-right aligned
  causal  masks  j - offset >  i
  window  masks  j - offset <  i - window_left   (window_left  >= 0)
                 j - offset >  i + window_right  (window_right >= 0)
  val = s * softmax_scale
  val = val - alibi_slope * |i - (j - offset)|   (before softcap)
  val = softcap * tanh(val / softcap)            (after scale + alibi)
  masked positions -> -inf
Dropout applies *after* softmax, keyed by absolute position via Philox
(reference: include/softmax.h:96-124).  Fully-masked rows produce out = 0 and
lse = -inf.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.ops import philox


def _build_bias_and_mask(
    s: jnp.ndarray,  # (B, H, M, N) scaled scores, fp32
    seqlen_q: int,
    seqlen_k: int,
    causal: bool,
    window_size: Tuple[int, int],
    softcap: float,
    alibi_slopes: Optional[jnp.ndarray],  # (H,) or (B, H)
    q_start: int = 0,
    k_start: int = 0,
) -> jnp.ndarray:
    B, H, M, N = s.shape
    i = (jnp.arange(M) + q_start)[:, None]  # absolute q positions
    j = (jnp.arange(N) + k_start)[None, :]  # absolute k positions
    offset = seqlen_k - seqlen_q
    allowed = jnp.ones((M, N), bool)
    if causal:
        allowed &= (j - offset) <= i
    wl, wr = window_size
    if wl >= 0:
        allowed &= (j - offset) >= (i - wl)
    if wr >= 0:
        allowed &= (j - offset) <= (i + wr)
    # positions past the true sequence end are always masked
    allowed &= (j < seqlen_k) & (i < seqlen_q)

    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32)
        if slopes.ndim == 1:
            slopes = jnp.broadcast_to(slopes[None, :], (B, H))
        dist = jnp.abs(i - (j - offset)).astype(jnp.float32)  # (M, N)
        s = s - slopes[:, :, None, None] * dist[None, None]

    if softcap > 0.0:
        s = softcap * jnp.tanh(s / softcap)

    s = jnp.where(allowed[None, None], s, -jnp.inf)
    return s


def mha_reference(
    q: jnp.ndarray,  # (B, M, Hq, D)
    k: jnp.ndarray,  # (B, N, Hk, D)
    v: jnp.ndarray,  # (B, N, Hk, D)
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    upcast: bool = True,
    return_lse: bool = False,
    return_dmask: bool = False,
    dropout_bh_base: int = 0,
):
    """Oracle attention.  Returns out (B, M, Hq, D) [, lse (B, Hq, M)] [, dmask].

    `dropout_bh_base` offsets the Philox (batch*H + head) stream id — used by
    the varlen oracle so per-sequence calls reproduce the packed kernel's
    per-segment dropout streams."""
    dtype_og = q.dtype
    B, M, Hq, D = q.shape
    N, Hk = k.shape[1], k.shape[2]
    assert Hq % Hk == 0, "num q heads must be divisible by num kv heads"
    group = Hq // Hk
    if softmax_scale is None:
        softmax_scale = D ** -0.5

    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)

    # (B, H, M, D) compute layout; expand kv heads for GQA
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.repeat(jnp.swapaxes(k, 1, 2), group, axis=1)
    vt = jnp.repeat(jnp.swapaxes(v, 1, 2), group, axis=1)

    s = jnp.einsum("bhmd,bhnd->bhmn", qt, kt).astype(jnp.float32) * softmax_scale
    s = _build_bias_and_mask(s, M, N, causal, window_size, softcap, alibi_slopes)

    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)  # fully-masked rows
    e = jnp.exp(s - m_safe)
    e = jnp.where(jnp.isfinite(s), e, 0.0)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.where(l == 0.0, 1.0, l)
    lse = jnp.where(
        l[..., 0] == 0.0, -jnp.inf, m_safe[..., 0] + jnp.log(jnp.where(l[..., 0] == 0, 1.0, l[..., 0]))
    )

    dmask = None
    if dropout_p > 0.0:
        seed_lo, seed_hi = philox.split_seed(dropout_seed)
        row_ids = jnp.broadcast_to(jnp.arange(M)[:, None], (M, N))
        col_ids = jnp.broadcast_to(jnp.arange(N)[None, :], (M, N))
        bh = ((jnp.arange(B, dtype=jnp.uint32)[:, None] + dropout_bh_base) * Hq
              + jnp.arange(Hq, dtype=jnp.uint32)[None, :]).reshape(B, Hq, 1, 1)
        keep = philox.dropout_keep_mask(
            row_ids[None, None], col_ids[None, None], bh, seed_lo, seed_hi, dropout_p
        )
        p_drop = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
        if return_dmask:
            dmask = jnp.where(keep, 1.0, -1.0).astype(dtype_og)
    else:
        p_drop = p

    o = jnp.einsum("bhmn,bhnd->bhmd", p_drop.astype(vt.dtype), vt)
    out = jnp.swapaxes(o, 1, 2).astype(dtype_og)

    results = (out,)
    if return_lse:
        results += (lse.astype(jnp.float32),)
    if return_dmask:
        results += (dmask,)
    return results[0] if len(results) == 1 else results


def mha_reference_varlen(
    q: jnp.ndarray,  # (Tq, Hq, D) packed
    k: jnp.ndarray,  # (Tk, Hk, D) packed
    v: jnp.ndarray,
    cu_seqlens_q,
    cu_seqlens_k,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    dropout_p: float = 0.0,
    dropout_seed: int = 0,
    upcast: bool = True,
    return_lse: bool = False,
    seqused_k=None,
):
    """Packed-sequence oracle: loops per sequence in python (test-only).

    Returns out (Tq, Hq, D) [, lse (Hq, Tq) — the reference's varlen LSE layout
    (reference: kernel/fused_mha_forward_varlen.cu:519)].
    """
    import numpy as np

    cu_q = np.asarray(cu_seqlens_q)
    cu_k = np.asarray(cu_seqlens_k)
    nseq = len(cu_q) - 1
    outs, lses = [], []
    for b in range(nseq):
        q_b = q[cu_q[b]:cu_q[b + 1]][None]  # (1, m, Hq, D)
        klen = int(cu_k[b + 1] - cu_k[b])
        if seqused_k is not None:
            used = int(np.asarray(seqused_k)[b])
            if used > 0:
                klen = min(klen, used)
            else:
                klen = 0
        k_b = k[cu_k[b]:cu_k[b] + klen][None]
        v_b = v[cu_k[b]:cu_k[b] + klen][None]
        if klen == 0:
            m_b = q_b.shape[1]
            outs.append(jnp.zeros_like(q_b[0]))
            lses.append(jnp.full((q.shape[1], m_b), -jnp.inf, jnp.float32))
            continue
        slopes_b = None
        if alibi_slopes is not None:
            slopes_b = alibi_slopes if alibi_slopes.ndim == 1 else alibi_slopes[b]
        o_b, lse_b = mha_reference(
            q_b, k_b, v_b,
            softmax_scale=softmax_scale, causal=causal, window_size=window_size,
            softcap=softcap, alibi_slopes=slopes_b,
            dropout_p=dropout_p, dropout_seed=dropout_seed, upcast=upcast,
            return_lse=True, dropout_bh_base=b,
        )
        outs.append(o_b[0])
        lses.append(lse_b[0])  # (Hq, m)
    out = jnp.concatenate(outs, axis=0)
    if return_lse:
        lse = jnp.concatenate(lses, axis=1)  # (Hq, Tq)
        return out, lse
    return out


def mha_reference_kvcache(
    q,                      # (B, T_new, Hq, D)
    k_cache, v_cache,       # (Bc, N, Hk, D) contiguous (token-major)
    k_new=None, v_new=None,
    rotary_cos=None, rotary_sin=None,
    cache_seqlens=None,     # (B,) int
    cache_batch_idx=None,
    cache_leftpad=None,
    softmax_scale=None,
    causal=False,
    window_size=(-1, -1),
    softcap=0.0,
    rotary_interleaved=True,
    alibi_slopes=None,
    upcast=True,
    return_lse=False,
):
    """KV-cache decode oracle (test-only, python loop over batch).

    Semantics of the reference kvcache path
    (kernel/fused_mha_forward_kvcache.cu:416-652): optional RoPE on q/new k,
    append at cache_seqlens (+ leftpad), attention of the T_new queries
    against cache[leftpad : leftpad + cache_seqlens + T_new] with
    bottom-right-aligned causal (kv total as N).  Returns
    (out, updated k_cache, updated v_cache [, lse])."""
    import numpy as np
    from flash_attn_v100_tpu.ops.rotary import apply_rotary_emb

    B, T_new, Hq, D = q.shape
    Bc, N, Hk, _ = k_cache.shape
    cs = np.asarray(cache_seqlens if cache_seqlens is not None
                    else np.full(B, 0 if k_new is not None else N), np.int32)
    lp = np.zeros(B, np.int32) if cache_leftpad is None else np.asarray(cache_leftpad, np.int32)
    bidx = np.arange(B) if cache_batch_idx is None else np.asarray(cache_batch_idx)
    local = window_size[0] >= 0 or window_size[1] >= 0

    if rotary_cos is not None:
        if causal or local:
            pos_q = cs[:, None] + np.arange(T_new)
        else:
            pos_q = np.broadcast_to(cs[:, None], (B, T_new)).copy()
        q = apply_rotary_emb(q, rotary_cos, rotary_sin, jnp.asarray(pos_q),
                             interleaved=rotary_interleaved)
        if k_new is not None:
            pos_k = cs[:, None] + np.arange(T_new)
            k_new = apply_rotary_emb(k_new, rotary_cos, rotary_sin,
                                     jnp.asarray(pos_k),
                                     interleaved=rotary_interleaved)

    kc = np.asarray(k_cache, np.float32).copy()
    vc = np.asarray(v_cache, np.float32).copy()
    if k_new is not None:
        kn = np.asarray(k_new, np.float32)
        vn = np.asarray(v_new, np.float32)
        for b in range(B):
            s0 = lp[b] + cs[b]
            kc[bidx[b], s0:s0 + T_new] = kn[b]
            vc[bidx[b], s0:s0 + T_new] = vn[b]

    total = cs + (T_new if k_new is not None else 0)
    wl, wr = window_size
    if causal:
        wr = 0
    outs, lses = [], []
    for b in range(B):
        kb = kc[bidx[b], lp[b]:lp[b] + total[b]][None]  # (1, n, Hk, D)
        vb = vc[bidx[b], lp[b]:lp[b] + total[b]][None]
        slopes_b = None
        if alibi_slopes is not None:
            sl = jnp.asarray(alibi_slopes)
            slopes_b = sl if sl.ndim == 1 else sl[b]
        o_b, lse_b = mha_reference(
            q[b:b + 1].astype(jnp.float32) if upcast else q[b:b + 1],
            jnp.asarray(kb, jnp.float32 if upcast else q.dtype),
            jnp.asarray(vb, jnp.float32 if upcast else q.dtype),
            softmax_scale=softmax_scale, causal=bool(causal and T_new > 1),
            window_size=(wl, wr), softcap=softcap, alibi_slopes=slopes_b,
            upcast=upcast, return_lse=True,
        )
        outs.append(o_b[0].astype(q.dtype))
        lses.append(lse_b[0])
    out = jnp.stack(outs)
    kc_j, vc_j = jnp.asarray(kc, k_cache.dtype), jnp.asarray(vc, v_cache.dtype)
    if return_lse:
        return out, kc_j, vc_j, jnp.stack(lses)
    return out, kc_j, vc_j
