"""Public dense attention API — `flash_attn_func`.

Mirrors the reference's public function and autograd boundary
(reference: flash_attn_v100/flash_attn_interface.py:17-151):
  * input/output layout (B, M, H, D); GQA when Hk < Hq,
  * head-dim padded to a multiple of 8 and sliced back (:44-49),
  * default scale = head_dim**-0.5 computed on the *original* head dim,
  * `deterministic` is accepted and always satisfied: the TPU backward is
    bitwise-deterministic by construction (sequential Pallas grid, VMEM
    accumulation, no atomics) — the reference needs a flag because its
    CUDA backward races atomics (reference :119-121 /
    kernel/fused_mha_backward.cu:603),
  * softcap and dropout are mutually exclusive
    (reference: kernel/fused_mha_forward.cu:347),
  * M == 1 drops causal (reference: kernel/fused_mha_forward.cu:343),
  * residuals saved for backward: (q, k, v, out, lse, rng seed) (:69-79),
  * return_attn_probs returns (out, lse, dmask) with dmask entries +-1 whose
    sign encodes kept/dropped (reference: include/softmax.h:117-120).

JAX-functional deltas: dropout randomness comes from an explicit `rng_key`
(or int `dropout_seed`) instead of a global generator; gradients flow through
`jax.grad` via custom_vjp rather than torch autograd.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.ops import philox
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
from flash_attn_v100_tpu.ops.pallas.bwd import flash_attn_dense_bwd


@dataclasses.dataclass(frozen=True)
class _Cfg:
    """Static config for one specialization — the runtime analog of the
    reference's compile-time feature dispatch (include/template.h:265-291)."""

    softmax_scale: float
    params: masklib.MaskParams
    dropout_p: float
    block_sizes: Optional[BlockSizes]
    interpret: Optional[bool]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_attn_core(cfg: _Cfg, q, k, v, alibi_slopes, seed):
    out, lse = flash_attn_dense_fwd(
        q, k, v, cfg.softmax_scale, cfg.params,
        alibi_slopes=alibi_slopes, dropout_p=cfg.dropout_p, dropout_seed=seed,
        block_sizes=cfg.block_sizes, interpret=cfg.interpret,
    )
    return out, lse


def _core_fwd(cfg, q, k, v, alibi_slopes, seed):
    out, lse = _flash_attn_core(cfg, q, k, v, alibi_slopes, seed)
    return (out, lse), (q, k, v, out, lse, alibi_slopes, seed)


def _core_bwd(cfg, res, cotangents):
    dout, dlse = cotangents
    q, k, v, out, lse, alibi_slopes, seed = res
    dq, dk, dv = flash_attn_dense_bwd(
        q, k, v, out, dout, lse, cfg.softmax_scale, cfg.params,
        alibi_slopes=alibi_slopes, dropout_p=cfg.dropout_p, dropout_seed=seed,
        block_sizes=cfg.block_sizes, interpret=cfg.interpret, dlse=dlse,
    )
    dslopes = None if alibi_slopes is None else jnp.zeros_like(alibi_slopes)
    dseed = None if seed is None else jnp.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dslopes, dseed


_flash_attn_core.defvjp(_core_fwd, _core_bwd)


def _normalize_seed(dropout_p, dropout_seed, rng_key):
    if dropout_p <= 0.0:
        return None
    if rng_key is not None:
        bits = jax.random.key_data(rng_key).reshape(-1)[:2]
        return bits.astype(jnp.uint32)
    if dropout_seed is None:
        dropout_seed = 0
    if isinstance(dropout_seed, int):
        lo, hi = philox.split_seed(dropout_seed)
        return jnp.stack([jnp.uint32(lo), jnp.uint32(hi)])
    seed = jnp.asarray(dropout_seed)
    if seed.shape == (2,):
        return seed.astype(jnp.uint32)
    lo = (seed & 0xFFFFFFFF).astype(jnp.uint32)
    hi = ((seed >> 32) & 0xFFFFFFFF).astype(jnp.uint32)
    return jnp.stack([lo, hi])


def _normalize_alibi(alibi_slopes, B, Hq):
    if alibi_slopes is None:
        return None
    slopes = jnp.asarray(alibi_slopes, jnp.float32)
    if slopes.ndim == 1:
        assert slopes.shape == (Hq,), "alibi_slopes must be (H,) or (B, H)"
        slopes = jnp.broadcast_to(slopes[None], (B, Hq))
    else:
        assert slopes.shape == (B, Hq), "alibi_slopes must be (H,) or (B, H)"
    return slopes


def flash_attn_func(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes: Optional[jnp.ndarray] = None,
    deterministic: bool = False,
    return_attn_probs: bool = False,
    *,
    dropout_seed: Optional[Union[int, jnp.ndarray]] = None,
    rng_key: Optional[jax.Array] = None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
):
    """Dense flash attention, layout (B, M, H, D) -> (B, M, H, D).

    Drop-in surface of the reference `flash_attn_func`
    (flash_attn_v100/flash_attn_interface.py:115-151).  Differentiable via
    `jax.grad`.  When `return_attn_probs` is True returns (out, lse, dmask);
    dmask is None unless dropout_p > 0.
    """
    # `deterministic` is always satisfied on TPU: Pallas grid steps run
    # sequentially per core and dQ/dKV accumulate in VMEM scratch (no
    # atomics), so the backward is bitwise-deterministic with the flag on
    # or off — unlike the reference, where True selects a slower
    # atomics-free path (flash_attn_interface.py `deterministic` doc).
    del deterministic
    if softcap > 0.0 and dropout_p > 0.0:
        raise ValueError("softcap and dropout are mutually exclusive "
                         "(reference: kernel/fused_mha_forward.cu:347)")
    B, M, Hq, D_og = q.shape
    N, Hk = k.shape[1], k.shape[2]
    if Hq % Hk != 0:
        raise ValueError("number of q heads must be divisible by number of kv heads")
    if softmax_scale is None:
        softmax_scale = D_og ** -0.5

    # pad head dim to a multiple of 8 (reference: interface.py:44-49)
    pad_d = (8 - D_og % 8) % 8
    if pad_d:
        pad = ((0, 0), (0, 0), (0, 0), (0, pad_d))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    # fp16 -> bf16 on TPU hardware (no f16 in Mosaic); see config.kernel_dtype
    from flash_attn_v100_tpu.config import kernel_dtype, use_interpret as _ui
    dtype_og = q.dtype
    interp_eff = _ui() if interpret is None else interpret
    kdt = kernel_dtype(dtype_og, interp_eff)
    if kdt != dtype_og:
        q, k, v = q.astype(kdt), k.astype(kdt), v.astype(kdt)

    # bottom-right-aligned causal is a no-op for a single query row
    # (reference: kernel/fused_mha_forward.cu:343)
    causal_eff = causal and M > 1
    params = masklib.MaskParams(
        causal=bool(causal_eff),
        window_left=int(window_size[0]),
        window_right=int(window_size[1]),
        softcap=float(softcap),
        has_alibi=alibi_slopes is not None,
    )
    slopes = _normalize_alibi(alibi_slopes, B, Hq)
    seed = _normalize_seed(dropout_p, dropout_seed, rng_key)

    cfg = _Cfg(
        softmax_scale=float(softmax_scale), params=params,
        dropout_p=float(dropout_p), block_sizes=block_sizes, interpret=interpret,
    )
    out, lse = _flash_attn_core(cfg, q, k, v, slopes, seed)
    if pad_d:
        out = out[..., :D_og]
    if kdt != dtype_og:
        out = out.astype(dtype_og)

    if return_attn_probs:
        dmask = None
        if dropout_p > 0.0:
            rows = jnp.broadcast_to(jnp.arange(M)[:, None], (M, N))
            cols = jnp.broadcast_to(jnp.arange(N)[None, :], (M, N))
            bh = jnp.arange(B * Hq, dtype=jnp.uint32).reshape(B, Hq, 1, 1)
            keep = philox.dropout_keep_mask(
                rows[None, None], cols[None, None], bh, seed[0], seed[1], dropout_p
            )
            dmask = jnp.where(keep, 1.0, -1.0).astype(q.dtype)
        return out, lse, dmask
    return out
