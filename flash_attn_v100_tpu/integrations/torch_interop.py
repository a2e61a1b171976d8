"""Torch-tensor adapter: call the TPU attention ops with torch tensors.

The reference's public functions take torch tensors
(reference: flash_attn_v100/flash_attn_interface.py:115-151); downstream
code written against it holds torch tensors end to end.  This module lets
that code switch without rewriting its data path: each wrapper accepts
torch tensors (CPU — this image's torch has no TPU backend), moves them to
the JAX default device via dlpack (zero-copy when host-side), runs the
Pallas engine, and returns torch tensors.

This is an INTEROP boundary, not the performance path: a host round-trip
per call is inherent (torch has no TPU tensors), so use it for porting and
testing, then move hot loops to jnp arrays.  fp16 inputs compute as bf16 in
the kernels (Mosaic has no fp16, config.kernel_dtype) but round-trip back
as fp16.

`flash_attn_backward_torch` exposes the full VJP so torch autograd can
graft onto it (see `TorchFlashAttnFunction` for the autograd.Function
wiring).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _to_jnp(t):
    if t is None:
        return None
    import torch
    if not isinstance(t, torch.Tensor):
        return t
    # dlpack refuses non-contiguous / inference-mode tensors; fall back to
    # numpy (one host copy, still correct)
    t = t.detach().contiguous()
    try:
        return jnp.from_dlpack(t)
    except Exception:
        return jnp.asarray(t.cpu().numpy())


def _to_torch(a, like=None):
    import numpy as np
    import torch
    # jax.device_get hands back a READONLY numpy view; torch's dlpack path
    # refuses readonly exports, so copy (the host transfer already happened)
    host = np.array(jax.device_get(jnp.asarray(a)))
    out = torch.from_numpy(host)
    if like is not None and out.dtype != like.dtype:
        out = out.to(like.dtype)
    return out


def flash_attn_func_torch(q, k, v, **kwargs):
    """Dense attention on torch (B, M, H, D) tensors; returns a torch tensor.

    Same kwarg surface as `flash_attn_v100_tpu.flash_attn_func`."""
    from flash_attn_v100_tpu import flash_attn_func
    out = flash_attn_func(_to_jnp(q), _to_jnp(k), _to_jnp(v), **kwargs)
    if isinstance(out, tuple):
        return tuple(_to_torch(o, like=q) if o is not None else None
                     for o in out)
    return _to_torch(out, like=q)


def flash_attn_varlen_func_torch(q, k, v, cu_seqlens_q, cu_seqlens_k,
                                 max_seqlen_q, max_seqlen_k, **kwargs):
    from flash_attn_v100_tpu import flash_attn_varlen_func
    out = flash_attn_varlen_func(
        _to_jnp(q), _to_jnp(k), _to_jnp(v), _to_jnp(cu_seqlens_q),
        _to_jnp(cu_seqlens_k), max_seqlen_q, max_seqlen_k, **kwargs)
    if isinstance(out, tuple):
        return tuple(_to_torch(o, like=q) if o is not None else None
                     for o in out)
    return _to_torch(out, like=q)


def flash_attn_with_kvcache_torch(q, k_cache, v_cache, **kwargs):
    from flash_attn_v100_tpu import flash_attn_with_kvcache
    jkw = {n: _to_jnp(x) for n, x in kwargs.items()}
    out = flash_attn_with_kvcache(
        _to_jnp(q), _to_jnp(k_cache), _to_jnp(v_cache), **jkw)
    if isinstance(out, tuple):
        # functional cache return: (out, k_cache, v_cache)
        return tuple(_to_torch(o, like=q) if o is not None else None
                     for o in out)
    return _to_torch(out, like=q)


def _vjp_core(q, k, v, dout, kwargs):
    from flash_attn_v100_tpu import flash_attn_func
    f = lambda q, k, v: flash_attn_func(q, k, v, **kwargs)
    out, pull = jax.vjp(f, q, k, v)
    return out, pull(dout.astype(out.dtype))


def flash_attn_backward_torch(q, k, v, dout, **kwargs) -> Tuple:
    """(out, dq, dk, dv) for torch tensors — the reference's
    `_flash_attn_backward` surface collapsed into one call."""
    out, (dq, dk, dv) = _vjp_core(
        _to_jnp(q), _to_jnp(k), _to_jnp(v), _to_jnp(dout), kwargs)
    return tuple(_to_torch(a, like=q) for a in (out, dq, dk, dv))


def make_torch_autograd_fn(**attn_kwargs):
    """Build a `torch.autograd.Function` whose forward/backward run the
    Pallas kernels — torch training loops keep their optimizer/autograd
    while attention executes on the JAX engine.

    Usage::

        fa = make_torch_autograd_fn(causal=True)
        out = fa(q, k, v)          # torch tensors, requires_grad honored
    """
    import torch

    class TorchFlashAttnFunction(torch.autograd.Function):
        @staticmethod
        def forward(ctx, q, k, v):
            ctx.save_for_backward(q, k, v)
            from flash_attn_v100_tpu import flash_attn_func
            out = flash_attn_func(_to_jnp(q), _to_jnp(k), _to_jnp(v),
                                  **attn_kwargs)
            return _to_torch(out, like=q)

        @staticmethod
        def backward(ctx, dout):
            q, k, v = ctx.saved_tensors
            _, (dq, dk, dv) = _vjp_core(
                _to_jnp(q), _to_jnp(k), _to_jnp(v), _to_jnp(dout),
                attn_kwargs)
            return (_to_torch(dq, like=q), _to_torch(dk, like=k),
                    _to_torch(dv, like=v))

    return TorchFlashAttnFunction.apply
