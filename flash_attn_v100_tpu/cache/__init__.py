"""KV-cache constructors and layout helpers.

The reference leaves cache allocation to the caller and validates shapes
per-call (kernel/fused_mha_forward_kvcache.cu:479-531).  Here allocation is a
first-class helper so callers get the TPU-friendly layouts by default:

  * HND (`(B, Hk, N, D)` contiguous / `(Hk, P, ps, D)` paged): the zero-copy
    layout — `flash_attn_with_kvcache(kv_cache_layout="HND")` feeds it to the
    kernel without transposition.
  * bf16 payloads (TPU has no fp16; fp16 caches would be converted per call).
  * quantized pools carry per-(token, head) fp32 scales (ops/quant.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass
class ContiguousCache:
    """Per-layer (B, Hk, N, D) caches in HND layout."""
    k: jnp.ndarray
    v: jnp.ndarray
    k_scales: Optional[jnp.ndarray] = None   # (B, Hk, N, 1) fp32 when quantized
    v_scales: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


@dataclasses.dataclass
class PagedCache:
    """(Hk, num_pages, page_size, D) page pool + external block tables."""
    k: jnp.ndarray
    v: jnp.ndarray
    page_size: int
    k_scales: Optional[jnp.ndarray] = None   # (Hk, P, ps, 1) fp32 when quantized
    v_scales: Optional[jnp.ndarray] = None

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None


def _payload(dtype):
    """(token-dim divisor, payload dtype, scales?) for a cache dtype.
    dtype="int4" packs two TOKENS per int8 byte (full head_dim payload,
    half the token rows; scales stay per token)."""
    from flash_attn_v100_tpu.ops.quant import is_int4
    if is_int4(dtype):
        return 2, jnp.int8, True
    return 1, dtype, dtype in (jnp.int8, jnp.float8_e4m3fn)


def init_contiguous(batch: int, max_len: int, n_kv_heads: int, head_dim: int,
                    dtype=jnp.bfloat16) -> ContiguousCache:
    div, dt, quant = _payload(dtype)
    if max_len % div:
        raise ValueError(
            f"int4 caches pack two tokens per byte: max_len ({max_len}) "
            "must be even")
    shape = (batch, n_kv_heads, max_len // div, head_dim)
    scales = (jnp.ones((batch, n_kv_heads, max_len, 1), jnp.float32)
              if quant else None)
    return ContiguousCache(
        k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt),
        k_scales=scales, v_scales=scales)


def init_paged(num_pages: int, page_size: int, n_kv_heads: int, head_dim: int,
               dtype=jnp.bfloat16) -> PagedCache:
    div, dt, quant = _payload(dtype)
    if page_size % div:
        raise ValueError(
            f"int4 caches pack two tokens per byte: page_size ({page_size}) "
            "must be even")
    shape = (n_kv_heads, num_pages, page_size // div, head_dim)
    scales = (jnp.ones((n_kv_heads, num_pages, page_size, 1), jnp.float32)
              if quant else None)
    return PagedCache(
        k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt),
        page_size=page_size, k_scales=scales, v_scales=scales)


def kvcache_kwargs(cache) -> dict:
    """kwargs for flash_attn_with_kvcache from a cache object."""
    kw = dict(kv_cache_layout="HND")
    if cache.quantized:
        kw.update(k_scales=cache.k_scales, v_scales=cache.v_scales)
    return kw


__all__ = ["ContiguousCache", "PagedCache", "init_contiguous", "init_paged",
           "kvcache_kwargs"]
