"""KV-cache quantization: INT8 and FP8(e4m3) payloads with per-token,
per-head fp32 scales.

This is the BASELINE.json extension the reference does not have (its cache is
fp16-only): quantized payloads halve (or quarter) the HBM bytes streamed per
decoded token — decode attention is bandwidth-bound, so this translates
directly to tokens/s.  Dequantization happens inside the decode kernel's VMEM
tiles right before the QK^T / PV matmuls
(flash_attn_v100_tpu/ops/pallas/decode.py), never materializing a
dequantized cache.

Scale granularity: one fp32 scale per (token, kv-head) over the head_dim
vector (finer than per-page, coarser than per-element) — empirically keeps
max-abs-err vs the fp16 oracle well under the 0.1 BASELINE gate for int8.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

INT8_MAX = 127.0
FP8_E4M3_MAX = 448.0


def _qmax(dtype) -> float:
    if dtype == jnp.int8:
        return INT8_MAX
    if dtype == jnp.float8_e4m3fn:
        return FP8_E4M3_MAX
    raise ValueError(f"unsupported quantized dtype {dtype}")


def quantize_kv(x: jnp.ndarray, dtype=jnp.int8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize over the last (head_dim) axis.

    x: (..., D) float -> (payload (..., D) dtype, scales (..., 1) fp32).
    """
    qmax = _qmax(dtype)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    y = x.astype(jnp.float32) / scale
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(y), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
        q = y.astype(dtype)
    return q, scale.astype(jnp.float32)


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16):
    """Inverse of quantize_kv (test/debug; the kernel dequantizes in-tile)."""
    return (q.astype(jnp.float32) * scale.astype(jnp.float32)).astype(dtype)
