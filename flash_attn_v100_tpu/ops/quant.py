"""KV-cache quantization: INT8, FP8(e4m3) and packed INT4 payloads with
per-token, per-head fp32 scales.

This is the BASELINE.json extension the reference does not have (its cache is
fp16-only): quantized payloads halve / quarter / eighth the HBM bytes streamed
per decoded token — decode attention is bandwidth-bound, so this translates
directly to tokens/s.  Dequantization happens inside the decode kernel's VMEM
tiles right before the QK^T / PV matmuls
(flash_attn_v100_tpu/ops/pallas/decode.py), never materializing a
dequantized cache.

Scale granularity: one fp32 scale per (token, kv-head) over the head_dim
vector (finer than per-page, coarser than per-element) — empirically keeps
max-abs-err vs the fp16 oracle well under the 0.1 BASELINE gate for int8
(~1e-3).  int4's resolution bounds per-element error at scale/2 = amax/14
(~0.3 for unit-normal data): typical attention-averaged output error is
~2e-2 but approaches the bound when the softmax concentrates — int4 is the
capacity-over-accuracy point of the family, gated at 0.3 in tests.

INT4 layout: two 4-bit values packed per int8 byte along the TOKEN axis —
byte (t2, d) of a (N/2, D) payload holds token 2*t2's dim d in its low
nibble and token 2*t2+1's dim d in its high nibble.  The high nibble is
two's complement; the LOW nibble is stored BIASED by +8 (value + 8 in
[0, 15]).  Rationale:
  * Mosaic legalizes bitwise AND on int8 vectors but not shifts/mul/sub,
    so the decode kernel recovers both halves with two AND ops —
    `byte & 15` = lo + 8 and `byte & -16` = 16 * hi exactly — and folds
    the +8 bias and the 16x out as linear corrections on the small score
    tiles.
  * Packing along TOKENS (not head_dim) keeps the streamed payload tile at
    the full 128-lane head_dim, so (a) the ANDs run on full-lane registers
    and (b) each nibble half is a complete (N/2, D) K/V operand — the QK
    and PV matmuls run at full MXU contraction depth with no lane-concat
    relayout of the streamed tile.  The earlier head_dim packing made
    64-lane tiles whose nibble halves had to be lane-concatenated back to
    D before every matmul, pinning int4 decode at ~36% of its roofline.
`dtype="int4"` (or jnp.int4) selects it.  Scales stay one fp32 per
(token, head), token-ordered; the decode wrapper permutes them per page to
the kernel's [even tokens | odd tokens] score order.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
INT4_MAX = 7.0
FP8_E4M3_MAX = 448.0


def is_int4(dtype) -> bool:
    return dtype == "int4" or dtype is getattr(jnp, "int4", object())


def _qmax(dtype) -> float:
    if is_int4(dtype):
        return INT4_MAX
    if dtype == jnp.int8:
        return INT8_MAX
    if dtype == jnp.float8_e4m3fn:
        return FP8_E4M3_MAX
    raise ValueError(f"unsupported quantized dtype {dtype}")


def pack_int4(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Pack two int arrays of 4-bit values (-8..7) into one int8 byte array.
    Low nibble stores lo + 8 (biased, [0, 15]); high nibble stores hi in
    two's complement — see the module docstring for why."""
    lo = (lo.astype(jnp.int32) + 8) & 0xF
    hi = hi.astype(jnp.int32) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack_int4: (lo, hi) int8 arrays with the bias removed."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) - 8).astype(jnp.int8)
    hi = ((p << 24) >> 28).astype(jnp.int8)
    return lo, hi


def quantize_int4_values(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, head) int4 quantization WITHOUT packing: x (..., D) float
    -> (values (..., D) int8 in [-8, 7], scales (..., 1) fp32).  The append
    path uses this and merges nibbles into the packed cache byte itself
    (the partner token's nibble may already live in the cache)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / INT4_MAX, 1e-8)
    q4 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -8, INT4_MAX)
    return q4.astype(jnp.int8), scale.astype(jnp.float32)


def pack_int4_tokens(q4: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Pack int4 values (-8..7) pairwise along a TOKEN axis: (..., N, ..., D)
    -> (..., N/2, ..., D) bytes, token 2t in the low nibble (biased +8),
    token 2t+1 in the high nibble."""
    axis = axis % q4.ndim
    n = q4.shape[axis]
    if n % 2:
        raise ValueError("int4 token packing needs an even token count")
    lo = jax.lax.slice_in_dim(q4, 0, n, 2, axis=axis)
    hi = jax.lax.slice_in_dim(q4, 1, n, 2, axis=axis)
    return pack_int4(lo, hi)


def unpack_int4_tokens(packed: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Inverse of pack_int4_tokens: (..., N/2, ..., D) bytes ->
    (..., N, ..., D) int8 values in token order."""
    axis = axis % packed.ndim
    lo, hi = unpack_int4(packed)
    st = jnp.stack([lo, hi], axis=axis + 1)   # (..., N/2, 2, ..., D)
    shape = packed.shape[:axis] + (2 * packed.shape[axis],) + packed.shape[axis + 1:]
    return st.reshape(shape)


def quantize_kv(x: jnp.ndarray, dtype=jnp.int8,
                token_axis: int = -2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize over the last (head_dim) axis.

    x: (..., D) float -> (payload, scales (..., 1) fp32).  Payload keeps
    x's shape in dtype for int8/fp8; dtype="int4" packs token pairs along
    `token_axis` (must be even-sized; see the module docstring) to int8
    bytes, halving that axis.  `token_axis` is -2 for head-major (HND)
    caches, 1 for the reference's token-major (NHD) layouts.
    """
    if is_int4(dtype):
        q4, scale = quantize_int4_values(x)
        return pack_int4_tokens(q4, axis=token_axis), scale
    qmax = _qmax(dtype)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / qmax, 1e-8)
    y = x.astype(jnp.float32) / scale
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(y), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
        q = y.astype(dtype)
    return q, scale.astype(jnp.float32)


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16,
                  int4: bool = False, token_axis: int = -2):
    """Inverse of quantize_kv (test/debug; the kernel dequantizes in-tile)."""
    if int4:
        q = unpack_int4_tokens(q, axis=token_axis)
    return (q.astype(jnp.float32) * scale.astype(jnp.float32)).astype(dtype)
