"""Rotary position embedding.

Semantics of the reference's fused rotary device code
(reference: include/rotary.h:89-142 interleaved pairs (2i, 2i+1);
:200-257 non-interleaved halves (i, i + rot_dim/2)), as standalone
vectorized ops.  The reference fuses RoPE into the kvcache kernel because GPU
kernel launches are expensive; on TPU the decode-time Q/K-new tensors are tiny
(T_new tokens) and XLA fuses these elementwise ops into the surrounding
computation — fusing them into the Pallas kernel would buy nothing and cost
kernel complexity.

cos/sin layout: (seqlen_ro, rot_dim/2) — reference validation:
kernel/fused_mha_forward_kvcache.cu:569-594 (rot_dim % 16 == 0 there; here any
even rot_dim <= head_dim works).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def apply_rotary_emb(
    x: jnp.ndarray,            # (..., T, H, D)
    cos: jnp.ndarray,          # (seqlen_ro, rot_dim/2)
    sin: jnp.ndarray,
    positions: jnp.ndarray,    # broadcastable to (..., T): absolute positions
    interleaved: bool = True,
) -> jnp.ndarray:
    """Rotate the first rot_dim features of x at the given positions."""
    rot_half = cos.shape[-1]
    rot_dim = 2 * rot_half
    D = x.shape[-1]
    assert rot_dim <= D

    c = jnp.take(cos, positions, axis=0).astype(jnp.float32)  # (..., T, rot/2)
    s = jnp.take(sin, positions, axis=0).astype(jnp.float32)
    # add head axis: (..., T, 1, rot/2)
    c = c[..., None, :]
    s = s[..., None, :]

    xr = x[..., :rot_dim].astype(jnp.float32)
    rest = x[..., rot_dim:]

    if interleaved:
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
    else:
        x1 = xr[..., :rot_half]
        x2 = xr[..., rot_half:]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.concatenate([o1, o2], axis=-1)

    out = out.astype(x.dtype)
    if rot_dim < D:
        out = jnp.concatenate([out, rest], axis=-1)
    return out
