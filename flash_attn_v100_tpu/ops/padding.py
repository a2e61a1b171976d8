"""Padded <-> ragged (varlen) conversion utilities.

JAX re-design of the reference's `flash_attn/bert_padding.py` (all of it:
reference: flash_attn/bert_padding.py:9-147).  The reference needs custom
autograd Functions for gather/scatter; in JAX `jnp.take`/`segment` scatter are
natively differentiable, so the API surface is plain functions.  Gradient
behavior matches: `unpad_input`'s VJP scatters zeros into padding, `pad_input`'s
VJP gathers, `index_first_axis_residual` routes the residual gradient additively
(reference: bert_padding.py:56-76).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def index_first_axis(x: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of the first axis (reference: bert_padding.py:9-33,
    `IndexFirstAxis`).  Differentiable: VJP is a zero-fill scatter."""
    return jnp.take(x, indices, axis=0)


def index_put_first_axis(values: jnp.ndarray, indices: jnp.ndarray,
                         first_axis_dim: int) -> jnp.ndarray:
    """Scatter rows into a zero tensor of leading dim `first_axis_dim`
    (reference: bert_padding.py:36-53, `IndexPutFirstAxis`)."""
    out = jnp.zeros((first_axis_dim,) + values.shape[1:], values.dtype)
    return out.at[indices].set(values)


def index_first_axis_residual(x: jnp.ndarray, indices: jnp.ndarray):
    """Gather + pass-through residual whose gradients merge additively
    (reference: bert_padding.py:56-76)."""

    @jax.custom_vjp
    def _f(x):
        return jnp.take(x, indices, axis=0), x

    def _fwd(x):
        return _f(x), None

    def _bwd(_, cts):
        g_out, g_res = cts
        g = g_res.at[indices].add(g_out)
        return (g,)

    _f.defvjp(_fwd, _bwd)
    return _f(x)


def unpad_input(hidden_states: jnp.ndarray, attention_mask: jnp.ndarray,
                unused_mask: Optional[jnp.ndarray] = None):
    """Padded (B, S, ...) -> ragged (total_nnz, ...).

    Returns (hidden, indices, cu_seqlens, max_seqlen_in_batch, seqlens) —
    the exact tuple of the reference (bert_padding.py:79-106).

    Note: `total_nnz` is data-dependent, so this function is not jittable as-is
    (like the reference, which calls `.item()`); run it outside jit or pad the
    result yourself.
    """
    import numpy as np

    mask = attention_mask if unused_mask is None else attention_mask + unused_mask
    mask = np.asarray(mask)
    seqlens = mask.sum(axis=-1).astype(np.int32)
    indices = np.nonzero(mask.reshape(-1))[0].astype(np.int32)
    max_seqlen = int(seqlens.max()) if seqlens.size else 0
    cu_seqlens = np.concatenate([[0], np.cumsum(seqlens)]).astype(np.int32)
    flat = hidden_states.reshape((-1,) + hidden_states.shape[2:])
    return (
        index_first_axis(flat, jnp.asarray(indices)),
        jnp.asarray(indices),
        jnp.asarray(cu_seqlens),
        max_seqlen,
        jnp.asarray(seqlens),
    )


def unpad_input_for_concatenated_sequences(hidden_states: jnp.ndarray,
                                           attention_mask_in_length: jnp.ndarray):
    """Multiple short samples concatenated per row
    (reference: bert_padding.py:109-132)."""
    import numpy as np

    aml = np.asarray(attention_mask_in_length)
    length = aml.sum(axis=-1)
    seqlen = aml.shape[-1]
    mask2d = np.arange(seqlen)[None, :] < length[:, None]
    real_idx = np.nonzero(aml.reshape(-1))[0]
    seqlens = aml.reshape(-1)[real_idx].astype(np.int32)
    indices = np.nonzero(mask2d.reshape(-1))[0].astype(np.int32)
    max_seqlen = int(seqlens.max()) if seqlens.size else 0
    cu_seqlens = np.concatenate([[0], np.cumsum(seqlens)]).astype(np.int32)
    flat = hidden_states.reshape((-1,) + hidden_states.shape[2:])
    return (
        index_first_axis(flat, jnp.asarray(indices)),
        jnp.asarray(indices),
        jnp.asarray(cu_seqlens),
        max_seqlen,
    )


def pad_input(hidden_states: jnp.ndarray, indices: jnp.ndarray, batch: int,
              seqlen: int) -> jnp.ndarray:
    """Ragged (total_nnz, ...) -> padded (B, S, ...)
    (reference: bert_padding.py:135-147)."""
    out = index_put_first_axis(hidden_states, indices, batch * seqlen)
    return out.reshape((batch, seqlen) + hidden_states.shape[1:])
