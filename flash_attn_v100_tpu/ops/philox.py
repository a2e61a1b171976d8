"""Counter-based Philox-4x32-10 RNG in pure jnp uint32 ops.

Purpose: stateless, *position-keyed* dropout bits so the backward pass replays
the forward's mask without ever storing it — the same contract as the
reference's Philox use (reference: include/philox.h:13-73 and
include/softmax.h:96-124, where bits are keyed on the absolute flattened
attention index).  Because these are plain uint32 VPU ops they run identically
inside Pallas kernels (compiled or interpret mode) and in the pure-jnp oracle,
which is what makes fwd/bwd replay and oracle comparison bit-exact across
*different tile shapes*.

Keying scheme (TPU-native; we do not reproduce the CUDA bit-stream):
  counter = (col, row, batch*H + head, 0), key = (seed_lo, seed_hi)
  keep(element) = philox(counter, key).x <= keep_threshold(p_drop)

One 32-bit word per attention element.  This is 4x more Philox invocations
than the reference (which uses one 4-word block per 4 elements) but is fully
vectorized on the VPU and branch-free.
"""

from __future__ import annotations

import jax.numpy as jnp

# plain ints: jnp constants at module scope would be captured as pallas
# kernel closure constants, which pallas_call rejects
PHILOX_M_A = 0xD2511F53
PHILOX_M_B = 0xCD9E8D57
KEY_STEP_A = 0x9E3779B9
KEY_STEP_B = 0xBB67AE85


def _mulhilo32(a, b):
    """(low32, high32) of the 64-bit product of two uint32 arrays.

    TPUs have no 64-bit integer multiply, so split into 16-bit halves
    (the jnp analog of the reference's `mul.wide.u32`,
    reference: include/philox.h:13-17).
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    u16 = jnp.uint32(0xFFFF)
    a_lo = a & u16
    a_hi = a >> 16
    b_lo = b & u16
    b_hi = b >> 16
    lo_lo = a_lo * b_lo
    hi_lo = a_hi * b_lo
    lo_hi = a_lo * b_hi
    hi_hi = a_hi * b_hi
    lo = lo_lo + ((hi_lo + lo_hi) << 16)  # wraps mod 2^32, as desired
    carry = (lo_lo >> 16) + (hi_lo & u16) + (lo_hi & u16)
    hi = hi_hi + (hi_lo >> 16) + (lo_hi >> 16) + (carry >> 16)
    return lo, hi


def philox_4x32(c0, c1, c2, c3, k0, k1, rounds: int = 10):
    """Philox-4x32 with `rounds` rounds (10 = standard; the reference runs
    9 + 1 final, also 10 total: include/philox.h:46-51).

    All inputs are uint32 arrays of a common broadcastable shape.
    Returns the 4 output words (x, y, z, w).
    """
    c0 = jnp.asarray(c0, jnp.uint32)
    c1 = jnp.asarray(c1, jnp.uint32)
    c2 = jnp.asarray(c2, jnp.uint32)
    c3 = jnp.asarray(c3, jnp.uint32)
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    m_a = jnp.uint32(PHILOX_M_A)
    m_b = jnp.uint32(PHILOX_M_B)
    step_a = jnp.uint32(KEY_STEP_A)
    step_b = jnp.uint32(KEY_STEP_B)
    for _ in range(rounds):
        lo0, hi0 = _mulhilo32(m_a, c0)
        lo1, hi1 = _mulhilo32(m_b, c2)
        c0, c1, c2, c3 = hi1 ^ c1 ^ k0, lo1, hi0 ^ c3 ^ k1, lo0
        k0 = k0 + step_a
        k1 = k1 + step_b
    return c0, c1, c2, c3


def split_seed(seed) -> tuple:
    """64-bit python/jnp seed -> (lo32, hi32) uint32 scalars."""
    seed = jnp.asarray(seed, jnp.uint64) if not isinstance(seed, int) else seed
    if isinstance(seed, int):
        return (jnp.uint32(seed & 0xFFFFFFFF), jnp.uint32((seed >> 32) & 0xFFFFFFFF))
    lo = jnp.asarray(seed & jnp.uint64(0xFFFFFFFF), jnp.uint32)
    hi = jnp.asarray((seed >> jnp.uint64(32)) & jnp.uint64(0xFFFFFFFF), jnp.uint32)
    return lo, hi


def keep_threshold(p_drop: float) -> jnp.uint32:
    """uint32 threshold T such that keep <=> word <= T, P(keep) = 1 - p_drop.

    Mirrors the reference's `r <= drop_thr` keep test
    (reference: include/softmax.h:107-111).
    """
    keep = 1.0 - float(p_drop)
    t = int(round(keep * 4294967295.0))
    t = max(0, min(t, 4294967295))
    return jnp.uint32(t)


def _mullo32(a, c: int):
    """Low 32 bits of a * constant c (uint32 lane math; TPUs have no 32-bit
    integer multiply, so split the operand into 16-bit halves)."""
    u16 = jnp.uint32(0xFFFF)
    c_lo = jnp.uint32(c & 0xFFFF)
    c_hi = jnp.uint32((c >> 16) & 0xFFFF)
    a_lo = a & u16
    a_hi = a >> 16
    return a_lo * c_lo + ((a_hi * c_lo + a_lo * c_hi) << 16)  # mod 2^32


def dropout_keep_bits(row_ids, col_ids, bh_id, seed_lo, seed_hi):
    """Random word per (row, col) element of one (batch, head) slice.

    `row_ids`/`col_ids` are int32/uint32 arrays holding *absolute* q/k
    positions — pass them as BROADCASTABLE vectors ((R, 1) and (1, C)) for
    the fast path; full tiles give identical bits (the math is
    elementwise) at O(R*C) Philox cost.  `bh_id` is the flattened
    batch*H + head index.  Deterministic in the absolute position only —
    independent of tile shape — which is the property the backward replay
    relies on (reference contract: include/softmax.h:97-98, 293-304).

    TPU-native factorization (r5): a per-element 10-round Philox costs
    ~350 integer VPU ops/element — measured 17x off the dropout-free
    kernels on v5e, i.e. attention dropout was not viable.  Instead one
    full-strength Philox word is drawn per ROW and per COLUMN (O(R + C)
    heavy ops on the id vectors) and combined per element with a
    murmur3-style avalanche finalizer (~15 cheap lane ops/element,
    hash of a^b: distinct counters => the pair is unique per (row, col),
    and the finalizer is bijective, so bits pass the keep-rate and
    replay tests).  The combine is TRANSPOSE-SYMMETRIC: KV-centric
    kernels broadcast the same vectors in (C, R) orientation with no
    relayout.  The reference's per-4-element Philox
    (include/philox.h:65-73) is the GPU analog of the same
    amortization."""
    r = jnp.asarray(row_ids).astype(jnp.uint32)
    c = jnp.asarray(col_ids).astype(jnp.uint32)
    bh = jnp.asarray(bh_id).astype(jnp.uint32)
    # domain constants keep the row and column streams distinct (else
    # a ^ b == 0 whenever row == col)
    a, _, _, _ = philox_4x32(r, bh, jnp.uint32(0x524F5753), 0,
                             seed_lo, seed_hi)
    b, _, _, _ = philox_4x32(c, bh, jnp.uint32(0x434F4C53), 1,
                             seed_lo, seed_hi)
    x = a ^ b
    # single-multiply xorshift finalizer: a^b is already uniform per
    # element (XOR of independent Philox words); the one nonlinear mix
    # breaks the XOR lattice structure (4-cell parities, small-delta
    # column correlations).  One multiply is the measured sweet spot —
    # every extra 32-bit lane op costs ~1 us per 1M-element tile on v5e,
    # and dropout quality needs avalanche, not crypto margin.
    x = x ^ (x >> 16)
    x = _mullo32(x, 0x7FEB352D)
    x = x ^ (x >> 15)
    return x


def dropout_keep_mask(row_ids, col_ids, bh_id, seed_lo, seed_hi, p_drop: float):
    """Boolean keep mask for one (batch, head) slice at absolute positions."""
    bits = dropout_keep_bits(row_ids, col_ids, bh_id, seed_lo, seed_hi)
    return bits <= keep_threshold(p_drop)
