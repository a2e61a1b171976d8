"""Bisect the production-fwd vs straight-line-probe per-step gap.

prof_softmax_cost.py shows a (1024,1024,D128) flash step costs 3.44 us in a
minimal kernel; the production kernel runs 4.17 us/step (non-causal, 4k).
Each variant here adds ONE production feature to the minimal kernel to find
where the ~0.7 us goes (cost probe only — numerics not checked).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import statistics

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_v100_tpu.utils.benchmarking import measure

B, Hq, Hk, D = 4, 32, 8, 128
M = N = 4096
BQ = BK = 1024
NQ, NKV = M // BQ, N // BK
group = Hq // Hk
LOG2E = 1.4426950408889634


def body(q, k, v, m_scr, l_scr, acc, scale):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    m_prev = m_scr[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, :1])
    m_scr[...] = m_next
    l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc[...] = acc[...] * alpha[:, :1] + pv


# ---------------- variants ----------------

def make_minimal():
    """grid (BH, NQ, NKV) rectangular, 3D blocks, no lse, no prefetch."""
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc[...] = jnp.zeros_like(acc)

        body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc, 0.0883883 * LOG2E)

        @pl.when(ki == NKV - 1)
        def _():
            o_ref[0] = acc[...].astype(o_ref.dtype)

    def f(q, k, v):   # q (BH, M, D), k/v (BH_k, N, D) pre-expanded
        return pl.pallas_call(
            kernel,
            grid=(B * Hq, NQ, NKV),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // group, ki, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // group, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B * Hq, M, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v)
    return f, "3d"


def make_lse():
    """minimal + lse output block."""
    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc[...] = jnp.zeros_like(acc)

        body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc, 0.0883883 * LOG2E)

        @pl.when(ki == NKV - 1)
        def _():
            l = l_scr[:, :1]
            li = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0] = (acc[...] * li).astype(o_ref.dtype)
            lse_ref[0] = jnp.where(l == 0.0, -jnp.inf,
                                   m_scr[:, :1] * 0.6931 + jnp.log(l))

    def f(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(B * Hq, NQ, NKV),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // group, ki, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // group, ki, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, BQ, 1), lambda bh, qi, ki: (bh, qi, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B * Hq, M, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((B * Hq, M, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v)
    return f, "3d"


def make_prefetch():
    """minimal + lse + flattened live-pair prefetch grid (non-causal pairs)."""
    qi_of = np.repeat(np.arange(NQ, dtype=np.int32), NKV)
    ki_of = np.tile(np.arange(NKV, dtype=np.int32), NQ)
    first = (ki_of == 0).astype(np.int32)
    last = (ki_of == NKV - 1).astype(np.int32)
    pairs = jnp.asarray(np.stack([qi_of, ki_of, first, last]))
    T = len(qi_of)

    def kernel(pairs_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc):
        t = pl.program_id(1)

        @pl.when(pairs_ref[2, t] == 1)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc[...] = jnp.zeros_like(acc)

        body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc, 0.0883883 * LOG2E)

        @pl.when(pairs_ref[3, t] == 1)
        def _():
            l = l_scr[:, :1]
            li = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0] = (acc[...] * li).astype(o_ref.dtype)
            lse_ref[0] = jnp.where(l == 0.0, -jnp.inf,
                                   m_scr[:, :1] * 0.6931 + jnp.log(l))

    def f(q, k, v):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * Hq, T),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda bh, t, mp: (bh, mp[0, t], 0)),
                pl.BlockSpec((1, BK, D), lambda bh, t, mp: (bh // group, mp[1, t], 0)),
                pl.BlockSpec((1, BK, D), lambda bh, t, mp: (bh // group, mp[1, t], 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, BQ, D), lambda bh, t, mp: (bh, mp[0, t], 0)),
                pl.BlockSpec((1, BQ, 1), lambda bh, t, mp: (bh, mp[0, t], 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=(
                jax.ShapeDtypeStruct((B * Hq, M, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((B * Hq, M, 1), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(pairs, q, k, v)
    return f, "3d"


def make_4d():
    """lse variant but with production's 4D (B, H, M, D) layout + grid."""
    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc):
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc[...] = jnp.zeros_like(acc)

        body(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], m_scr, l_scr, acc,
             0.0883883 * LOG2E)

        @pl.when(ki == NKV - 1)
        def _():
            l = l_scr[:, :1]
            li = jnp.where(l == 0.0, 0.0, 1.0 / l)
            o_ref[0, 0] = (acc[...] * li).astype(o_ref.dtype)
            lse_ref[0, 0] = jnp.where(l == 0.0, -jnp.inf,
                                      m_scr[:, :1] * 0.6931 + jnp.log(l))

    def f(q, k, v):  # q (B, Hq, M, D) etc.
        q = q.reshape(B, Hq, M, D)
        k = k.reshape(B, Hk, N, D)
        v = v.reshape(B, Hk, N, D)
        return pl.pallas_call(
            kernel,
            grid=(B, Hq, NQ, NKV),
            in_specs=[
                pl.BlockSpec((1, 1, BQ, D), lambda b, h, qi, ki: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, BK, D), lambda b, h, qi, ki: (b, h // group, ki, 0)),
                pl.BlockSpec((1, 1, BK, D), lambda b, h, qi, ki: (b, h // group, ki, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, BQ, D), lambda b, h, qi, ki: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, BQ, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, Hq, M, D), jnp.bfloat16),
                jax.ShapeDtypeStruct((B, Hq, M, 1), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
        )(q, k, v)
    return f, "3d"


def run(name, f):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B * Hq, M, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B * Hk, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B * Hk, N, D)), jnp.bfloat16)

    def chained(qc, k, v):
        def step(qi, _):
            o = f(qi, k, v)
            o = o[0] if isinstance(o, tuple) else o
            return qi + 1e-6 * o.reshape(qi.shape).astype(qi.dtype), ()
        return jax.lax.scan(step, qc, None, length=8)[0]

    fj = jax.jit(chained)
    dt = statistics.median(measure(fj, q, k, v, iters=4) / 8 for _ in range(3))
    steps = B * Hq * NQ * NKV
    print(f"{name:22s}: {dt*1e6/steps:6.3f} us/step  total {dt*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    run("minimal 3d rect", make_minimal()[0])
    run("+lse", make_lse()[0])
    run("+prefetch pairs", make_prefetch()[0])
    run("4d layout (prod-like)", make_4d()[0])
