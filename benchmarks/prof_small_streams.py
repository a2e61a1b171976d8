"""Measure the per-step cost of SMALL side-vector input streams (the varlen
kernels' qseg/qpos/qoff/kseg/kpos) on top of a minimal flash step.

prof_fwd_gap.py put the minimal (1024,1024,D128) flash step at ~4.0 us;
the varlen fast path measures ~5.4 us/step.  Each variant here adds the
varlen kernels' side streams to the minimal kernel to see whether the gap
is stream DMA (cost probe only — values unused where possible is avoided:
every loaded ref feeds the result so Mosaic can't DCE the DMA).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import statistics

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_v100_tpu.utils.benchmarking import measure

BH, D = 128, 128
M = N = 4096
BQ = BK = 1024
NQ, NKV = M // BQ, N // BK
LOG2E = 1.4426950408889634


def body(q, k, v, m_scr, l_scr, acc, extra=None):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * (0.0883883 * LOG2E)
    if extra is not None:
        s = s + extra  # consume side streams so their DMAs stay live
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


def make(n_qside: int, n_kside: int):
    """n_qside column-vector (BQ,1) streams indexed by qi; n_kside
    row-vector (1,BK) streams indexed by ki."""
    def kernel(*refs):
        qside = refs[:n_qside]
        kside = refs[n_qside:n_qside + n_kside]
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc = refs[n_qside + n_kside:]
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc[...] = jnp.zeros_like(acc)

        extra = None
        if qside or kside:
            extra = jnp.zeros((), jnp.float32)
            for r in qside:
                extra = extra + r[...].astype(jnp.float32)  # (BQ,1) bcast
            for r in kside:
                extra = extra + r[...].astype(jnp.float32)  # (1,BK) bcast
            extra = extra * 0.0  # numerics-neutral, DMA still required
        body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc, extra)

        @pl.when(ki == NKV - 1)
        def _():
            o_ref[0] = acc[...].astype(o_ref.dtype)

    def f(q, k, v):
        qvecs = [jnp.zeros((M, 1), jnp.int32) for _ in range(n_qside)]
        kvecs = [jnp.zeros((1, N), jnp.int32) for _ in range(n_kside)]
        in_specs = (
            [pl.BlockSpec((BQ, 1), lambda bh, qi, ki: (qi, 0))] * n_qside
            + [pl.BlockSpec((1, BK), lambda bh, qi, ki: (0, ki))] * n_kside
            + [
                pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // 4, ki, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // 4, ki, 0)),
            ])
        return pl.pallas_call(
            kernel,
            grid=(BH, NQ, NKV),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, M, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(*qvecs, *kvecs, q, k, v)
    return f


def run(name, f):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, M, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH // 4, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH // 4, N, D)), jnp.bfloat16)

    def chained(qc, k, v):
        def step(qi, _):
            o = f(qi, k, v)
            return qi + 1e-6 * o.astype(qi.dtype), ()
        return jax.lax.scan(step, qc, None, length=8)[0]

    fj = jax.jit(chained)
    dt = statistics.median(measure(fj, q, k, v, iters=4) / 8 for _ in range(3))
    steps = BH * NQ * NKV
    print(f"{name:28s}: {dt*1e6/steps:6.3f} us/step  total {dt*1e3:.3f} ms",
          flush=True)


def make_dynamic_grid():
    """minimal kernel but the inner grid dim is a TRACED scalar (the varlen
    kernels' dynamic live-window length)."""
    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc[...] = jnp.zeros_like(acc)

        body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc)

        @pl.when(ki == pl.num_programs(2) - 1)
        def _():
            o_ref[0] = acc[...].astype(o_ref.dtype)

    def f(q, k, v):
        win = jnp.asarray(k.shape[1] // BK, jnp.int32)  # traced trip count
        return pl.pallas_call(
            kernel,
            grid=(BH, NQ, win),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // 4, ki, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // 4, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, M, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v)
    return f


def make_branches(n_seg_streams: bool = True):
    """minimal + the varlen fast path's per-step scalar logic: seg-overlap
    VPU reduction over (BQ,1)x(1,BK) seg vectors + a 3-way pl.when branch
    (only the first ever taken, like uniform-sequence batches)."""
    def kernel(qseg_ref, kseg_ref, q_ref, k_ref, v_ref, o_ref,
               m_scr, l_scr, acc):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            m_scr[...] = jnp.full_like(m_scr, -1e30)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc[...] = jnp.zeros_like(acc)

        q_seg = qseg_ref[...]
        k_seg = kseg_ref[...]
        qmin = jnp.min(q_seg); qmax = jnp.max(q_seg)
        kmin = jnp.min(k_seg); kmax = jnp.max(k_seg)
        run = (kmin <= qmax) & (qmin <= kmax)
        uniform = (qmin == qmax) & (kmin == kmax)

        @pl.when(run & uniform)
        def _fast():
            body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc)

        @pl.when(run & jnp.logical_not(uniform) & (qmin == kmin))
        def _semi():
            body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc)

        @pl.when(run & jnp.logical_not(uniform) & (qmin != kmin))
        def _general():
            body(q_ref[0], k_ref[0], v_ref[0], m_scr, l_scr, acc)

        @pl.when(ki == NKV - 1)
        def _():
            o_ref[0] = acc[...].astype(o_ref.dtype)

    def f(q, k, v):
        qseg = jnp.zeros((M, 1), jnp.int32)
        kseg = jnp.zeros((1, N), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(BH, NQ, NKV),
            in_specs=[
                pl.BlockSpec((BQ, 1), lambda bh, qi, ki: (qi, 0)),
                pl.BlockSpec((1, BK), lambda bh, qi, ki: (0, ki)),
                pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // 4, ki, 0)),
                pl.BlockSpec((1, BK, D), lambda bh, qi, ki: (bh // 4, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, BQ, D), lambda bh, qi, ki: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, M, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(qseg, kseg, q, k, v)
    return f


if __name__ == "__main__":
    run("no side streams", make(0, 0))
    run("2 k-side (1,BK)", make(0, 2))
    run("3 q-side (BQ,1)", make(3, 0))
    run("3 q-side + 2 k-side", make(3, 2))
    run("dynamic inner grid", make_dynamic_grid())
    run("seg-reduce + 3 branches", make_branches())
