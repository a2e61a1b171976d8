"""Decompose the flash-fwd per-step cost on v5e: a standalone kernel with
the same structure (QK^T -> max -> exp2 -> sum -> PV) where each stage can
be toggled (wrong numerics — cost probe only).  Steps: grid (16,) over kv
tiles of one 1024-row q block, (1024,1024) tiles, D=128.
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

from flash_attn_v100_tpu.utils.benchmarking import measure, tflops

BQ, BK, D, NKV = 1024, 1024, 128, 16


def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc, *, stages):
    ki = pl.program_id(0)

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * 0.0883883
    if "max" in stages:
        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        m_scr[...] = m_next
    else:
        m_next = m_scr[...]
        alpha = jnp.ones_like(m_next)
    if "exp" in stages:
        p = jnp.exp2(s - m_next[:, :1])
    else:
        p = s
    if "bf16exp" in stages:
        p = jnp.exp2((s - m_next[:, :1]).astype(jnp.bfloat16))
    if "sum" in stages:
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
    if "pv" in stages:
        pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc[...] = acc[...] * alpha[:, :1] + pv

    @pl.when(ki == NKV - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def build(stages):
    def f(q, k, v):
        return pl.pallas_call(
            functools.partial(kernel, stages=stages),
            grid=(NKV,),
            in_specs=[
                pl.BlockSpec((BQ, D), lambda ki: (0, 0)),
                pl.BlockSpec((BK, D), lambda ki: (ki, 0)),
                pl.BlockSpec((BK, D), lambda ki: (ki, 0)),
            ],
            out_specs=pl.BlockSpec((BQ, D), lambda ki: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((BQ, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
        )(q, k, v)

    def chained(q, k, v):
        def step(qc, _):
            o = f(qc, k, v)
            return qc + 1e-6 * o, ()
        return jax.lax.scan(step, q, None, length=64)[0]
    return jax.jit(chained)


rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((BQ, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((BK * NKV, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((BK * NKV, D)), jnp.bfloat16)

VARIANTS = [
    ("qk only", ("",)),
    ("qk+pv", ("pv",)),
    ("qk+max+pv", ("max", "pv")),
    ("qk+exp+pv", ("exp", "pv")),
    ("qk+max+exp+pv", ("max", "exp", "pv")),
    ("full (max+exp+sum+pv)", ("max", "exp", "sum", "pv")),
    ("bf16 exp variant", ("max", "bf16exp", "sum", "pv")),
]
for name, stages in VARIANTS:
    fj = build(frozenset(stages))
    ts = [measure(fj, q, k, v, iters=4) / 64 for _ in range(3)]
    dt = statistics.median(ts) / NKV   # per (1024,1024) tile
    nmm = 1 + ("pv" in stages)
    fl = nmm * 2 * BQ * BK * D
    print(f"{name:24s}: {dt*1e6:7.3f} us/tile  "
          f"(MXU-ideal {fl/197e12*1e6:.3f})", flush=True)


# --- variant: one grid step covers a 2048-wide kv tile, processed as two
# 1024-wide sub-tiles inside the kernel (s buffer reused) ---
def kernel2(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc):
    ki = pl.program_id(0)

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    for sub in range(2):
        kk = k_ref[sub * BK:(sub + 1) * BK, :]
        vv = v_ref[sub * BK:(sub + 1) * BK, :]
        s = jax.lax.dot_general(q_ref[...], kk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * 0.0883883
        m_prev = m_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        m_scr[...] = m_next
        p = jnp.exp2(s - m_next[:, :1])
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(vv.dtype), vv,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc[...] = acc[...] * alpha[:, :1] + pv

    @pl.when(ki == NKV // 2 - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def build2():
    def f(q, k, v):
        return pl.pallas_call(
            kernel2,
            grid=(NKV // 2,),
            in_specs=[
                pl.BlockSpec((BQ, D), lambda ki: (0, 0)),
                pl.BlockSpec((2 * BK, D), lambda ki: (ki, 0)),
                pl.BlockSpec((2 * BK, D), lambda ki: (ki, 0)),
            ],
            out_specs=pl.BlockSpec((BQ, D), lambda ki: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((BQ, D), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, 128), jnp.float32),
                pltpu.VMEM((BQ, D), jnp.float32),
            ],
        )(q, k, v)

    def chained(q, k, v):
        def step(qc, _):
            o = f(qc, k, v)
            return qc + 1e-6 * o, ()
        return jax.lax.scan(step, q, None, length=64)[0]
    return jax.jit(chained)


fj = build2()
ts = [measure(fj, q, k, v, iters=4) / 64 for _ in range(3)]
dt = statistics.median(ts) / NKV
print(f"{'2048-kv, 2 sub-tiles':24s}: {dt*1e6:7.3f} us/tile  (MXU-ideal 2.725)",
      flush=True)
