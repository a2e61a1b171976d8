"""Dense backward tile sweep (dq and dkv tiles independently), scan-chained.

Round-1 chose 512-square from sweeps of the pre-flattened-grid kernels;
re-sweep after the round-2 kernel changes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import statistics

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_func
from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
from flash_attn_v100_tpu.utils.benchmarking import measure, attention_flops, tflops

B, M, Hq, Hk, D = 4, 4096, 32, 8, 128
NCH = 2

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)
do = mkb(B, M, Hq, D)


def make(bs):
    def loss(qc, k, v):
        return (flash_attn_func(qc, k, v, causal=True, block_sizes=bs)
                * do).astype(jnp.float32).sum()
    g = jax.grad(loss, argnums=(0, 1, 2))

    def run(qc, k, v):
        def step(qi, _):
            dq, dk, dv = g(qi, k, v)
            return (qi + 1e-6 * dq.astype(qi.dtype)), ()
        return jax.lax.scan(step, qc, None, length=NCH)[0]
    return jax.jit(run)


CFGS = [
    ("dq512sq dkv512sq (default)", BlockSizes(1024, 1024, 512, 512, 512, 512)),
    ("dq512x1024 dkv512sq",        BlockSizes(1024, 1024, 512, 1024, 512, 512)),
    ("dq1024x512 dkv512sq",        BlockSizes(1024, 1024, 1024, 512, 512, 512)),
    ("dq512sq dkv512x1024",        BlockSizes(1024, 1024, 512, 512, 1024, 512)),
    ("dq512sq dkv1024x512",        BlockSizes(1024, 1024, 512, 512, 512, 1024)),
    ("dq1024x512 dkv1024x512",     BlockSizes(1024, 1024, 1024, 512, 512, 1024)),
    ("256sq both",                 BlockSizes(1024, 1024, 256, 256, 256, 256)),
    ("dq1024sq dkv512sq",          BlockSizes(1024, 1024, 1024, 1024, 512, 512)),
    ("dq512sq dkv1024sq",          BlockSizes(1024, 1024, 512, 512, 1024, 1024)),
    ("1024sq both",                BlockSizes(1024, 1024, 1024, 1024, 1024, 1024)),
]

fl = attention_flops(B, M, M, Hq, D, causal=True)
for name, bs in CFGS:
    try:
        fj = make(bs)
        ts = [measure(fj, q, k, v, iters=4) / NCH for _ in range(3)]
        dt = statistics.median(ts)
        print(f"{name:28s}: {dt*1e3:7.3f} ms  "
              f"({tflops(fl*2.5, dt):5.1f} TF/s eff)", flush=True)
    except Exception as e:
        print(f"{name:28s}: FAILED {str(e)[:100]}", flush=True)
