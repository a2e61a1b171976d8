"""Prefill tile-shape sweep (VERDICT r1 #2: causal 83 -> >=110 TF/s).

Scan-chained timing (see prof_decode_scan.py).  Effective TFLOP/s uses the
causal-halved flop count, so perfect causal efficiency == the non-causal
number.  Dead diagonal area is bk/M of the causal work: asymmetric tiles
(wide q, narrow k) shrink it.
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
NCH = 4

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)


def make(causal, bq, bk):
    bs = BlockSizes(block_q=bq, block_k=bk)
    def core(qc, k, v):
        return flash_attn_func(qc, k, v, causal=causal, block_sizes=bs)
    def run(qc, k, v):
        def step(qi, _):
            o = core(qi, k, v)
            return (qi + 1e-6 * o.astype(qi.dtype)), ()
        qf, _ = jax.lax.scan(step, qc, None, length=NCH)
        return qf
    return jax.jit(run)


TILES = [(1024, 1024), (1024, 512), (2048, 512), (1024, 256), (2048, 1024),
         (512, 512), (2048, 256), (4096, 512), (512, 1024)]
which = sys.argv[1:] or ["causal", "full"]

for causal in (True, False):
    if ("causal" if causal else "full") not in which:
        continue
    fl = attention_flops(B, M, M, Hq, D, causal=causal)
    for bq, bk in TILES:
        fj = make(causal, bq, bk)
        ts = []
        for r in range(3):
            ts.append(measure(fj, q, k, v, iters=4) / NCH)
        dt = statistics.median(ts)
        print(f"{'causal' if causal else 'full  '} bq={bq:5d} bk={bk:5d}: "
              f"{tflops(fl, dt):6.1f} TF/s  {dt*1e3:7.3f} ms  "
              f"runs={['%.3f' % (t*1e3) for t in ts]}", flush=True)
