"""Prefill tile-shape sweep + masked-path cost probes (VERDICT r1 #2).

Scan-chained timing (see prof_decode_scan.py).  Effective TFLOP/s uses the
causal-halved flop count, so perfect causal efficiency == the non-causal
number.

Probes:
  * tile shapes (VMEM scoped limit is 16 MB: (2048,1024) f32 scores OOM)
  * "ceiling": monkeypatch block_fully_valid -> True so every tile takes
    the fast path (WRONG numerics — measures the mask pipeline's cost only)
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
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.utils.benchmarking import measure, attention_flops, tflops

B, M, Hq, Hk, D = 4, 4096, 32, 8, 128
NCH = 4

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)


def make(causal, bq, bk):
    bs = BlockSizes(block_q=bq, block_k=bk)
    def run(qc, k, v):
        def step(qi, _):
            o = flash_attn_func(qi, k, v, causal=causal, block_sizes=bs)
            return (qi + 1e-6 * o.astype(qi.dtype)), ()
        qf, _ = jax.lax.scan(step, qc, None, length=NCH)
        return qf
    return jax.jit(run)


def bench(name, fj):
    ts = [measure(fj, q, k, v, iters=4) / NCH for _ in range(3)]
    dt = statistics.median(ts)
    return name, dt, ts


which = sys.argv[1:] or ["causal", "full", "ceiling"]
results = []

if "causal" in which or "full" in which:
    for causal in (True, False):
        if ("causal" if causal else "full") not in which:
            continue
        fl = attention_flops(B, M, M, Hq, D, causal=causal)
        for bq, bk in [(1024, 1024), (512, 2048), (1024, 2048), (2048, 256)]:
            try:
                name, dt, ts = bench(f"{'causal' if causal else 'full  '} "
                                     f"bq={bq:5d} bk={bk:5d}", make(causal, bq, bk))
                print(f"{name}: {tflops(fl, dt):6.1f} TF/s  {dt*1e3:7.3f} ms  "
                      f"runs={['%.3f' % (t*1e3) for t in ts]}", flush=True)
            except Exception as e:
                print(f"bq={bq} bk={bk} failed: {str(e)[:120]}", flush=True)

if "ceiling" in which:
    # all-fast-path ceiling: every tile skips the mask pipeline entirely
    orig = masklib.block_fully_valid
    masklib.block_fully_valid = lambda *a, **kw: True
    try:
        fl = attention_flops(B, M, M, Hq, D, causal=True)
        name, dt, ts = bench("causal CEILING 1024x1024", make(True, 1024, 1024))
        print(f"{name}: {tflops(fl, dt):6.1f} TF/s  {dt*1e3:7.3f} ms  "
              f"runs={['%.3f' % (t*1e3) for t in ts]}", flush=True)
    finally:
        masklib.block_fully_valid = orig
