"""A/B: unrolled + pipelined dQ pass (r4) — dq kernel kv_unroll=2
straight-line fast path vs the r3 per-tile body.  Run BEFORE/AFTER by
flipping the U rule in flash_attn_dense_bwd; this script just times the
full fwd+bwd at the canonical shape and prints the decomposition."""
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def bench(name, causal, bs):
    def loss(qc, k, v):
        return (flash_attn_func(qc, k, v, causal=causal, block_sizes=bs)
                * do).astype(jnp.float32).sum()
    g = jax.grad(loss, argnums=(0, 1, 2))

    def run(qc, k, v):
        def step(qi, _):
            dq, dk, dv = g(qi, k, v)
            # r5 fix: consume dk/dv too — the old dq-only carry let XLA
            # dead-code-eliminate the dkv kernel, so r4's "fwd+bwd"
            # numbers here were really fwd+dq
            return (qi + 1e-6 * dq.astype(qi.dtype)
                    + (1e-9 * (dk.sum() + dv.sum())).astype(qi.dtype)), ()
        return jax.lax.scan(step, qc, None, length=NCH)[0]

    fj = jax.jit(run)
    try:
        fj(q, k, v).block_until_ready()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}", flush=True)
        return
    dt = statistics.median(measure(fj, q, k, v, iters=4) / NCH
                           for _ in range(3))
    fl = attention_flops(B, M, M, Hq, D, causal=causal)
    print(f"{name} causal={causal}: {dt*1e3:7.3f} ms  "
          f"({tflops(fl*2.5, dt):5.1f} TF/s eff)", flush=True)


if __name__ == "__main__":
    for causal in (True, False):
        bench("dq512sq dkv512sq", causal,
              BlockSizes(1024, 1024, 512, 512, 512, 512))
        bench("dq512x1024 dkv512sq", causal,
              BlockSizes(1024, 1024, 512, 1024, 512, 512))
