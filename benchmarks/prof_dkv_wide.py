"""A/B (r5, VERDICT r4 #6): dKV backward with a WIDER q dimension per grid
step.  The r4 U=2 sub-tile unroll measured negative (four per-u operand
streams); the operand-sharing formulation is simply a LARGER block_q_dkv —
one q/do/lse/delta stream at double width, one wide S^T matmul, one VPU
chain, K/V resident.  Sweeps dkv tile shapes at the canonical 4k shape and
reports fwd+bwd effective TF/s."""
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
rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)
do = mkb(B, M, Hq, D)
NCH = 4


def bench(causal, bq_dkv, bk_dkv, bq_dq=512, bk_dq=512):
    bs = BlockSizes(1024, 1024, bq_dq, bk_dq, bq_dkv, bk_dkv)

    def loss(q, k, v):
        return (flash_attn_func(q, k, v, causal=causal, block_sizes=bs)
                .astype(jnp.float32) * do.astype(jnp.float32)).sum()

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def chained(q, k, v):
        def step(qc, _):
            dq, dk, dv = grad(qc, k, v)
            # consume ALL grads in the carry — a dq-only chain lets XLA
            # dead-code-eliminate the entire dkv kernel
            return (qc + 1e-6 * dq.astype(qc.dtype)
                    + (1e-9 * (dk.sum() + dv.sum())).astype(qc.dtype)), ()
        return jax.lax.scan(step, q, None, length=NCH)[0]

    fj = jax.jit(chained)
    try:
        fj(q, k, v).block_until_ready()
    except Exception as e:
        print(f"causal={causal} dkv=({bq_dkv},{bk_dkv}): FAILED "
              f"{type(e).__name__}", flush=True)
        return
    dt = statistics.median(measure(fj, q, k, v, iters=3) / NCH
                           for _ in range(3))
    fl = attention_flops(B, M, M, Hq, D, causal=causal) * 3.5  # fwd+bwd
    print(f"causal={causal} dkv=({bq_dkv:4d},{bk_dkv:4d}): "
          f"{tflops(fl, dt):6.1f} TF/s eff  {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    for causal in (True,):
        bench(causal, 512, 512)     # production baseline
        bench(causal, 1024, 512)    # wide q per step (operand sharing)
        bench(causal, 1024, 256)
        bench(causal, 768, 512)
        bench(causal, 1024, 1024)
        bench(causal, 512, 1024)
