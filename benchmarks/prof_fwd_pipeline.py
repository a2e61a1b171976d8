"""A/B: VPU/MXU software-pipelined dense forward (kv_unroll > 1 with the
straight-line multi-tile fast path: all S matmuls issued before the softmax
chain, register-resident (m, l, acc) carries) vs the per-tile U=1 body —
the round-3 verdict's one unexplored structural axis (VERDICT r3 #6).

Sweeps unroll x tile shape on the canonical 4k prefill shape."""
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.utils.benchmarking import measure, attention_flops, tflops

B, M, Hq, Hk, D = 4, 4096, 32, 8, 128
rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)
scale = D ** -0.5
NCH = 8


def bench(causal, U, bq, bk):
    params = masklib.MaskParams(causal=causal, window_left=-1,
                                window_right=-1, softcap=0.0, has_alibi=False)
    bs = BlockSizes(bq, bk, 512, 512, 512, 512)

    def chained(q, k, v):
        def step(qc, _):
            o, _l = flash_attn_dense_fwd(qc, k, v, scale, params,
                                         block_sizes=bs, kv_unroll=U)
            return (qc + 1e-6 * o.astype(qc.dtype)), ()
        return jax.lax.scan(step, q, None, length=NCH)[0]

    fj = jax.jit(chained)
    try:
        fj(q, k, v).block_until_ready()
    except Exception as e:
        print(f"causal={causal} U={U} ({bq},{bk}): FAILED {type(e).__name__}",
              flush=True)
        return
    dt = statistics.median(measure(fj, q, k, v, iters=3) / NCH for _ in range(3))
    fl = attention_flops(B, M, M, Hq, D, causal=causal)
    print(f"causal={causal} U={U} ({bq:4d},{bk:4d}): {tflops(fl, dt):6.1f} TF/s"
          f"  {dt*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    for causal in (True, False):
        bench(causal, 1, 1024, 1024)          # production baseline
        for (bq, bk) in ((1024, 512), (512, 512), (1024, 1024), (512, 1024)):
            for U in (2, 4):
                bench(causal, U, bq, bk)
