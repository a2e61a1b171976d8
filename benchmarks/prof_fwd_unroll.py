"""A/B: dense forward kv_unroll (multi-KV-tile grid steps) on the 4k
prefill shape — the decode kv_unroll lever applied to prefill
(round-2 verdict experiment)."""
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.ops.pallas.fwd import flash_attn_dense_fwd
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.utils.benchmarking import measure, attention_flops, tflops

B, M, Hq, Hk, D = 4, 4096, 32, 8, 128
rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)
scale = D ** -0.5
NCH = 8


def bench(causal, U):
    params = masklib.MaskParams(causal=causal, window_left=-1,
                                window_right=-1, softcap=0.0, has_alibi=False)

    def chained(q, k, v):
        def step(qc, _):
            o, _l = flash_attn_dense_fwd(qc, k, v, scale, params, kv_unroll=U)
            return (qc + 1e-6 * o.astype(qc.dtype)), ()
        return jax.lax.scan(step, q, None, length=NCH)[0]

    fj = jax.jit(chained)
    fj(q, k, v).block_until_ready()
    dt = statistics.median(measure(fj, q, k, v, iters=3) / NCH for _ in range(3))
    fl = attention_flops(B, M, M, Hq, D, causal=causal)
    print(f"causal={causal} U={U}: {tflops(fl, dt):6.1f} TF/s  {dt*1e3:.3f} ms",
          flush=True)


for causal in (True, False):
    for U in (1, 2, 4):
        bench(causal, U)
