"""Decode page-size sweep at the SERVING shape (r5): the engine decodes
against 128-token pages, but the 32k decode bench (92% roofline) runs
512-token pages — if the decode kernel's per-page DMA granularity is the
bottleneck, the device-side serving gap (24 ms/step vs the ~11 ms
bandwidth floor) is page-size-bound, not host-loop-bound."""
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_with_kvcache
from flash_attn_v100_tpu.utils.benchmarking import measure, gbps

B, Hq, Hk, D, ctx = 16, 32, 8, 128, 2048
rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
NCH = 32


def bench(ps):
    P = B * ctx // ps
    kp, vp = mkb(Hk, P, ps, D), mkb(Hk, P, ps, D)
    tbl = jnp.arange(P, dtype=jnp.int32).reshape(B, -1)
    cs = jnp.full((B,), ctx, jnp.int32)
    qd = mkb(B, 1, Hq, D)

    def chained(q, kp, vp):
        def step(qc, _):
            o = flash_attn_with_kvcache(qc, kp, vp, cache_seqlens=cs,
                                        block_table=tbl, causal=True,
                                        kv_cache_layout="HND")
            return (qc + 1e-6 * o.astype(qc.dtype)), ()
        return jax.lax.scan(step, qc if False else q, None, length=NCH)[0]

    fj = jax.jit(chained)
    try:
        fj(qd, kp, vp).block_until_ready()
    except Exception as e:
        print(f"ps={ps}: FAILED {type(e).__name__}", flush=True)
        return
    dt = statistics.median(measure(fj, qd, kp, vp, iters=3) / NCH
                           for _ in range(3))
    byts = 2 * B * ctx * Hk * D * 2
    print(f"decode b{B} ctx{ctx} ps={ps:4d}: {dt*1e3:6.3f} ms/step, "
          f"{gbps(byts, dt):5.0f} GB/s ({gbps(byts, dt)/819*100:.0f}% "
          f"roofline)", flush=True)


if __name__ == "__main__":
    for ps in (128, 256, 512, 1024):
        bench(ps)
