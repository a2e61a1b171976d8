"""Int4 vs int8 decode timing on hardware (32k ctx, scan-chained).

Round-2 history: the original head_dim-packed int4 layout measured ~36% of
its HBM roofline (8.3k tok/s, BELOW int8's 10.7k) — the 64-lane payload
tiles forced a lane-concat relayout of the full streamed tile before every
MXU call.  The token-packed layout (quant.py) streams full-lane (ps/2, D)
tiles whose nibble halves are complete K/V operands, so the matmuls run at
full depth with no big-tile relayout.  This script reports both dtypes at
equal shapes so the ratio is the regression gate: int4 should approach
2x int8 tok/s (same ~90% of its own halved-byte roofline).
"""
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_with_kvcache
from flash_attn_v100_tpu.ops.quant import quantize_kv
from flash_attn_v100_tpu.utils.benchmarking import measure, gbps

B, Hq, Hk, D = 8, 32, 8, 128
ctx = int(os.environ.get("CTX", "32768"))
PS = int(os.environ.get("PS", "512"))
N_CHAIN = int(os.environ.get("N_CHAIN", "16"))

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

P_ = B * ctx // PS
kpool, vpool = mkb(Hk, P_, PS, D), mkb(Hk, P_, PS, D)
table = jnp.arange(P_, dtype=jnp.int32).reshape(B, -1)
cs = jnp.full((B,), ctx, jnp.int32)
qd = mkb(B, 1, Hq, D)


def chain(core, n):
    def run(q, *ops):
        def step(qc, _):
            o = core(qc, *ops)
            return (qc + 1e-6 * o.astype(qc.dtype)), ()
        qf, _ = jax.lax.scan(step, q, None, length=n)
        return qf
    return jax.jit(run)


def bench(name, qargs, payload_bytes_per_tok):
    f = chain(lambda qc, a, b, c, d: flash_attn_with_kvcache(
        qc, a, b, cache_seqlens=cs, block_table=table, causal=True,
        k_scales=c, v_scales=d, kv_cache_layout="HND"), N_CHAIN)
    dt = statistics.median(
        measure(f, qd, *qargs, iters=4) / N_CHAIN for _ in range(3))
    nbytes = B * payload_bytes_per_tok
    print(f"{name}: {B/dt:.0f} tok/s/chip, {gbps(nbytes, dt):.0f} GB/s "
          f"({gbps(nbytes, dt)/819*100:.0f}% roofline)", flush=True)
    return dt


print(f"== decode int8 vs int4, ctx={ctx}, ps={PS} ==", flush=True)
k8, ks8 = quantize_kv(kpool, jnp.int8)
v8, vs8 = quantize_kv(vpool, jnp.int8)
dt8 = bench("int8", (k8, v8, ks8, vs8), 2 * ctx * Hk * (D + 4))

k4, ks4 = quantize_kv(kpool, "int4")
v4, vs4 = quantize_kv(vpool, "int4")
dt4 = bench("int4", (k4, v4, ks4, vs4), 2 * ctx * Hk * (D // 2 + 4))
print(f"int4/int8 speedup: {dt8/dt4:.2f}x (target ~1.9x)", flush=True)
