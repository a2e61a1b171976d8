"""A/B: unrolled + VPU/MXU-pipelined varlen forward (r4) on the uniform
8x2048 packed-training shape and the mixed batch — VERDICT r3 #4 (uniform
varlen fwd flat at 65-67 TF/s vs dense 93).  Also sweeps the PAGED prefill
kernel's page unroll (the engine TTFT path, 128-token pages)."""
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.ops.pallas.varlen import (
    flash_attn_varlen_fwd, flash_attn_varlen_fwd_paged)
from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.utils.benchmarking import measure, tflops

Hq, Hk, D = 32, 8, 128
rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
scale = D ** -0.5
NCH = 8


def bench(tag, lens, causal, U, bq=None, bk=None):
    Tq = sum(lens)
    q, k, v = mkb(Tq, Hq, D), mkb(Tq, Hk, D), mkb(Tq, Hk, D)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    params = masklib.MaskParams(causal=causal, window_left=-1,
                                window_right=-1, softcap=0.0, has_alibi=False)
    bs = None
    if bq:
        bs = BlockSizes(bq, bk, 512, 512, 512, 512)

    def chained(q, k, v):
        def step(qc, _):
            o, _l = flash_attn_varlen_fwd(
                qc, k, v, cu, cu, max(lens), max(lens), scale, params,
                block_sizes=bs, kv_unroll=U)
            return (qc + 1e-6 * o.astype(qc.dtype)), ()
        return jax.lax.scan(step, q, None, length=NCH)[0]

    fj = jax.jit(chained)
    try:
        fj(q, k, v).block_until_ready()
    except Exception as e:
        print(f"{tag} U={U}: FAILED {type(e).__name__}", flush=True)
        return
    dt = statistics.median(measure(fj, q, k, v, iters=3) / NCH for _ in range(3))
    fl = sum(4 * Hq * L * L * D // (2 if causal else 1) for L in lens)
    print(f"{tag} causal={causal} U={U}: {tflops(fl, dt):6.1f} TF/s "
          f"{dt*1e3:.3f} ms", flush=True)


def bench_paged(tag, plen, B, U, ps=128):
    # engine-prefill shape: B sequences of plen tokens, pages of ps
    lens = [plen] * B
    Tq = B * plen
    q = mkb(Tq, Hq, D)
    mp = -(-plen // ps)
    P = B * mp + 1
    kp, vp = mkb(Hk, P, ps, D), mkb(Hk, P, ps, D)
    tbl = jnp.asarray(
        1 + np.arange(B * mp, dtype=np.int32).reshape(B, mp), jnp.int32)
    cu = jnp.arange(B + 1, dtype=jnp.int32) * plen
    sk = jnp.full((B,), plen, jnp.int32)
    params = masklib.MaskParams(causal=True, window_left=-1,
                                window_right=-1, softcap=0.0, has_alibi=False)

    def chained(q, kp, vp):
        def step(qc, _):
            o, _l = flash_attn_varlen_fwd_paged(
                qc, kp, vp, tbl, cu, sk, plen, mp * ps, scale, params,
                kv_unroll=U)
            return (qc + 1e-6 * o.astype(qc.dtype)), ()
        return jax.lax.scan(step, q, None, length=NCH)[0]

    fj = jax.jit(chained)
    try:
        fj(q, kp, vp).block_until_ready()
    except Exception as e:
        print(f"{tag} U={U}: FAILED {type(e).__name__}", flush=True)
        return
    dt = statistics.median(measure(fj, q, kp, vp, iters=3) / NCH
                           for _ in range(3))
    fl = sum(4 * Hq * L * L * D // 2 for L in lens)
    print(f"{tag} U={U}: {tflops(fl, dt):6.1f} TF/s {dt*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    uni = [2048] * 8
    mixed = [37, 512, 4096, 1024, 2048, 300, 128, 4096 - 37 - 512 - 1024
             - 2048 - 300 - 128 + 4096]
    for U in (1, 2, 4):
        bench("uniform-8x2048", uni, True, U)
    bench("uniform-8x2048", uni, False, 1)
    bench("uniform-8x2048", uni, False, 2)
    for U in (1, 2):
        bench("mixed", mixed, True, U)
    for U in (1, 2, 4, 8):
        bench_paged("paged-8x2048-ps128", 2048, 8, U)


def bench_paged_quant(tag, plen, B, U, qd, ps=128):
    from flash_attn_v100_tpu.ops.quant import quantize_kv
    lens = [plen] * B
    Tq = B * plen
    q = mkb(Tq, Hq, D)
    mp = -(-plen // ps)
    P = B * mp + 1
    kf = jnp.asarray(rng.standard_normal((Hk, P, ps, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((Hk, P, ps, D)), jnp.float32)
    kq, ks = quantize_kv(kf, qd, token_axis=2)
    vq, vs = quantize_kv(vf, qd, token_axis=2)
    tbl = jnp.asarray(
        1 + np.arange(B * mp, dtype=np.int32).reshape(B, mp), jnp.int32)
    cu = jnp.arange(B + 1, dtype=jnp.int32) * plen
    sk = jnp.full((B,), plen, jnp.int32)
    params = masklib.MaskParams(causal=True, window_left=-1,
                                window_right=-1, softcap=0.0, has_alibi=False)

    def chained(q, kp, vp):
        def step(qc, _):
            o, _l = flash_attn_varlen_fwd_paged(
                qc, kp, vp, tbl, cu, sk, plen, mp * ps, scale, params,
                k_scales=ks, v_scales=vs, kv_unroll=U)
            return (qc + 1e-6 * o.astype(qc.dtype)), ()
        return jax.lax.scan(step, q, None, length=NCH)[0]

    fj = jax.jit(chained)
    try:
        fj(q, kq, vq).block_until_ready()
    except Exception as e:
        print(f"{tag} U={U}: FAILED {type(e).__name__}", flush=True)
        return
    dt = statistics.median(measure(fj, q, kq, vq, iters=3) / NCH
                           for _ in range(3))
    fl = sum(4 * Hq * L * L * D // 2 for L in lens)
    print(f"{tag} U={U}: {tflops(fl, dt):6.1f} TF/s {dt*1e3:.3f} ms",
          flush=True)
