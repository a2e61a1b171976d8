"""Varlen perf probe (VERDICT r1 #3: fwd >=60 / bwd >=40 TF/s at 8x2048
causal; round-1 measured 31/21 with the static +-max_len window)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import statistics

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_varlen_func
from flash_attn_v100_tpu.utils.benchmarking import measure, tflops

rng = np.random.default_rng(0)
Hq, Hk, D = 32, 8, 128
NCH = 4

def bench(lens, causal, name):
    Tq = sum(lens)
    q = jnp.asarray(rng.standard_normal((Tq, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((Tq, Hk, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((Tq, Hk, D)), jnp.bfloat16)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    msl = max(lens)

    def fwd(qc, k, v):
        def step(qi, _):
            o = flash_attn_varlen_func(qi, k, v, cu, cu, msl, msl, causal=causal)
            return (qi + 1e-6 * o.astype(qi.dtype)), ()
        return jax.lax.scan(step, qc, None, length=NCH)[0]

    fj = jax.jit(fwd)
    dt = statistics.median(measure(fj, q, k, v, iters=4) / NCH for _ in range(3))
    fl = sum(4 * Hq * L * L * D // (2 if causal else 1) for L in lens)
    print(f"{name} fwd: {tflops(fl, dt):6.1f} TF/s  {dt*1e3:7.3f} ms", flush=True)

    do = jnp.asarray(rng.standard_normal((Tq, Hq, D)), jnp.bfloat16)

    def bwd(qc, k, v):
        def step(qi, _):
            def loss(qq, kk, vv):
                return (flash_attn_varlen_func(
                    qq, kk, vv, cu, cu, msl, msl, causal=causal) * do).sum()
            g = jax.grad(loss, argnums=(0, 1, 2))(qi, k, v)
            return (qi + 1e-6 * g[0].astype(qi.dtype)), ()
        return jax.lax.scan(step, qc, None, length=NCH)[0]

    gj = jax.jit(bwd)
    dt = statistics.median(measure(gj, q, k, v, iters=4) / NCH for _ in range(3))
    flb = fl * 2.5
    print(f"{name} bwd: {tflops(flb, dt):6.1f} TF/s  {dt*1e3:7.3f} ms", flush=True)

bench([2048] * 8, True, "8x2048 causal")
bench([2048] * 8, False, "8x2048 full  ")
bench([128, 512, 1024, 4096, 2048, 300, 37, 4096], True, "mixed causal ")

# block-size sensitivity (smaller tiles -> more interior fast-path tiles)
from flash_attn_v100_tpu.ops.pallas.block_sizes import BlockSizes
def bench_bs(lens, causal, name, bq, bk):
    Tq = sum(lens)
    q = jnp.asarray(rng.standard_normal((Tq, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((Tq, Hk, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((Tq, Hk, D)), jnp.bfloat16)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    msl = max(lens)
    bs = BlockSizes(block_q=bq, block_k=bk)
    def fwd(qc, k, v):
        def step(qi, _):
            o = flash_attn_varlen_func(qi, k, v, cu, cu, msl, msl,
                                       causal=causal, block_sizes=bs)
            return (qi + 1e-6 * o.astype(qi.dtype)), ()
        return jax.lax.scan(step, qc, None, length=NCH)[0]
    fj = jax.jit(fwd)
    dt = statistics.median(measure(fj, q, k, v, iters=4) / NCH for _ in range(3))
    fl = sum(4 * Hq * L * L * D // (2 if causal else 1) for L in lens)
    print(f"{name} bq={bq} bk={bk} fwd: {tflops(fl, dt):6.1f} TF/s  {dt*1e3:7.3f} ms", flush=True)

if "bs" in sys.argv:
    for bq, bk in ((512, 512), (512, 1024), (1024, 512), (256, 1024), (2048, 1024), (1024, 2048)):
        bench_bs([2048] * 8, True, "8x2048 causal", bq, bk)
    for bq, bk in ((512, 512), (1024, 512)):
        bench_bs([128, 512, 1024, 4096, 2048, 300, 37, 4096], True, "mixed causal ", bq, bk)

if "ceiling" in sys.argv:
    # force every live tile through the FAST path (WRONG numerics — cost
    # probe only): isolates what the range-mask pipeline costs on the
    # causal diagonal tiles.
    import jax.numpy as _jnp
    from flash_attn_v100_tpu.ops.pallas import varlen as _vl
    _orig_fb = _vl.fast_bounds

    def _always_fast(lo_row, hi_row, num_blocks, block):
        return _jnp.stack([
            _jnp.full((num_blocks,), -2**30, _jnp.int32),
            _jnp.full((num_blocks,), 2**30, _jnp.int32)])

    _vl.fast_bounds = _always_fast
    bench([2048] * 8, True, "8x2048 causal CEILING(all-fast)")
    _vl.fast_bounds = _orig_fb
