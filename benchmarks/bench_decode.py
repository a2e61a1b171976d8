"""Decode-attention roofline: achieved HBM bandwidth vs context length.

Decode (T_q=1) is bandwidth-bound — every step streams the whole KV cache
once; the BASELINE.json target is >=85% of per-chip roofline with INT8 KV.
This bench reports achieved GB/s for bf16 and int8 KV across context lengths
and split counts, paged and contiguous.  (ncu-table analog: the reference
measures DRAM %-of-peak via ncu, utils/sass/mma_swizzle/ncu_fwd.sh.)

Usage: python benchmarks/bench_decode.py [--ctx 4096 32768] [--batch 8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_with_kvcache
from flash_attn_v100_tpu.ops.quant import quantize_kv
from flash_attn_v100_tpu.utils.benchmarking import measure, gbps


def bench_one(rng, B, Hq, Hk, D, ctx, page_size, dtype, num_splits=0):
    P = B * ctx // page_size
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    pool = mk(Hk, P, page_size, D)
    table = jnp.arange(P, dtype=jnp.int32).reshape(B, -1)
    cs = jnp.full((B,), ctx, jnp.int32)
    q = mk(B, 1, Hq, D)
    if dtype == "int8":
        kq, ks = quantize_kv(pool, jnp.int8)
        vq, vs = quantize_kv(pool, jnp.int8)
        f = jax.jit(lambda q, a, b, c, d: flash_attn_with_kvcache(
            q, a, b, cache_seqlens=cs, block_table=table, causal=True,
            k_scales=c, v_scales=d, kv_cache_layout="HND",
            num_splits=num_splits))
        dt = measure(f, q, kq, vq, ks, vs, iters=16)
        nbytes = 2 * B * ctx * Hk * D * 1 + 2 * B * ctx * Hk * 4
    else:
        f = jax.jit(lambda q, a, b: flash_attn_with_kvcache(
            q, a, b, cache_seqlens=cs, block_table=table, causal=True,
            kv_cache_layout="HND", num_splits=num_splits))
        dt = measure(f, q, pool, pool, iters=16)
        nbytes = 2 * B * ctx * Hk * D * 2
    return dt, gbps(nbytes, dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, nargs="+",
                    default=[4096, 8192, 16384, 32768])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--page-size", type=int, default=256)
    ap.add_argument("--splits", type=int, nargs="+", default=[0])
    ap.add_argument("--hbm-peak-gbps", type=float, default=819.0,
                    help="chip HBM peak for %%-of-roofline (v5e: 819)")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    B, Hq, Hk, D = args.batch, args.heads, args.kv_heads, args.head_dim
    print(f"backend={jax.default_backend()} B={B} Hq={Hq} Hk={Hk} D={D}")
    for ctx in args.ctx:
        for dtype in ("bf16", "int8"):
            for ns in args.splits:
                dt, bw = bench_one(rng, B, Hq, Hk, D, ctx, args.page_size,
                                   dtype, ns)
                print(f"  ctx={ctx:6d} kv={dtype:5s} splits={ns}: "
                      f"{dt*1e6:7.0f} us  {B/dt:7.0f} tok/s/chip  "
                      f"{bw:6.0f} GB/s ({100*bw/args.hbm_peak_gbps:.0f}% "
                      f"of roofline)")


if __name__ == "__main__":
    main()
