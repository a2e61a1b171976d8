"""Serving benchmark: continuous-batching throughput and p50/p99 TTFT.

Measures the BASELINE.json primary serving metrics (decode tokens/s/chip,
p50 TTFT) through the full runtime stack: native scheduler + paged allocator
+ paged decode engine on the flagship model.

Usage: python benchmarks/bench_serving.py [--dim 1024] [--layers 8]
       [--requests 32] [--max-batch 16]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.models.transformer import ModelConfig, init_params
from flash_attn_v100_tpu.runtime.engine import ServingEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--gen-len", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--decode-fuse", type=int, default=8,
                    help="max decode steps fused into one dispatch (1 = off)")
    args = ap.parse_args()

    cfg = ModelConfig(
        vocab_size=32000, dim=args.dim, n_layers=args.layers,
        n_heads=args.heads, n_kv_heads=args.kv_heads, head_dim=args.head_dim,
        ffn_dim=int(args.dim * 2.75), max_seq_len=args.max_seq,
        dtype=jnp.bfloat16)
    params = init_params(jax.random.PRNGKey(0), cfg)
    num_pages = args.max_batch * (args.max_seq // args.page_size)
    eng = ServingEngine(params, cfg, max_batch=args.max_batch,
                        num_pages=num_pages, page_size=args.page_size,
                        decode_fuse=args.decode_fuse)
    print(f"backend={jax.default_backend()} native_sched={eng.sched.is_native} "
          f"model: L={cfg.n_layers} d={cfg.dim} Hq={cfg.n_heads} "
          f"Hk={cfg.n_kv_heads} hd={cfg.head_dim}")

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, args.prompt_len).tolist()
               for _ in range(args.requests)]

    # warmup: compile every program the timed run can hit — the 1-row and
    # full-burst prefill row buckets, the unfused decode step, and the fused
    # decode windows (n=2,4,8 all appear within a 24-token generation)
    for nb in (1, args.max_batch):
        for i in range(nb):
            eng.submit(prompts[i][:args.prompt_len], max_new_tokens=24)
        eng.run_to_completion()

    t0 = time.monotonic()
    rids = [eng.submit(p, max_new_tokens=args.gen_len) for p in prompts]
    eng.run_to_completion()
    wall = time.monotonic() - t0

    total_new = sum(len(eng.result(r)) for r in rids)
    ttfts = sorted(eng.ttft(r) for r in rids)
    p = lambda q: ttfts[min(len(ttfts) - 1, int(q * len(ttfts)))]
    st = eng.sched.stats()
    print(f"requests={args.requests} prompt={args.prompt_len} "
          f"gen={args.gen_len} batch<={args.max_batch}")
    print(f"decode throughput: {total_new / wall:.0f} tok/s/chip "
          f"(+{eng.metrics['prefill_tokens'] / wall:.0f} prefill tok/s)")
    print(f"TTFT p50={p(0.5)*1e3:.0f}ms p99={p(0.99)*1e3:.0f}ms  "
          f"preemptions={st['preemptions']} steps={eng.metrics['steps']}")


if __name__ == "__main__":
    main()
