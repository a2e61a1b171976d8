"""TTFT tail (p90) policy A/B on the 24x2048-prompt burst (VERDICT r3 #8).

The burst is two-wave under max_batch=16 (wave 2 waits for wave-1 rows);
p90 IS wave-2 TTFT.  Knobs A/B'd: staggered admission (max_prefill_seqs),
chunked prefill, and a wider batch (more rows admitted up front — decode
is parameter-bandwidth-bound, so extra rows are nearly free until pages
bind).  Each config warms up with a FULL dry run of the same burst so
every row bucket / fused window the timed run hits is compiled."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
import jax

from flash_attn_v100_tpu.models.transformer import ModelConfig, init_params
from flash_attn_v100_tpu.runtime.engine import ServingEngine

cfg = ModelConfig(vocab_size=32000, dim=4096, n_layers=16, n_heads=32,
                  n_kv_heads=8, head_dim=128, ffn_dim=11008,
                  max_seq_len=2560, dtype=jnp.bfloat16)
params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
PLEN, NREQ, NEW = 2048, 24, 64
prompts = [rng.integers(1, cfg.vocab_size, PLEN).tolist() for _ in range(NREQ)]


def run(tag, **kw):
    eng = ServingEngine(params, cfg, num_pages=kw.pop("num_pages", 290),
                        page_size=128, **kw)
    for _ in range(2):   # dry run 1 = compile warmup; run 2 timed
        t0 = time.monotonic()
        rids = [eng.submit(p, max_new_tokens=NEW) for p in prompts]
        eng.run_to_completion()
        wall = time.monotonic() - t0
        ttfts = sorted(eng.ttft(r) for r in rids)
    p50 = ttfts[len(ttfts) // 2]
    p90 = ttfts[min(len(ttfts) - 1, int(len(ttfts) * 0.9))]
    total = sum(len(eng.result(r)) for r in rids)
    print(f"{tag}: p50 {p50*1e3:.0f} ms  p90 {p90*1e3:.0f} ms  "
          f"e2e {total/wall:.0f} tok/s", flush=True)
    del eng


if __name__ == "__main__":
    run("baseline max_batch=16", max_batch=16)
    run("staggered mps=8", max_batch=16, max_prefill_seqs=8)
    run("staggered mps=4", max_batch=16, max_prefill_seqs=4)
    run("chunked 1024", max_batch=16, prefill_chunk=1024)
    run("wide batch=24", max_batch=24)
    run("wide+staggered", max_batch=24, max_prefill_seqs=8)


def quant_configs():
    # The bf16 A/B shows every scheduling knob neutral-to-negative: the
    # tail is PAGE-CAPACITY-bound (24 reqs x 17 pages = 408 > 290), so
    # wave 2 waits for wave-1 completions regardless of admission policy.
    # int8 KV halves pool bytes -> same HBM budget holds 580 pages -> all
    # 24 requests fit concurrently; wide batch + staggered admission then
    # turns the burst into pipelined 8-wide prefill waves.
    run("int8 290p b16 (capacity-matched)", max_batch=16, num_pages=290,
        kv_dtype=jnp.int8)
    run("int8 580p b24 mps=8", max_batch=24, num_pages=580,
        max_prefill_seqs=8, kv_dtype=jnp.int8)
    run("int8 580p b24", max_batch=24, num_pages=580, kv_dtype=jnp.int8)
