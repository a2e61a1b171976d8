"""Attribute the steady-decode gap (r5, VERDICT r4 #5): decompose engine
steady decode tok/s into (a) pure device time per step — the full model
forward in a chained scan, one dispatch, no host loop — and (b) host-loop +
dispatch overhead per engine step, across decode_fuse widths.

The serving bench's ~54%-of-floor number conflates the two; this splits
them so the gap is attributable to the loop (fixable) or the device (the
kernels' problem), and A/Bs decode_fuse = 8/16/32 (VERDICT's untried
widths)."""
import os
import sys
import time
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.models.transformer import ModelConfig, init_params
from flash_attn_v100_tpu.runtime.engine import ServingEngine, paged_forward
from flash_attn_v100_tpu.utils.benchmarking import measure

cfg = ModelConfig(vocab_size=32000, dim=4096, n_layers=16, n_heads=32,
                  n_kv_heads=8, head_dim=128, ffn_dim=11008,
                  max_seq_len=2560, dtype=jnp.bfloat16)
params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
B, PLEN, PS, NPAGES = 16, 2048, 128, 290
prompts = [rng.integers(1, cfg.vocab_size, PLEN).tolist() for _ in range(B)]


def device_only():
    """Pure device decode step at the serving shape: batch 16, 2k ctx."""
    mp = cfg.max_seq_len // PS
    pool_shape = (cfg.n_kv_heads, (B * mp + 1) * cfg.n_layers, PS,
                  cfg.head_dim)          # layer-folded page axis
    kp = jnp.zeros(pool_shape, jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    bt = jnp.asarray(1 + np.arange(B * mp).reshape(B, mp), jnp.int32)
    cs = jnp.full((B,), PLEN, jnp.int32)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size, (B,)), jnp.int32)
    N = 32

    def run(params, kp, vp, toks, cs):
        def body(carry, _):
            tok, cs, kp, vp = carry
            logits, kp, vp = paged_forward(params, kp, vp, tok[:, None],
                                           cs, bt, cfg=cfg)
            nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
            return (nxt, cs + 1, kp, vp), ()
        (tok, cs, kp, vp), _ = jax.lax.scan(body, (toks, cs, kp, vp),
                                            None, length=N)
        return tok
    fj = jax.jit(run, donate_argnums=(1, 2))
    fj(params, kp, vp, toks, cs).block_until_ready()
    kp = jnp.zeros(pool_shape, jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    dt = measure(fj, params, kp, vp, toks, cs, iters=1) / N
    print(f"device-only decode step (scan, b{B}, 2k ctx): {dt*1e3:.2f} ms "
          f"-> {B/dt:.0f} tok/s", flush=True)
    return dt


def engine_steady(fuse):
    eng = ServingEngine(params, cfg, max_batch=B, num_pages=NPAGES,
                        page_size=PS, decode_fuse=fuse)
    # warmup compiles: full-width batch, enough tokens to hit every fused
    # width (n, n/2, ..., 1) and the row buckets — an unwarmed fused
    # program costs ~30 s of remote compile INSIDE the measured loop
    for p in prompts:
        eng.submit(p[:PLEN], max_new_tokens=4 * max(fuse, 8))
    eng.run_to_completion()
    rids = [eng.submit(p, max_new_tokens=160) for p in prompts]
    dec_toks, dec_wall, dec_steps = 0, 0.0, 0
    while not eng.idle():
        pf0 = eng.metrics["prefill_tokens"]
        tg0 = eng.metrics["tokens_generated"]
        ts = time.monotonic()
        eng.step()
        te = time.monotonic()
        if eng.metrics["prefill_tokens"] == pf0:
            dec_toks += eng.metrics["tokens_generated"] - tg0
            dec_wall += te - ts
            dec_steps += 1
    tf = time.monotonic()
    for r in rids:
        eng.result(r)
    dec_wall += time.monotonic() - tf
    rate = dec_toks / max(dec_wall, 1e-9)
    per_engine_step = dec_wall / max(dec_steps, 1)
    print(f"engine decode_fuse={fuse:2d}: {rate:6.0f} tok/s steady, "
          f"{per_engine_step*1e3:7.2f} ms/engine-step over {dec_steps} steps "
          f"({dec_toks} toks)", flush=True)
    del eng
    return rate


if __name__ == "__main__":
    dt_dev = device_only()
    for fuse in (1, 8, 16, 32):
        engine_steady(fuse)
    print(f"floor check: params "
          f"{sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))/2**30:.2f} "
          f"GiB/step; device step above includes it", flush=True)
