"""LoRA SFT end-to-end training benchmark.

The TPU analog of the reference's unsloth benchmark — LoRA fine-tuning of a
llama-family model through the attention engine for N steps with wall-clock
reporting (reference: utils/benchmarks/benchmark_unsloth.py:50-190, llama-2-7b
4-bit, seq 4096, 20 steps).  Defaults here are sized for one v5e chip in bf16;
--dim/--layers scale it up or down.

Usage: python benchmarks/bench_lora_sft.py [--steps 20] [--seq 4096]
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
from flash_attn_v100_tpu.integrations.lora import (
    LoraConfig, lora_init, make_lora_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--dropout", type=float, default=0.0)
    args = ap.parse_args()

    cfg = ModelConfig(
        vocab_size=32000, dim=args.dim, n_layers=args.layers,
        n_heads=args.dim // 128, n_kv_heads=max(1, args.dim // 256),
        head_dim=128, ffn_dim=int(args.dim * 2.75),
        max_seq_len=args.seq, dtype=jnp.bfloat16, dropout_p=args.dropout)
    params = init_params(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(rank=args.rank, alpha=2.0 * args.rank)
    lora = lora_init(jax.random.PRNGKey(1), params, lcfg)
    n_lora = sum(x.size for x in jax.tree_util.tree_leaves(lora))
    n_base = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"backend={jax.default_backend()} base={n_base/1e6:.0f}M "
          f"lora={n_lora/1e6:.2f}M (r={args.rank}) seq={args.seq}")

    step, opt = make_lora_train_step(cfg, lcfg)
    opt_state = opt.init(lora)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, cfg.vocab_size,
                                    (args.batch, args.seq + 1)), jnp.int32)
    key = jax.random.PRNGKey(2)

    loss, lora, opt_state = step(lora, opt_state, params, toks, key)  # compile
    jax.block_until_ready(loss)
    t0 = time.monotonic()
    for i in range(args.steps):
        loss, lora, opt_state = step(lora, opt_state, params, toks,
                                     jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    dt = (time.monotonic() - t0) / args.steps
    tok_s = args.batch * args.seq / dt
    print(f"{args.steps} steps: {dt*1e3:.0f} ms/step, {tok_s:.0f} tok/s, "
          f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
