"""Capture device traces of the flagship kernels and render per-kernel
profile notes (docs/profiles.md) — the checked-in analog of the reference's
ncu reports.

Usage: python benchmarks/profile_kernels.py [--out docs/profiles.md]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_func, flash_attn_with_kvcache, \
    flash_attn_varlen_func
from flash_attn_v100_tpu.ops.quant import quantize_kv
from flash_attn_v100_tpu.utils.profiling import profile_ops

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)


def fmt(rows, iters):
    out = ["| device op | total µs / call | calls / capture |",
           "|---|---|---|"]
    for name, us, n in rows[:8]:
        short = name if len(name) <= 60 else name[:57] + "..."
        out.append(f"| `{short}` | {us/iters:.1f} | {n} |")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    iters = 3
    sections = []

    # dense causal prefill
    B, M, Hq, Hk, D = 4, 4096, 32, 8, 128
    q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)
    f = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=True))
    rows = profile_ops(f, q, k, v, iters=iters)
    sections.append(("Dense causal prefill (B4 S4096 Hq32 D128)", rows))
    print("dense done", flush=True)

    # dense backward
    do = mkb(B, M, Hq, D)
    g = jax.jit(jax.grad(lambda q, k, v: (flash_attn_func(
        q, k, v, causal=True) * do).astype(jnp.float32).sum(),
        argnums=(0, 1, 2)))
    rows = profile_ops(g, q, k, v, iters=iters)
    sections.append(("Dense causal backward (same shape)", rows))
    print("bwd done", flush=True)

    # 32k decode bf16 + int8
    B2, ctx, ps = 8, 32768, 512
    P_ = B2 * ctx // ps
    kp, vp = mkb(Hk, P_, ps, D), mkb(Hk, P_, ps, D)
    tbl = jnp.arange(P_, dtype=jnp.int32).reshape(B2, -1)
    cs = jnp.full((B2,), ctx, jnp.int32)
    qd = mkb(B2, 1, Hq, D)
    fd = jax.jit(lambda q, a, b: flash_attn_with_kvcache(
        q, a, b, cache_seqlens=cs, block_table=tbl, causal=True,
        kv_cache_layout="HND"))
    rows = profile_ops(fd, qd, kp, vp, iters=iters)
    sections.append(("Decode 32k ctx bf16 (B8 Hq32 D128, 512-token pages)", rows))
    kq, ks = quantize_kv(kp, jnp.int8)
    vq, vs = quantize_kv(vp, jnp.int8)
    fq = jax.jit(lambda q, a, b, c, d: flash_attn_with_kvcache(
        q, a, b, cache_seqlens=cs, block_table=tbl, causal=True,
        k_scales=c, v_scales=d, kv_cache_layout="HND"))
    rows = profile_ops(fq, qd, kq, vq, ks, vs, iters=iters)
    sections.append(("Decode 32k ctx INT8 (same shape)", rows))
    print("decode done", flush=True)

    # varlen mixed causal
    lens = [128, 512, 1024, 4096, 2048, 300, 37, 4096]
    T = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    qv, kv_, vv = mkb(T, Hq, D), mkb(T, Hk, D), mkb(T, Hk, D)
    fv = jax.jit(lambda q, k, v: flash_attn_varlen_func(
        q, k, v, cu, cu, max(lens), max(lens), causal=True))
    rows = profile_ops(fv, qv, kv_, vv, iters=iters)
    sections.append(("Varlen mixed-length causal (37..4096, Hq32 D128)", rows))
    print("varlen done", flush=True)

    doc = ["# Per-kernel device profiles (TPU v5e)",
           "",
           "Captured with `utils/profiling.capture_trace` (the hardware",
           "tracer's own per-op durations — the TPU analog of the",
           "reference's ncu reports, `utils/sass/mma_swizzle/ncu_fwd.sh`).",
           "Regenerate: `python benchmarks/profile_kernels.py --out docs/profiles.md`.",
           ""]
    for title, rows in sections:
        doc.append(f"## {title}\n")
        doc.append(fmt(rows, iters))
        doc.append("")
    text = "\n".join(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}")
    else:
        print(text)


if __name__ == "__main__":
    main()
