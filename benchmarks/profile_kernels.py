"""Capture device traces of the flagship kernels and render per-kernel
profile notes (docs/profiles.md) — the checked-in analog of the reference's
ncu reports (utils/sass/mma_swizzle/ncu_fwd.sh).

Each section reports the hardware tracer's per-op device durations with
READABLE names (pallas kernel symbols mapped via utils/profiling), plus a
roofline line: total device time per call vs the section's analytic floor
(MXU flops or HBM bytes).

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

MXU_PEAK = 197e12        # v5e bf16
HBM_PEAK = 819e9

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)


def fmt(rows, iters, flops=None, bytes_=None):
    total_us = sum(us for _, us, _ in rows) / iters
    out = ["| device op | total µs / call | calls / capture |",
           "|---|---|---|"]
    for name, us, n in rows[:8]:
        short = name if len(name) <= 60 else name[:57] + "..."
        out.append(f"| `{short}` | {us/iters:.1f} | {n} |")
    floor = []
    if flops:
        tfs = flops / (total_us * 1e-6) / 1e12
        floor.append(f"{tfs:.0f} TF/s achieved = "
                     f"{100 * tfs * 1e12 / MXU_PEAK:.0f}% of MXU peak")
    if bytes_:
        gbs = bytes_ / (total_us * 1e-6) / 1e9
        floor.append(f"{gbs:.0f} GB/s achieved = "
                     f"{100 * gbs * 1e9 / HBM_PEAK:.0f}% of HBM roofline")
    out.append("")
    out.append(f"Total device time {total_us:.0f} µs/call"
               + ("; " + "; ".join(floor) if floor else "") + ".")
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
    fl_causal = 4 * B * M * M * Hq * D // 2

    def dense_fwd_causal(q, k, v):
        return flash_attn_func(q, k, v, causal=True)

    rows = profile_ops(jax.jit(dense_fwd_causal), q, k, v, iters=iters)
    sections.append(("Dense causal prefill (B4 S4096 Hq32 D128)", rows,
                     dict(flops=fl_causal)))
    print("dense done", flush=True)

    # dense backward
    do = mkb(B, M, Hq, D)

    def dense_bwd_causal(q, k, v):
        return jax.grad(lambda q, k, v: (flash_attn_func(
            q, k, v, causal=True) * do).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(q, k, v)

    rows = profile_ops(jax.jit(dense_bwd_causal), q, k, v, iters=iters)
    sections.append(("Dense causal backward (same shape)", rows,
                     dict(flops=int(fl_causal * 2.5))))
    print("bwd done", flush=True)

    # 32k decode bf16 + int8
    B2, ctx, ps = 8, 32768, 512
    P_ = B2 * ctx // ps
    kp, vp = mkb(Hk, P_, ps, D), mkb(Hk, P_, ps, D)
    tbl = jnp.arange(P_, dtype=jnp.int32).reshape(B2, -1)
    cs = jnp.full((B2,), ctx, jnp.int32)
    qd = mkb(B2, 1, Hq, D)

    def decode_32k_bf16(q, a, b):
        return flash_attn_with_kvcache(
            q, a, b, cache_seqlens=cs, block_table=tbl, causal=True,
            kv_cache_layout="HND")

    rows = profile_ops(jax.jit(decode_32k_bf16), qd, kp, vp, iters=iters)
    sections.append(("Decode 32k ctx bf16 (B8 Hq32 D128, 512-token pages)",
                     rows, dict(bytes_=2 * B2 * ctx * Hk * D * 2)))
    kq, ks = quantize_kv(kp, jnp.int8)
    vq, vs = quantize_kv(vp, jnp.int8)

    def decode_32k_int8(q, a, b, c, d):
        return flash_attn_with_kvcache(
            q, a, b, cache_seqlens=cs, block_table=tbl, causal=True,
            k_scales=c, v_scales=d, kv_cache_layout="HND")

    rows = profile_ops(jax.jit(decode_32k_int8), qd, kq, vq, ks, vs,
                       iters=iters)
    sections.append(("Decode 32k ctx INT8 (same shape)", rows,
                     dict(bytes_=2 * B2 * ctx * Hk * (D + 4))))
    print("decode done", flush=True)

    # varlen mixed causal
    lens = [128, 512, 1024, 4096, 2048, 300, 37, 4096]
    T = sum(lens)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    qv, kv_, vv = mkb(T, Hq, D), mkb(T, Hk, D), mkb(T, Hk, D)

    def varlen_mixed_causal(q, k, v):
        return flash_attn_varlen_func(q, k, v, cu, cu, max(lens), max(lens),
                                      causal=True)

    rows = profile_ops(jax.jit(varlen_mixed_causal), qv, kv_, vv, iters=iters)
    fl_vl = sum(4 * Hq * L * L * D // 2 for L in lens)
    sections.append(("Varlen mixed-length causal (37..4096, Hq32 D128)",
                     rows, dict(flops=fl_vl)))
    print("varlen done", flush=True)

    doc = ["# Per-kernel device profiles (TPU v5e)",
           "",
           "Captured with `utils/profiling.capture_trace` (the hardware",
           "tracer's own per-op durations — the TPU analog of the",
           "reference's ncu reports, `utils/sass/mma_swizzle/ncu_fwd.sh`).",
           "Rows are aggregated by READABLE op labels: this package's",
           "pallas kernel symbols map to short names, jit hash suffixes are",
           "stripped.  Each section's footer compares total device time to",
           "the analytic floor (MXU flops or HBM bytes).",
           "Regenerate: `python benchmarks/profile_kernels.py --out docs/profiles.md`.",
           ""]
    for title, rows, kw in sections:
        doc.append(f"## {title}\n")
        doc.append(fmt(rows, iters, **kw))
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
