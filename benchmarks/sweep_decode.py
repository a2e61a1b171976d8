"""Hardware oracle sweep for the KV-CACHE DECODE path — BASELINE config 4
(32k ctx, paged + rotary + int8) on the real chip.

Gates:
  * bf16 decode vs the fp32 oracle with the reference tolerance model
    (fwd <= 2*err_native + 1e-5, reference test.py:277),
  * int8-KV numerics <= 0.1 max-abs-err vs the unquantized oracle (the
    BASELINE gate),
  * split-KV (num_splits) bitwise-consistency with the unsplit path.

Usage: python benchmarks/sweep_decode.py [--quick]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_with_kvcache
from flash_attn_v100_tpu.ops.quant import quantize_kv
from flash_attn_v100_tpu.ops.reference import mha_reference_kvcache
from flash_attn_v100_tpu.utils.benchmarking import measure, gbps


def _oracle(q, kc_hnd, vc_hnd, **kw):
    kc = jnp.swapaxes(kc_hnd, 1, 2)
    vc = jnp.swapaxes(vc_hnd, 1, 2)
    o32 = mha_reference_kvcache(q, kc, vc, upcast=True, **kw)[0]
    onat = mha_reference_kvcache(q, kc, vc, upcast=False, **kw)[0]
    return o32, onat


def gate(name, out, o32, onat, bound_mult=2.0, atol=1e-5, flat=None):
    e = float(jnp.max(jnp.abs(out.astype(jnp.float32) - o32.astype(jnp.float32))))
    en = float(jnp.max(jnp.abs(onat.astype(jnp.float32) - o32.astype(jnp.float32))))
    ok = e <= (bound_mult * en + atol if flat is None else flat)
    print(f"{'PASS' if ok else 'FAIL'} decode {name}: err={e:.2e} "
          f"(native {en:.2e}{'' if flat is None else f', gate {flat}'} )",
          flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(421)
    mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    print(f"backend={jax.default_backend()}")
    fails = 0

    # ---- config 4: 32k ctx paged + rotary + int8 (+ append) ----
    B, Hq, Hk, D, ps = (2, 32, 8, 128, 512)
    ctx = 8192 if args.quick else 32768
    P_ = B * (ctx + ps) // ps
    kpool, vpool = mkb(Hk, P_, ps, D), mkb(Hk, P_, ps, D)
    table = jnp.arange(P_, dtype=jnp.int32).reshape(B, -1)
    # second row exercises a ragged (non-page-aligned) live length; keep it
    # positive in --quick mode (ctx 8k)
    cs = jnp.asarray([ctx, ctx - min(12345, ctx // 2 + 123)], jnp.int32)
    qd = mkb(B, 1, Hq, D)
    kn, vn = mkb(B, 1, Hk, D), mkb(B, 1, Hk, D)
    cos = mkb(ctx + ps, D // 2)
    sin = mkb(ctx + ps, D // 2)

    t0 = time.time()
    out, (kc2, vc2) = jax.jit(lambda q, a, b, kn, vn: flash_attn_with_kvcache(
        q, a, b, k=kn, v=vn, rotary_cos=cos, rotary_sin=sin, cache_seqlens=cs,
        block_table=table, causal=True, kv_cache_layout="HND"))(
            qd, kpool, vpool, kn, vn)
    # oracle on the equivalent contiguous cache (iota table -> plain reshape)
    kc = kpool.reshape(Hk, B, (ctx + ps), D).swapaxes(0, 1)
    vc = vpool.reshape(Hk, B, (ctx + ps), D).swapaxes(0, 1)
    o32, onat = _oracle(qd, kc, vc, k_new=kn, v_new=vn, rotary_cos=cos,
                        rotary_sin=sin, cache_seqlens=np.asarray(cs),
                        causal=True)
    fails += not gate(f"paged+rotary+append {ctx//1024}k bf16", out, o32, onat)
    print(f"  ({time.time()-t0:.1f}s)", flush=True)

    # int8 pools, same config (gate: <= 0.1 vs the unquantized fp32 oracle)
    t0 = time.time()
    kq, ks = quantize_kv(kpool, jnp.int8)
    vq, vs = quantize_kv(vpool, jnp.int8)
    out8 = jax.jit(lambda q, a, b, c, d, kn, vn: flash_attn_with_kvcache(
        q, a, b, k=kn, v=vn, rotary_cos=cos, rotary_sin=sin, cache_seqlens=cs,
        block_table=table, causal=True, k_scales=c, v_scales=d,
        kv_cache_layout="HND")[0])(qd, kq, vq, ks, vs, kn, vn)
    fails += not gate(f"paged+rotary+append {ctx//1024}k INT8", out8, o32,
                      onat, flat=0.1)
    print(f"  ({time.time()-t0:.1f}s)", flush=True)

    # packed-int4 pools (quarter bytes; per-token qmax-7 scales)
    t0 = time.time()
    kq4, ks4 = quantize_kv(kpool, "int4")
    vq4, vs4 = quantize_kv(vpool, "int4")
    out4 = jax.jit(lambda q, a, b, c, d, kn, vn: flash_attn_with_kvcache(
        q, a, b, k=kn, v=vn, rotary_cos=cos, rotary_sin=sin, cache_seqlens=cs,
        block_table=table, causal=True, k_scales=c, v_scales=d,
        kv_cache_layout="HND")[0])(qd, kq4, vq4, ks4, vs4, kn, vn)
    # gate = the 4-bit resolution bound (scale/2 = amax/14 per element),
    # not the 0.1 int8 BASELINE gate — int4 is an extension beyond baseline
    fails += not gate(f"paged+rotary+append {ctx//1024}k INT4", out4, o32,
                      onat, flat=0.3)
    print(f"  ({time.time()-t0:.1f}s)", flush=True)

    # fp8 e4m3 pools (quarter... half bytes + finer dynamic range than int8)
    t0 = time.time()
    kq8, ks8 = quantize_kv(kpool, jnp.float8_e4m3fn)
    vq8, vs8 = quantize_kv(vpool, jnp.float8_e4m3fn)
    outf8 = jax.jit(lambda q, a, b, c, d: flash_attn_with_kvcache(
        q, a, b, cache_seqlens=cs, block_table=table, causal=True,
        k_scales=c, v_scales=d, kv_cache_layout="HND"))(qd, kq8, vq8, ks8, vs8)
    o32n, onatn = _oracle(qd, kc, vc, cache_seqlens=np.asarray(cs),
                          causal=True)
    fails += not gate(f"paged {ctx//1024}k FP8-e4m3", outf8, o32n, onatn,
                      flat=0.1)
    print(f"  ({time.time()-t0:.1f}s)", flush=True)

    # ---- contiguous caches: T_new=3 append, leftpad, batch_idx, window ----
    t0 = time.time()
    N = 2048
    kcc, vcc = mkb(B, Hk, N, D), mkb(B, Hk, N, D)
    cs2 = jnp.asarray([1200, 333], jnp.int32)
    q3 = mkb(B, 3, Hq, D)
    k3, v3 = mkb(B, 3, Hk, D), mkb(B, 3, Hk, D)
    out, _ = jax.jit(lambda q, a, b, kn, vn: flash_attn_with_kvcache(
        q, a, b, k=kn, v=vn, cache_seqlens=cs2, causal=True,
        kv_cache_layout="HND"))(q3, kcc, vcc, k3, v3)
    o32, onat = _oracle(q3, kcc, vcc, k_new=k3, v_new=v3,
                        cache_seqlens=np.asarray(cs2), causal=True)
    fails += not gate("contig T3 append", out, o32, onat)

    lp = jnp.asarray([64, 0], jnp.int32)
    out = jax.jit(lambda q, a, b: flash_attn_with_kvcache(
        q, a, b, cache_seqlens=cs2, cache_leftpad=lp, causal=True,
        kv_cache_layout="HND"))(q3, kcc, vcc)
    o32, onat = _oracle(q3, kcc, vcc, cache_seqlens=np.asarray(cs2),
                        cache_leftpad=np.asarray(lp), causal=True)
    fails += not gate("contig leftpad", out, o32, onat)

    out = jax.jit(lambda q, a, b: flash_attn_with_kvcache(
        q, a, b, cache_seqlens=cs2, causal=True, window_size=(500, -1),
        kv_cache_layout="HND"))(q3, kcc, vcc)
    o32, onat = _oracle(q3, kcc, vcc, cache_seqlens=np.asarray(cs2),
                        causal=True, window_size=(500, -1))
    fails += not gate("contig window", out, o32, onat)
    print(f"  ({time.time()-t0:.1f}s)", flush=True)

    # ---- split-KV consistency ----
    t0 = time.time()
    outs = [jax.jit(lambda q, a, b: flash_attn_with_kvcache(
        q, a, b, cache_seqlens=cs2, causal=True, num_splits=s,
        kv_cache_layout="HND"))(q3, kcc, vcc) for s in (0, 1, 4)]
    e = max(float(jnp.max(jnp.abs(outs[0].astype(jnp.float32)
                                  - o.astype(jnp.float32))))
            for o in outs[1:])
    ok = e <= 5e-3
    print(f"{'PASS' if ok else 'FAIL'} decode split-KV consistency: "
          f"max delta {e:.2e}  ({time.time()-t0:.1f}s)", flush=True)
    fails += not ok

    # ---- throughput (informational) ----
    if not args.quick:
        B2 = 8
        P2 = B2 * ctx // ps
        kp2, vp2 = mkb(Hk, P2, ps, D), mkb(Hk, P2, ps, D)
        t2 = jnp.arange(P2, dtype=jnp.int32).reshape(B2, -1)
        c2 = jnp.full((B2,), ctx, jnp.int32)
        q2 = mkb(B2, 1, Hq, D)

        def chain(core, n):
            def run(qc, *ops):
                def step(qi, _):
                    return (qi + 1e-6 * core(qi, *ops).astype(qi.dtype)), ()
                return jax.lax.scan(step, qc, None, length=n)[0]
            return jax.jit(run)

        fd = chain(lambda qc, a, b: flash_attn_with_kvcache(
            qc, a, b, cache_seqlens=c2, block_table=t2, causal=True,
            kv_cache_layout="HND"), 32)
        dt = measure(fd, q2, kp2, vp2, iters=4) / 32
        nbytes = 2 * B2 * ctx * Hk * D * 2
        print(f"decode 32k bf16: {B2/dt:.0f} tok/s  "
              f"{gbps(nbytes, dt):.0f} GB/s "
              f"({gbps(nbytes, dt)/819*100:.0f}% roofline)", flush=True)

    print(f"sweep_decode: {'OK' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
