"""Headline benchmark: prefill attention TFLOPs/chip at 4k context, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = speedup over the XLA-native einsum SDPA (fp32-softmax, the
oracle formulation) on the same chip and shape — the reference reports the
same style of relative speedup vs its torch einsum oracle
(reference: test.py:359-372).

Also prints (to stderr) the secondary BASELINE.json metrics: 32k decode
tokens/s/chip (bf16 + int8 KV) so round-over-round progress is visible.
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from flash_attn_v100_tpu import flash_attn_func, flash_attn_with_kvcache
    from flash_attn_v100_tpu.ops.quant import quantize_kv
    from flash_attn_v100_tpu.utils.benchmarking import (
        measure, tflops, gbps, attention_flops)

    rng = np.random.default_rng(0)
    mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

    # ---- primary: prefill attention, 4k ctx, causal, llama-70B-ish heads ----
    B, M, Hq, Hk, D = 4, 4096, 32, 8, 128
    q, k, v = mkb(B, M, Hq, D), mkb(B, M, Hk, D), mkb(B, M, Hk, D)
    f = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=True))
    dt = measure(f, q, k, v, iters=8)
    fl = attention_flops(B, M, M, Hq, D, causal=True)
    val = tflops(fl, dt)

    # XLA-native SDPA baseline (what a JAX user gets without this framework).
    # Run on a (B=1, H=4) slice — the full shape would materialize an 8.6 GB
    # fp32 scores tensor — and scale linearly to the full head count.
    Hb = 4
    def sdpa(q, k, v):
        kr = jnp.swapaxes(k, 1, 2)
        vr = jnp.swapaxes(v, 1, 2)
        qt = jnp.swapaxes(q, 1, 2)
        s = jnp.einsum("bhmd,bhnd->bhmn", qt, kr).astype(jnp.float32) * D ** -0.5
        mask = jnp.tril(jnp.ones((M, M), bool))
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.swapaxes(jnp.einsum("bhmn,bhnd->bhmd", p, vr), 1, 2)

    g = jax.jit(sdpa)
    qs, ks_, vs_ = q[:1, :, :Hb], k[:1, :, :Hb], v[:1, :, :Hb]
    dt_base = measure(g, qs, ks_, vs_, iters=4) * (B * Hq) / Hb
    vs_baseline = dt_base / dt

    print(json.dumps({
        "metric": "prefill_attn_tflops_chip_4k_bf16",
        "value": round(val, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(vs_baseline, 3),
    }))

    # ---- secondary: 32k decode (stderr, informational) ----
    try:
        B, Hq, Hk, D = 8, 32, 8, 128
        ctx, ps = 32768, 256
        P_ = B * ctx // ps
        pool = mkb(Hk, P_, ps, D)
        table = jnp.arange(P_, dtype=jnp.int32).reshape(B, -1)
        cs = jnp.full((B,), ctx, jnp.int32)
        qd = mkb(B, 1, Hq, D)
        fd = jax.jit(lambda q, a, b: flash_attn_with_kvcache(
            q, a, b, cache_seqlens=cs, block_table=table, causal=True,
            kv_cache_layout="HND"))
        dt = measure(fd, qd, pool, pool, iters=16)
        print(f"decode_32k_bf16: {B/dt:.0f} tok/s/chip, "
              f"{gbps(2*B*ctx*Hk*D*2, dt):.0f} GB/s", file=sys.stderr)

        kq, ks = quantize_kv(pool, jnp.int8)
        vq, vs = quantize_kv(pool, jnp.int8)
        fq = jax.jit(lambda q, a, b, c, d: flash_attn_with_kvcache(
            q, a, b, cache_seqlens=cs, block_table=table, causal=True,
            k_scales=c, v_scales=d, kv_cache_layout="HND"))
        dt = measure(fq, qd, kq, vq, ks, vs, iters=16)
        print(f"decode_32k_int8: {B/dt:.0f} tok/s/chip", file=sys.stderr)
    except Exception as e:  # secondary metrics must not break the bench line
        print(f"secondary bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
