"""Drive flash_attn_with_kvcache on the real chip vs the fp32 oracle.

Covers the fast-path/masked-path split in ops/pallas/decode.py: interior
pages (fully live) vs boundary pages, across causal / window / leftpad /
t_new>1 / alibi / int8 / int4 / paged configs."""
import numpy as np
import jax
import jax.numpy as jnp

import flash_attn_v100_tpu as fa
from flash_attn_v100_tpu.ops.reference import mha_reference_kvcache
from flash_attn_v100_tpu.ops.quant import quantize_kv, dequantize_kv

rng = np.random.default_rng(7)


def mk(*s, dt=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(s), dt)


def run_case(name, *, causal=False, window=(-1, -1), leftpad=False,
             t_new=1, alibi=False, quant=None, paged=False, N=1536,
             B=3, Hq=8, Hk=2, D=128, append=False, tol=2.5e-2):
    q = mk(B, t_new, Hq, D)
    kc = mk(B, N, Hk, D)
    vc = mk(B, N, Hk, D)
    used = np.asarray(rng.integers(N // 3, N - t_new - 8, B), np.int32)
    lp = (np.asarray(rng.integers(0, 32, B), np.int32) if leftpad
          else None)
    kn = vn = None
    if append:
        kn, vn = mk(B, t_new, Hk, D), mk(B, t_new, Hk, D)
    slopes = (jnp.asarray(rng.uniform(0.01, 0.2, Hq), jnp.float32)
              if alibi else None)
    cs = jnp.asarray(used)
    lpj = jnp.asarray(lp) if lp is not None else None

    kwargs = dict(causal=causal, window_size=window,
                  cache_leftpad=lpj, alibi_slopes=slopes)
    bt = None
    if paged:
        ps = 256
        ppb = N // ps
        perm = rng.permutation(B * ppb).astype(np.int32)
        bt = jnp.asarray(perm.reshape(B, ppb))
        kp = jnp.zeros((B * ppb, ps, Hk, D), kc.dtype)
        vp = jnp.zeros((B * ppb, ps, Hk, D), vc.dtype)
        kp = kp.at[bt.reshape(-1)].set(kc.reshape(B * ppb, ps, Hk, D))
        vp = vp.at[bt.reshape(-1)].set(vc.reshape(B * ppb, ps, Hk, D))
        kuse, vuse = kp, vp
        kwargs["cache_leftpad"] = None
        lpj = None
    else:
        kuse, vuse = kc, vc

    ksc = vsc = None
    if quant:
        qdt = jnp.int8 if quant == "int8" else quant
        kq, ksc = quantize_kv(kuse, qdt, token_axis=1)   # NHD layouts
        vq, vsc = quantize_kv(vuse, qdt, token_axis=1)
        i4 = quant == "int4"
        # oracle sees the dequantized cache
        kc_o = dequantize_kv(kq, ksc, jnp.bfloat16, int4=i4, token_axis=1)
        vc_o = dequantize_kv(vq, vsc, jnp.bfloat16, int4=i4, token_axis=1)
        if paged:
            ps = 256
            kc_o = kc_o[bt.reshape(-1)].reshape(B, N, Hk, D)
            vc_o = vc_o[bt.reshape(-1)].reshape(B, N, Hk, D)
        kuse, vuse = kq, vq
    else:
        kc_o = kc
        vc_o = vc

    out = fa.flash_attn_with_kvcache(
        q, kuse, vuse, k=kn, v=vn, cache_seqlens=cs, block_table=bt,
        k_scales=ksc, v_scales=vsc, **kwargs)
    if isinstance(out, tuple):
        out = out[0]
    ref, _, _ = mha_reference_kvcache(
        q, kc_o, vc_o, k_new=kn, v_new=vn, cache_seqlens=cs,
        cache_leftpad=lpj, causal=causal, window_size=window,
        alibi_slopes=slopes, upcast=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
    rel = err / scale
    status = "PASS" if rel < tol else "FAIL"
    print(f"{status} {name}: max_err={err:.4g} rel={rel:.4g}")
    return rel < tol


ok = True
ok &= run_case("dense-causal", causal=True)
ok &= run_case("dense-noncausal")
ok &= run_case("window", window=(384, -1), causal=True)
ok &= run_case("leftpad-causal", leftpad=True, causal=True)
ok &= run_case("tnew4-append-causal", t_new=4, append=True, causal=True)
ok &= run_case("alibi", alibi=True, causal=True)
ok &= run_case("int8-causal", quant="int8", causal=True, tol=4e-2)
ok &= run_case("int4-causal", quant="int4", causal=True, tol=8e-2)
ok &= run_case("paged-causal", paged=True, causal=True)
ok &= run_case("paged-int8", paged=True, quant="int8", causal=True, tol=4e-2)
ok &= run_case("paged-window", paged=True, window=(500, -1), causal=True)
print("ALL PASS" if ok else "SOME FAIL")
