"""Int4 decode bottleneck hunt: time the production int4 path against
ablated variants (monkeypatched kernels, numerically WRONG — timing only)
to separate matmul-pass cost from the nibble-AND cost from DMA.

Hypothesis: the head_dim nibble split doubles MXU passes (two K=64 QK
matmuls each pad to the MXU's 128 depth; two N=64 PV matmuls pad lanes),
so int4 is compute-bound at ~36% of the HBM roofline while int8 rides it
at 90%.
"""
import os
import sys
import statistics

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.ops.pallas import decode as dec
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.ops.quant import quantize_kv
from flash_attn_v100_tpu.utils.benchmarking import measure, gbps

B, Hq, Hk, D = 8, 32, 8, 128
ctx = 32768
group = Hq // Hk
N_CHAIN = int(os.environ.get("N_CHAIN", "16"))

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

kpool = mkb(Hk, B * ctx // 512, 512, D)
vpool = mkb(Hk, B * ctx // 512, 512, D)
qd = mkb(B, Hk, 8, D)
cs = jnp.full((B,), ctx, jnp.int32)
lp = jnp.zeros((B,), jnp.int32)
params = masklib.MaskParams(causal=False, window_left=-1, window_right=0,
                            softcap=0.0, has_alibi=False)
scale = D ** -0.5

k8, ks8 = quantize_kv(kpool, jnp.int8)
v8, vs8 = quantize_kv(vpool, jnp.int8)
k4, ks4 = quantize_kv(kpool, "int4")
v4, vs4 = quantize_kv(vpool, "int4")

_orig_tile = dec._decode_tile_update


def ablated_tile(mode):
    """Return a _decode_tile_update whose int4 branches are modified."""
    def tile(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_scr, l_scr, acc_scr,
             slopes_ref, j_start, lp_, cs_, qpos_base, *, masked, params,
             softmax_scale, t_new, group, rq, page_size, quantized,
             int8_qk, int4):
        if not (int4 and int8_qk):
            return _orig_tile(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_scr,
                              l_scr, acc_scr, slopes_ref, j_start, lp_, cs_,
                              qpos_base, masked=masked, params=params,
                              softmax_scale=softmax_scale, t_new=t_new,
                              group=group, rq=rq, page_size=page_size,
                              quantized=quantized, int8_qk=int8_qk, int4=int4)
        q = q_ref[0]
        k = k_ref[0, :, 0]                 # (hb, ps, D/2) packed bytes
        q32 = q.astype(jnp.float32)
        q_amax = jnp.max(jnp.abs(q32), axis=2, keepdims=True)
        q_scale = jnp.where(q_amax == 0.0, 1.0, q_amax / 127.0)
        q8 = jnp.round(q32 / q_scale).astype(jnp.int8)
        D2 = q8.shape[2] // 2
        q_lo = q8[:, :, :D2]
        if mode == "lo_only":              # 1 AND + 1 K=64 matmul
            st = jax.lax.dot_general(
                q_lo, k & jnp.int8(15), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        elif mode == "no_and":             # 1 matmul on raw bytes, no AND
            st = jax.lax.dot_general(
                q_lo, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        st = st * q_scale
        st = st * ks_ref[0, :, 0].astype(jnp.float32)
        st = st * softmax_scale

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(st, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(jnp.maximum(st - m_next[:, :, :1], -80.0))
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_scr[...] = m_next

        v = v_ref[0, :, 0]
        p = p * vs_ref[0, :, 0].astype(jnp.float32)
        p_amax = jnp.max(jnp.abs(p), axis=2, keepdims=True)
        p_scale = jnp.where(p_amax == 0.0, 1.0, p_amax / 127.0)
        p8 = jnp.round(p / p_scale).astype(jnp.int8)
        if mode == "lo_only":              # 1 AND + 1 N=64 matmul
            pv_half = jax.lax.dot_general(
                p8, v & jnp.int8(15), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        elif mode == "no_and":
            pv_half = jax.lax.dot_general(
                p8, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        pv = jnp.concatenate([pv_half, pv_half], axis=-1)
        pv = pv * p_scale
        acc_scr[...] = acc_scr[...] * alpha[:, :, :1] + pv
    return tile


def make(quant_args, int8_matmul, int4, kv_unroll=None, patch=None):
    P_ = quant_args[0].shape[1]
    ps = quant_args[0].shape[2]
    table = jnp.arange(B * ctx // ps, dtype=jnp.int32).reshape(B, -1)
    a, b_, c, d_ = quant_args

    def core(q):
        o, l = dec.paged_decode_attention(
            q, a[None], b_[None], table, cs, lp,
            softmax_scale=scale, params=params, t_new=1, group=group,
            k_scales=c[None], v_scales=d_[None], int8_matmul=int8_matmul,
            kv_unroll=kv_unroll, int4=int4)
        return dec.merge_partials(o, l)[0]

    def chained(q):
        def step(qc, _):
            o = core(qc)
            return (qc + 1e-6 * o[..., :D].astype(qc.dtype)), ()
        qf, _ = jax.lax.scan(step, q, None, length=N_CHAIN)
        return qf

    if patch is not None:
        dec._decode_tile_update = ablated_tile(patch)
    try:
        fj = jax.jit(chained)
        fj(qd).block_until_ready()        # compile under the patch
    finally:
        dec._decode_tile_update = _orig_tile
    nbytes = 2 * B * ctx * Hk * ((D // 2 if int4 else D) + 4)
    return fj, nbytes


ALL = {
    "int8-mxu":         lambda: make((k8, v8, ks8, vs8), True, False),
    "int4-prod":        lambda: make((k4, v4, ks4, vs4), True, True),
    "int4-float":       lambda: make((k4, v4, ks4, vs4), False, True),
    "int4-lo-only":     lambda: make((k4, v4, ks4, vs4), True, True,
                                     patch="lo_only"),
    "int4-no-AND":      lambda: make((k4, v4, ks4, vs4), True, True,
                                     patch="no_and"),
}
names = os.environ.get("VARIANTS", "int8-mxu,int4-prod,int4-lo-only").split(",")

ROUNDS = int(os.environ.get("ROUNDS", "2"))
print(f"== int4 decode ablations (32k ctx, ps=512, {ROUNDS} rounds) ==",
      flush=True)
for name in names:
    import time
    t0 = time.time()
    fj, nbytes = ALL[name]()
    print(f"[compiled {name} in {time.time()-t0:.0f}s]", flush=True)
    runs = []
    for r in range(ROUNDS):
        runs.append(measure(fj, qd, iters=2) / N_CHAIN)
    dt = statistics.median(runs)
    print(f"{name:18s}: {B/dt:7.0f} tok/s  {dt*1e3:7.3f} ms  "
          f"{gbps(nbytes, dt):6.0f} GB/s  ({gbps(nbytes, dt)/819*100:5.1f}%)",
          flush=True)
