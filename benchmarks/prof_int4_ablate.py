"""Int4 decode second-stage bottleneck hunt (token-packed layout).

Knobs: kv_unroll (fixed per-step cost), int8_matmul=False (float fallback),
and monkeypatched kernels that skip parts of the nibble pipeline
(numerically WRONG — timing only) to separate AND cost from matmul-pass
cost from everything else.
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
PS = int(os.environ.get("PS", "512"))
group = Hq // Hk
N_CHAIN = int(os.environ.get("N_CHAIN", "8"))

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

kpool, vpool = mkb(Hk, B * ctx // PS, PS, D), mkb(Hk, B * ctx // PS, PS, D)
table = jnp.arange(B * ctx // PS, dtype=jnp.int32).reshape(B, -1)
cs = jnp.full((B,), ctx, jnp.int32)
lp = jnp.zeros((B,), jnp.int32)
params = masklib.MaskParams(causal=False, window_left=-1, window_right=0,
                            softcap=0.0, has_alibi=False)
scale = D ** -0.5
qd = mkb(B, Hk, 8, D)

k8, ks8 = quantize_kv(kpool, jnp.int8)
v8, vs8 = quantize_kv(vpool, jnp.int8)
k4, ks4 = quantize_kv(kpool, "int4")
v4, vs4 = quantize_kv(vpool, "int4")

_orig = dec._decode_tile_update


def patched(mode):
    def tile(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_scr, l_scr, acc_scr,
             slopes_ref, j_start, lp_, cs_, qpos_base, *, masked, params,
             softmax_scale, t_new, group, rq, page_size, quantized,
             int8_qk, int4):
        if not (int4 and int8_qk):
            return _orig(q_ref, k_ref, ks_ref, v_ref, vs_ref, m_scr, l_scr,
                         acc_scr, slopes_ref, j_start, lp_, cs_, qpos_base,
                         masked=masked, params=params,
                         softmax_scale=softmax_scale, t_new=t_new,
                         group=group, rq=rq, page_size=page_size,
                         quantized=quantized, int8_qk=int8_qk, int4=int4)
        ps2 = page_size // 2
        q = q_ref[0]
        k = k_ref[0, :, 0]                 # (hb, ps2, D) packed bytes
        q32 = q.astype(jnp.float32)
        q_amax = jnp.max(jnp.abs(q32), axis=2, keepdims=True)
        q_scale = jnp.where(q_amax == 0.0, 1.0, q_amax / 127.0)
        q8 = jnp.round(q32 / q_scale).astype(jnp.int8)
        if mode in ("qk_one", "no_and"):
            kk = k if mode == "no_and" else (k & jnp.int8(15))
            st_h = jax.lax.dot_general(
                q8, kk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            st = jnp.concatenate([st_h, st_h], axis=2)
        elif mode == "full_qk":            # production QK, simplified PV
            st_e = jax.lax.dot_general(
                q8, k & jnp.int8(15), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            st_o = jax.lax.dot_general(
                q8, k & jnp.int8(-16), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            sum_q8 = jnp.sum(q8.astype(jnp.float32), axis=2, keepdims=True)
            st = jnp.concatenate(
                [st_e - 8.0 * sum_q8, st_o * (1.0 / 16.0)], axis=2)
        st = st * q_scale * ks_ref[0, :, 0].astype(jnp.float32)
        st = st * softmax_scale

        m_prev, l_prev = m_scr[...], l_scr[...]
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
        # simplified PV: single half matmul, duplicate (timing only)
        vv = v if mode == "no_and" else (v & jnp.int8(15))
        pv = jax.lax.dot_general(
            p8[:, :, :ps2], vv, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        pv = pv * p_scale
        acc_scr[...] = acc_scr[...] * alpha[:, :, :1] + pv
    return tile


def run(name, quant_args, int4, kv_unroll=None, patch=None, num_splits=0):
    # pools MUST be jit ARGUMENTS: closed-over arrays are baked into the
    # HLO as literals and a 268 MB pool blows the remote-compile request
    # body limit (HTTP 413 on the axon tunnel)
    def core(q, a, b_, c, d_):
        o, l = dec.paged_decode_attention(
            q, a[None], b_[None], table, cs, lp,
            softmax_scale=scale, params=params, t_new=1, group=group,
            k_scales=c[None], v_scales=d_[None],
            kv_unroll=kv_unroll, int4=int4, num_splits=num_splits)
        return dec.merge_partials(o, l)[0]

    def chained(q, a, b_, c, d_):
        def step(qc, _):
            o = core(qc, a, b_, c, d_)
            return (qc + 1e-6 * o[..., :D].astype(qc.dtype)), ()
        return jax.lax.scan(step, q, None, length=N_CHAIN)[0]

    if patch is not None:
        dec._decode_tile_update = patched(patch)
    try:
        fj = jax.jit(chained)
        fj(qd, *quant_args).block_until_ready()
    finally:
        dec._decode_tile_update = _orig
    dt = statistics.median(
        measure(fj, qd, *quant_args, iters=3) / N_CHAIN for _ in range(3))
    nb = 2 * B * ctx * Hk * ((D // 2 if int4 else D) + 4)
    print(f"{name}: {B/dt:.0f} tok/s, {gbps(nb, dt):.0f} GB/s "
          f"({gbps(nb, dt)/819*100:.0f}%)", flush=True)


which = os.environ.get("VARIANTS",
                       "int8,int4-prod,int4-U4,int4-full-qk,int4-qk-one,"
                       "int4-no-and").split(",")
ALL = {
    "int8":        lambda: run("int8", (k8, v8, ks8, vs8), False),
    "int4-prod":   lambda: run("int4-prod", (k4, v4, ks4, vs4), True),
    "int4-U4":     lambda: run("int4-U4", (k4, v4, ks4, vs4), True,
                               kv_unroll=4),
    "int4-S2":     lambda: run("int4-S2", (k4, v4, ks4, vs4), True,
                               num_splits=2),
    "int4-full-qk": lambda: run("int4-full-qk", (k4, v4, ks4, vs4), True,
                                patch="full_qk"),
    "int4-qk-one": lambda: run("int4-qk-one", (k4, v4, ks4, vs4), True,
                               patch="qk_one"),
    "int4-no-and": lambda: run("int4-no-and", (k4, v4, ks4, vs4), True,
                               patch="no_and"),
}
for name in which:
    ALL[name]()
