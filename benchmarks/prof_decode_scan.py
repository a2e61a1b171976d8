"""Ground-truth decode kernel timing: chain N kernel calls in ONE jitted scan
so per-dispatch tunnel noise (~ms, comparable to the kernel itself) amortizes
away.  The q input of step i+1 depends on step i's output, so XLA cannot
hoist or CSE the loop body.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.ops.pallas.decode import paged_decode_attention, merge_partials
from flash_attn_v100_tpu.ops.pallas import masks as masklib
from flash_attn_v100_tpu.ops.quant import quantize_kv
from flash_attn_v100_tpu.utils.benchmarking import measure, gbps

B, Hq, Hk, D = 8, 32, 8, 128
ctx = 32768
group = Hq // Hk
N_CHAIN = 64

rng = np.random.default_rng(0)
mkb = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

kpool = mkb(Hk, B * ctx // 256, 256, D)
vpool = mkb(Hk, B * ctx // 256, 256, D)
qd = mkb(B, Hk, 8, D)
cs = jnp.full((B,), ctx, jnp.int32)
lp = jnp.zeros((B,), jnp.int32)
params = masklib.MaskParams(causal=False, window_left=-1, window_right=0,
                            softcap=0.0, has_alibi=False)
scale = D ** -0.5

kq0, ks0 = quantize_kv(kpool, jnp.int8)
vq0, vs0 = quantize_kv(vpool, jnp.int8)
kq0, ks0, vq0, vs0 = jax.device_put((kq0, ks0, vq0, vs0))


def make(ps, quant, int8_matmul, kv_unroll=None):
    P_ = B * ctx // ps
    table = jnp.arange(P_, dtype=jnp.int32).reshape(B, -1)

    def core(q, ops):
        if quant:
            a, b, c, d = ops
            o, l = paged_decode_attention(
                q, a[None], b[None], table, cs, lp,
                softmax_scale=scale, params=params, t_new=1, group=group,
                k_scales=c[None], v_scales=d[None], int8_matmul=int8_matmul,
                kv_unroll=kv_unroll)
        else:
            a, b = ops
            o, l = paged_decode_attention(
                q, a[None], b[None], table, cs, lp,
                softmax_scale=scale, params=params, t_new=1, group=group,
                kv_unroll=kv_unroll)
        return merge_partials(o, l)[0]

    def chained(q, ops):
        def step(qc, _):
            o = core(qc, ops)
            # data dependency, numerically tame: q + tiny*o
            return (qc + 1e-6 * o[..., :].astype(qc.dtype)), ()
        qf, _ = jax.lax.scan(step, q, None, length=N_CHAIN)
        return qf

    if quant:
        ops = (kq0.reshape(Hk, P_, ps, D), vq0.reshape(Hk, P_, ps, D),
               ks0.reshape(Hk, P_, ps, 1), vs0.reshape(Hk, P_, ps, 1))
        nbytes = 2 * B * ctx * Hk * (D + 4)
    else:
        ops = (kpool.reshape(Hk, P_, ps, D), vpool.reshape(Hk, P_, ps, D))
        nbytes = 2 * B * ctx * Hk * D * 2
    return jax.jit(chained), (qd, ops), nbytes


SETS = {
    "main": lambda: {
        "bf16 ps=256":        make(256, False, None),
        "bf16 ps=512":        make(512, False, None),
        "int8-mxu ps=256":    make(256, True, True),
        "int8-mxu ps=256 U1": make(256, True, True, kv_unroll=1),
        "int8-mxu ps=512":    make(512, True, True),
        "int8-mxu ps=512 U2": make(512, True, True, kv_unroll=2),
        "int8-deq ps=256":    make(256, True, False),
        "int8-deq ps=512":    make(512, True, False),
    },
    "unroll": lambda: {
        "int8 ps=256 U2":  make(256, True, True, kv_unroll=2),
        "int8 ps=256 U4":  make(256, True, True, kv_unroll=4),
        "int8 ps=256 U8":  make(256, True, True, kv_unroll=8),
        "int8 ps=512 U2":  make(512, True, True, kv_unroll=2),
        "int8 ps=512 U4":  make(512, True, True, kv_unroll=4),
        "int8 ps=1024 U1": make(1024, True, True, kv_unroll=1),
        "int8 ps=1024 U2": make(1024, True, True, kv_unroll=2),
        "bf16 ps=512 U2":  make(512, False, None, kv_unroll=2),
        "bf16 ps=1024 U1": make(1024, False, None, kv_unroll=1),
    },
}
VARIANTS = SETS[os.environ.get("SET", "main")]()

import statistics
ROUNDS = int(os.environ.get("ROUNDS", "3"))
times = {k: [] for k in VARIANTS}
for r in range(ROUNDS):
    for name, (fj, args, nbytes) in VARIANTS.items():
        dt = measure(fj, *args, iters=4) / N_CHAIN
        times[name].append(dt)

print("\n== median of rounds (scan-chained x64) ==")
for name, (fj, args, nbytes) in VARIANTS.items():
    dt = statistics.median(times[name])
    print(f"{name:19s}: {B/dt:7.0f} tok/s  {dt*1e3:7.3f} ms  "
          f"{gbps(nbytes, dt):6.0f} GB/s  ({gbps(nbytes, dt)/819*100:5.1f}% roofline)"
          f"   runs={['%.3f' % (t*1e3) for t in times[name]]}")
