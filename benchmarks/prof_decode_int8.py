"""Profile 32k-ctx decode variants (VERDICT r1 #1: int8 vs bf16, roofline %).

Methodology notes (learned the hard way):
  * K and V must be DISTINCT device arrays — passing the same array twice
    lets the pipeline serve the second stream without streaming HBM twice,
    inflating apparent GB/s past the roofline (round-1 bench.py did this for
    bf16 and not for int8, manufacturing a phantom "int8 regression").
  * Variants are measured interleaved, several rounds, reporting the BEST
    round per variant: tunnel noise only ever adds time.
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


def make(ps, quant, int8_matmul):
    P_ = B * ctx // ps
    table = jnp.arange(P_, dtype=jnp.int32).reshape(B, -1)
    if quant:
        args = (qd, kq0.reshape(Hk, P_, ps, D), vq0.reshape(Hk, P_, ps, D),
                ks0.reshape(Hk, P_, ps, 1), vs0.reshape(Hk, P_, ps, 1))
        def f(q, a, b, c, d):
            o, l = paged_decode_attention(
                q, a[None], b[None], table, cs, lp,
                softmax_scale=scale, params=params, t_new=1, group=group,
                k_scales=c[None], v_scales=d[None], int8_matmul=int8_matmul)
            return merge_partials(o, l)[0]
        nbytes = 2 * B * ctx * Hk * (D + 4)
    else:
        args = (qd, kpool.reshape(Hk, P_, ps, D), vpool.reshape(Hk, P_, ps, D))
        def f(q, a, b):
            o, l = paged_decode_attention(
                q, a[None], b[None], table, cs, lp,
                softmax_scale=scale, params=params, t_new=1, group=group)
            return merge_partials(o, l)[0]
        nbytes = 2 * B * ctx * Hk * D * 2
    return jax.jit(f), args, nbytes


VARIANTS = {
    "bf16 ps=256":     make(256, False, None),
    "bf16 ps=512":     make(512, False, None),
    "int8-mxu ps=256": make(256, True, True),
    "int8-mxu ps=512": make(512, True, True),
    "int8-deq ps=256": make(256, True, False),
    "int8-deq ps=512": make(512, True, False),
}

best = {k: float("inf") for k in VARIANTS}
ROUNDS = int(os.environ.get("ROUNDS", "3"))
for r in range(ROUNDS):
    for name, (fj, args, nbytes) in VARIANTS.items():
        dt = measure(fj, *args, iters=16)
        best[name] = min(best[name], dt)
        print(f"  r{r} {name:16s}: {dt*1e3:7.3f} ms", flush=True)

print("\n== best-of rounds ==")
for name, (fj, args, nbytes) in VARIANTS.items():
    dt = best[name]
    print(f"{name:16s}: {B/dt:7.0f} tok/s  {dt*1e3:7.3f} ms  "
          f"{gbps(nbytes, dt):6.0f} GB/s  ({gbps(nbytes, dt)/819*100:4.1f}% roofline)")
