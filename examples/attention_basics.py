"""Tour of the three public attention functions (dense / varlen / kvcache).

Runs on the default backend (TPU if present).  Hermetic CPU run:
    JAX_PLATFORMS=cpu python examples/attention_basics.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# honor JAX_PLATFORMS=cpu even though this image's sitecustomize pins the
# axon TPU plugin (env alone is not enough once the plugin registers)
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from flash_attn_v100_tpu import (
    flash_attn_func, flash_attn_varlen_func, flash_attn_with_kvcache)
from flash_attn_v100_tpu.ops.padding import unpad_input, pad_input
from flash_attn_v100_tpu.ops.quant import quantize_kv

rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

# ---- dense, GQA, causal — differentiable -------------------------------
# (small shapes so the CPU interpret-mode run finishes quickly; scale up
# freely on a real chip)
B, M, Hq, Hk, D = 2, 256, 8, 4, 64
q, k, v = mk(B, M, Hq, D), mk(B, M, Hk, D), mk(B, M, Hk, D)
out = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=True))(q, k, v)
loss = lambda q, k, v: flash_attn_func(q, k, v, causal=True,
                                       window_size=(256, 0),
                                       softcap=30.0).astype(jnp.float32).sum()
dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
print("dense:", out.shape, "grads:", dq.shape, dk.shape, dv.shape)

# ---- varlen: ragged batch packed with bert_padding-style utils ---------
lens = jnp.asarray([180, 256], jnp.int32)
mask = jnp.arange(M)[None, :] < lens[:, None]
q_p, idx, cu, maxlen, _ = unpad_input(q, mask)
k_p, _, _, _, _ = unpad_input(k, mask)
v_p, _, _, _, _ = unpad_input(v, mask)
out_p = flash_attn_varlen_func(q_p, k_p, v_p, cu, cu, maxlen, maxlen,
                               causal=True)
out_batch = pad_input(out_p, idx, B, M)
print("varlen:", out_p.shape, "->", out_batch.shape)

# ---- kvcache decode: paged int8 pool + rotary + append -----------------
ps, N = 128, 1024
pools = B * N // ps
kpool, vpool = mk(Hk, pools, ps, D), mk(Hk, pools, ps, D)
kq, ks = quantize_kv(kpool, jnp.int8)
vq, vs = quantize_kv(vpool, jnp.int8)
table = jnp.arange(pools, dtype=jnp.int32).reshape(B, -1)
cs = jnp.asarray([700, 400], jnp.int32)
qd, kn, vn = mk(B, 1, Hq, D), mk(B, 1, Hk, D), mk(B, 1, Hk, D)
cos = jnp.cos(jnp.arange(N)[:, None] * (10000.0 **
              (-jnp.arange(0, D, 2) / D))[None, :]).astype(jnp.float32)
sin = jnp.sin(jnp.arange(N)[:, None] * (10000.0 **
              (-jnp.arange(0, D, 2) / D))[None, :]).astype(jnp.float32)
out_d = flash_attn_with_kvcache(
    qd, kq, vq, k=kn, v=vn, cache_seqlens=cs, block_table=table,
    k_scales=ks, v_scales=vs, rotary_cos=cos, rotary_sin=sin,
    causal=True, kv_cache_layout="HND")
o = out_d[0] if isinstance(out_d, tuple) else out_d
print("decode:", o.shape, "int8 pool bytes/token:", Hk * (D + 4) * 2)
