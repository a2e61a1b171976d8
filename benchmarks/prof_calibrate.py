"""Calibrate the wall-clock measurement against ops with known byte counts.

If the measured GB/s of a plain HBM-bound reduction exceeds the v5e roofline
(~819 GB/s), the measurement methodology is broken — fix it before trusting
any kernel numbers.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.utils.benchmarking import measure, gbps, tflops

rng = np.random.default_rng(0)

# 2 GiB bf16 array reduction: must stream 2 GiB from HBM
x = jnp.asarray(rng.standard_normal((1 << 30,)), jnp.bfloat16)
f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
for r in range(4):
    dt = measure(f, x, iters=8)
    print(f"r{r} sum 2GiB bf16: {dt*1e3:8.3f} ms  {gbps(x.nbytes, dt):6.0f} GB/s",
          flush=True)

# 4096^3 bf16 matmul: MXU peak check (~197 TF/s)
a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
g = jax.jit(lambda a, b: a @ b)
for r in range(4):
    dt = measure(g, a, b, iters=8)
    print(f"r{r} matmul 4096^3:  {dt*1e3:8.3f} ms  {tflops(2*4096**3, dt):6.1f} TF/s",
          flush=True)
