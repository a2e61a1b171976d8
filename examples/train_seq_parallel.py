"""Long-context training step: ring attention over a (data, seq, model) mesh.

Works on any device count; hermetic 8-virtual-device CPU run:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_seq_parallel.py
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
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_attn_v100_tpu.parallel.mesh import make_mesh
from flash_attn_v100_tpu.parallel.ring import (
    ring_attention, zigzag_shard, zigzag_unshard)

mesh = make_mesh(data=1, seq=-1, model=1)   # all devices on the seq axis
n = mesh.shape["seq"]
print(f"mesh: {dict(mesh.shape)} on {jax.device_count()} devices")

B, M, Hq, Hk, D = 2, 8 * 512, 8, 8, 64      # M is the GLOBAL sequence length
rng = np.random.default_rng(0)
mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
q, k, v = mk(B, M, Hq, D), mk(B, M, Hk, D), mk(B, M, Hk, D)

# zigzag stripes balance causal work across the ring (chip i holds stripes
# i and 2n-1-i); shard the sequence axis over the mesh
q_z, k_z, v_z = (zigzag_shard(t, n) for t in (q, k, v))
spec = P("data", "seq", "model", None)
sh = NamedSharding(mesh, spec)
q_z, k_z, v_z = (jax.device_put(t, sh) for t in (q_z, k_z, v_z))


@jax.jit
def loss_and_grads(q, k, v):
    def loss(q, k, v):
        o = ring_attention(q, k, v, mesh, causal=True, layout="zigzag",
                           q_partition=spec, kv_partition=spec)
        return (o.astype(jnp.float32) ** 2).mean()
    return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)


val, (dq, dk, dv) = loss_and_grads(q_z, k_z, v_z)
print("loss:", float(val), "dq sharding:", dq.sharding.spec)
dq_global = zigzag_unshard(dq, n)
print("global dq:", dq_global.shape)
