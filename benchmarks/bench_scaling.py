"""Multi-chip scaling-efficiency benchmark (BASELINE.json: >=0.9 at 2 hosts).

Weak-scales ring-attention prefill and head-sharded decode over a device
mesh and reports efficiency = T(1) / T(n) at constant per-device work.  On a
real pod slice run it as-is; on a single-chip/dev box run with
`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`
to validate the sharding (timings then measure the simulator, not ICI).

Usage: python benchmarks/bench_scaling.py [--devices 8] [--seq-per-chip 1024]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

# the image's sitecustomize can pin a TPU platform at interpreter start,
# clobbering JAX_PLATFORMS=cpu; honor the user's env choice in-process
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from flash_attn_v100_tpu.parallel.mesh import make_mesh
from flash_attn_v100_tpu.parallel.ring import ring_attention
from flash_attn_v100_tpu.parallel.sharded import flash_attn_with_kvcache_sharded
from flash_attn_v100_tpu.utils.benchmarking import measure


def bench_ring(rng, n_dev, seq_per_chip, H=8, D=128, B=1):
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(data=1, seq=n_dev, model=1)
    S = seq_per_chip * n_dev
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    sh = NamedSharding(mesh, P(None, "seq", None, None))
    q = jax.device_put(mk(B, S, H, D), sh)
    k = jax.device_put(mk(B, S, H, D), sh)
    v = jax.device_put(mk(B, S, H, D), sh)
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, causal=True))
    return measure(f, q, k, v, iters=4)


def bench_decode(rng, n_dev, ctx, B=8, Hq=32, Hk=8, D=128):
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(data=1, seq=1, model=n_dev)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    q = jax.device_put(mk(B, 1, Hq, D),
                       NamedSharding(mesh, P(None, None, "model", None)))
    kc = jax.device_put(mk(B, Hk, ctx, D),
                        NamedSharding(mesh, P(None, "model", None, None)))
    vc = jax.device_put(mk(B, Hk, ctx, D),
                        NamedSharding(mesh, P(None, "model", None, None)))
    cs = jnp.full((B,), ctx, jnp.int32)
    f = jax.jit(lambda q, k, v: flash_attn_with_kvcache_sharded(
        q, k, v, mesh, cs, causal=True))
    return measure(f, q, kc, vc, iters=8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (default: all)")
    ap.add_argument("--seq-per-chip", type=int, default=1024)
    ap.add_argument("--ctx", type=int, default=8192)
    args = ap.parse_args()
    n_all = args.devices or len(jax.devices())
    rng = np.random.default_rng(0)
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_all]
    print(f"backend={jax.default_backend()} devices={n_all}")

    print("ring-attention prefill (weak scaling, seq/chip const):")
    t1 = None
    for n in sizes:
        t = bench_ring(rng, n, args.seq_per_chip)
        t1 = t1 or t
        # causal ring does ~n/2 effective steps; perfect weak scaling for the
        # full-attention FLOPs means T(n) ~ T(1) * n/2 ... report raw + eff
        print(f"  n={n}: {t*1e3:8.2f} ms  eff={t1/t:.2f}")

    print("head-sharded decode (strong scaling, fixed ctx):")
    t1 = None
    for n in sizes:
        if 8 % n:       # KV heads (8) must divide across "model"
            continue
        t = bench_decode(rng, n, args.ctx)
        t1 = t1 or t
        print(f"  n={n}: {t*1e6:8.0f} us  speedup={t1/t:.2f} "
              f"(ideal {n:.1f}) eff={t1/t/n:.2f}")


if __name__ == "__main__":
    main()
