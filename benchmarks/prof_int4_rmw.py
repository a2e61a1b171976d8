"""Micro A/B (r5): single-round vs two-round int4 decode RMW on a
layer-folded decode-shape pool.  A T=1 append cannot have two writes
sharing a packed byte (each batch row targets its own sequence's page),
so _int4_rmw_paged takes one gather+scatter round for decode appends —
measured 877 -> 500 us per append, bit-identical (docs/round5.md §8)."""
import sys, os
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from flash_attn_v100_tpu.ops import kvcache as kc
from flash_attn_v100_tpu.utils.benchmarking import measure

Hk, L, B, PS, D = 8, 16, 16, 128, 128
P = (B * 20 + 1) * L  # folded page axis, ~2k ctx capacity
pool = jnp.zeros((Hk, P, PS // 2, D), jnp.int8)
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.integers(-8, 8, (B, 1, Hk, D)), jnp.int8)
pids = jnp.asarray(rng.integers(0, P, (B, 1)), jnp.int32)
off = jnp.asarray(rng.integers(0, PS, (B, 1)), jnp.int32)


def two_round(pool, vals, page_ids, off):
    h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, None, :]
    br = (off // 2)[..., None]
    parity = off % 2
    contrib, keep = kc._int4_nibble_parts(vals, parity[..., None, None])
    pid_g = jnp.clip(page_ids, 0, pool.shape[1] - 1)[..., None]
    for p in (0, 1):
        old = pool[h_ix, pid_g, br]
        new = (old & keep) | contrib
        pid_w = jnp.where(parity == p, page_ids, jnp.int32(2 ** 30))
        pool = pool.at[h_ix, pid_w[..., None], br].set(new, mode="drop")
    return pool


def chain(fn):
    def run(vals, pids, off):
        p = jnp.zeros((Hk, P, PS // 2, D), jnp.int8)
        def body(c, _):
            return fn(c, vals, pids, off), ()
        c, _ = jax.lax.scan(body, p, None, length=64)
        return c[0, 0, 0, 0]
    return jax.jit(run)


for name, fn in (("two-round (old)", two_round),
                 ("one-round (new)", kc._int4_rmw_paged)):
    f = chain(fn)
    f(vals, pids, off).block_until_ready()
    dt = measure(f, vals, pids, off, iters=1) / 64
    print(f"{name}: {dt*1e6:.1f} us per T=1 RMW", flush=True)

# parity check vs two-round on CPU-visible result
p1 = two_round(jnp.zeros_like(pool), vals, pids, off)
p2 = kc._int4_rmw_paged(jnp.zeros_like(pool), vals, pids, off)
assert (np.asarray(p1) == np.asarray(p2)).all(), "mismatch"
print("bit-identical OK")
