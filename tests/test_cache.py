"""KV-cache constructors (flash_attn_v100_tpu.cache) end-to-end with the
kvcache op."""

import numpy as np
import jax.numpy as jnp

from flash_attn_v100_tpu import flash_attn_with_kvcache
from flash_attn_v100_tpu.cache import (
    init_contiguous, init_paged, kvcache_kwargs)


def test_contiguous_cache_roundtrip(rng):
    B, N, Hk, Hq, D = 2, 64, 2, 4, 32
    c = init_contiguous(B, N, Hk, D, dtype=jnp.float32)
    assert not c.quantized and c.k.shape == (B, Hk, N, D)
    q = jnp.asarray(rng.standard_normal((B, 4, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, 4, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 4, Hk, D)), jnp.float32)
    out, (kc, vc) = flash_attn_with_kvcache(
        q, c.k, c.v, k=k, v=v, cache_seqlens=0, causal=True,
        **kvcache_kwargs(c))
    assert out.shape == q.shape
    # appended rows landed at positions 0..3 in HND layout
    np.testing.assert_allclose(np.asarray(kc[:, :, :4]),
                               np.asarray(jnp.swapaxes(k, 1, 2)), atol=1e-6)


def test_paged_cache_quantized(rng):
    ps, P, Hk, Hq, D = 8, 8, 2, 4, 32
    c = init_paged(P, ps, Hk, D, dtype=jnp.int8)
    assert c.quantized and c.num_pages == P
    assert c.k_scales.shape == (Hk, P, ps, 1)
    B = 2
    table = jnp.arange(B * 4, dtype=jnp.int32).reshape(B, 4)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, 1, Hk, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 1, Hk, D)), jnp.float32)
    out, (kc, vc, ksc, vsc) = flash_attn_with_kvcache(
        q, c.k, c.v, k=k, v=v, cache_seqlens=0, block_table=table,
        causal=True, **kvcache_kwargs(c))
    assert kc.dtype == jnp.int8 and ksc.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
