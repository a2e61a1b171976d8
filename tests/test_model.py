"""Flagship model: training step learns, decode matches prefill, sharded
train step runs on the 8-device mesh and matches single-device."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.models.transformer import (
    ModelConfig, init_params, forward, loss_fn, sgd_train_step,
    init_kv_caches, decode_step)
from flash_attn_v100_tpu.parallel.mesh import make_mesh
from flash_attn_v100_tpu.utils.testing import max_abs_err


CFG = ModelConfig.tiny()


def make_tokens(rng, B, S):
    return jnp.asarray(rng.integers(0, CFG.vocab_size, (B, S)), jnp.int32)


def test_forward_shapes(rng):
    params = init_params(jax.random.PRNGKey(0), CFG)
    toks = make_tokens(rng, 2, 64)
    logits = forward(params, toks, CFG)
    assert logits.shape == (2, 64, CFG.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_training_learns(rng):
    """A few SGD steps on a repeated batch must drop the loss."""
    params = init_params(jax.random.PRNGKey(0), CFG)
    toks = make_tokens(rng, 2, 64)
    step = jax.jit(lambda p, t: sgd_train_step(p, t, CFG, lr=5e-2))
    l0, params = step(params, toks)
    losses = [float(l0)]
    for _ in range(15):
        l, params = step(params, toks)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.85, losses


def test_decode_matches_prefill(rng):
    """Token-by-token decode through the kvcache op == full causal prefill."""
    params = init_params(jax.random.PRNGKey(1), CFG)
    B, S = 2, 16
    toks = make_tokens(rng, B, S)
    full = forward(params, toks, CFG)

    caches = init_kv_caches(CFG, B, 64)
    outs = []
    for t in range(S):
        lens = jnp.full((B,), t, jnp.int32)
        logits, caches = decode_step(params, caches, toks[:, t:t + 1], lens, CFG)
        outs.append(logits[:, 0])
    dec = jnp.stack(outs, axis=1)
    err = max_abs_err(jax.nn.log_softmax(dec), jax.nn.log_softmax(full))
    assert err < 2e-2, err


def test_sharded_train_step_matches(rng):
    """dp=2 x seq=2 x tp=2 sharded loss == single-device loss."""
    mesh = make_mesh(data=2, seq=2, model=2)
    params = init_params(jax.random.PRNGKey(0), CFG)
    toks = make_tokens(rng, 4, 65)  # loss drops 1 token: 64 rows, seq-divisible

    l_single = float(loss_fn(params, toks, CFG))

    from flash_attn_v100_tpu.models.transformer import param_shardings
    from jax.sharding import NamedSharding, PartitionSpec as P
    shardings = param_shardings(params, CFG, mesh)
    params_s = jax.device_put(params, shardings)
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    l_sharded = float(jax.jit(
        lambda p, t: loss_fn(p, t, CFG, mesh=mesh))(params_s, toks_s))
    assert abs(l_single - l_sharded) < 1e-3, (l_single, l_sharded)

    # one full sharded SGD step executes
    loss, new_params = jax.jit(
        lambda p, t: sgd_train_step(p, t, CFG, lr=1e-2, mesh=mesh))(params_s, toks_s)
    assert np.isfinite(float(loss))
