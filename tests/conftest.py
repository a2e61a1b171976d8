"""Test configuration: hermetic CPU run with a virtual 8-device mesh.

Pallas kernels run in interpret mode on CPU (see flash_attn_v100_tpu.config);
sharding tests use the 8 virtual CPU devices.  Must set env vars before jax
imports anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# this image's sitecustomize registers a TPU PJRT plugin at interpreter start
# and pre-sets JAX_PLATFORMS; force the CPU backend for hermetic tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(421)  # the reference's fixed seed (test.py:151)


# >30s engine/ring e2e tests (measured durations, round 4).  The quick tier
# (`pytest -m "not slow"`, ~5-10 min) runs before every snapshot; the FULL
# suite stays the gate in run.sh.  Centralized here so the marker set is one
# reviewable list, not scattered decorators.
_SLOW_TESTS = {
    # tests/test_runtime.py — engine e2e
    "test_engine_matches_uncached_greedy",
    "test_engine_preemption_end_to_end",
    "test_engine_seq_mesh_bf16_long_context",
    "test_engine_int4_kv_pool",
    "test_engine_int8_kv_pool",
    "test_engine_chunked_prefill_preemption_restart",
    "test_engine_chunked_prefill_interleaves_decode",
    "test_engine_chunked_prefill_matches_unchunked",
    "test_engine_chunked_prefill_with_prefix_cache",
    "test_engine_prefix_cache_partial_prefix",
    "test_engine_prefix_cache_exact_reuse",
    "test_engine_prefix_cache_dead_source_rejected",
    "test_engine_prefix_cache_seq_mesh_shard_offsets",
    "test_engine_prefix_cache_int8_pool",
    "test_engine_seq_mesh_capacity_scales",
    "test_engine_seq_model_mesh_int8_matches_single",
    "test_engine_per_request_sampling",
    "test_engine_decode_fuse_matches_unfused",
    "test_engine_decode_fuse_int8_pool_matches_unfused",
    "test_engine_decode_fuse_midrun_admission",
    "test_engine_decode_fuse_respects_budget_and_eos",
    "test_engine_eos_reaping",
    # tests/test_parallel.py — ring attention e2e
    "test_ring_attention",
    "test_ring_attention_grad",
    "test_ring_grad_features",
    "test_ring_grad_dropout",
    "test_ring_dropout_matches_dense",
    "test_ring_zigzag",
    "test_ring_zigzag_grad",
    "test_ring_alibi",
    "test_ring_window_softcap",
    "test_ring_window_noncausal",
    "test_sharded_decode_append_rotary_tnew",
    # tests/test_model.py
    "test_decode_matches_prefill",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
