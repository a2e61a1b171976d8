"""Continuous-batching serving with streaming and a quantized KV pool.

    python examples/serve_engine.py            # TPU (or default backend)
    JAX_PLATFORMS=cpu python examples/serve_engine.py
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

from flash_attn_v100_tpu.models.transformer import ModelConfig, init_params
from flash_attn_v100_tpu.runtime.engine import ServingEngine, SamplingParams

cfg = ModelConfig(vocab_size=1024, dim=256, n_layers=2, n_heads=8,
                  n_kv_heads=4, head_dim=32, ffn_dim=704, max_seq_len=512,
                  dtype=jnp.bfloat16)
params = init_params(jax.random.PRNGKey(0), cfg)

eng = ServingEngine(params, cfg, max_batch=4, num_pages=128, page_size=16,
                    kv_dtype=jnp.int8)          # int8 page pool
print("native C++ scheduler:", eng.sched.is_native)

rng = np.random.default_rng(0)
streamed = {}


def on_token(rid, toks):
    streamed.setdefault(rid, []).extend(toks)


rids = [
    eng.submit(rng.integers(1, cfg.vocab_size, 64).tolist(),
               max_new_tokens=24,
               sampling=SamplingParams(temperature=0.8, top_k=40, top_p=0.95),
               on_token=on_token)
    for _ in range(6)                            # > max_batch: queued + batched
]
eng.run_to_completion()
for r in rids:
    assert streamed[r] == eng.result(r)
print({r: len(eng.result(r)) for r in rids}, "| metrics:", eng.metrics["steps"],
      "steps,", eng.sched.stats()["preemptions"], "preemptions")
