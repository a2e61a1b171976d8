"""`flash_attn` — canonical-name shim over flash_attn_v100_tpu.

The reference ships its Volta implementation under the canonical `flash_attn`
package name so downstream code (HF transformers, unsloth, vLLM-style
`import flash_attn` feature probes) picks it up unchanged
(reference: flash_attn/__init__.py:1-27, setup.py:114-124 dist-info
masquerade).  This package plays the same role for the TPU build: importing
`flash_attn` resolves to the JAX/Pallas engine.

Version masquerades as the flash-attn release whose API surface we match.
"""

from flash_attn_v100_tpu import __version__  # noqa: F401  (2.8.3 masquerade)
from flash_attn_v100_tpu.ops.flash_attention import flash_attn_func
from flash_attn_v100_tpu.ops.varlen import flash_attn_varlen_func
from flash_attn_v100_tpu.ops.kvcache import flash_attn_with_kvcache

# GPU-suffix aliases kept for drop-in parity
# (reference: flash_attn_v100/flash_attn_interface.py:393-395).
flash_attn_gpu = flash_attn_func
flash_attn_varlen_gpu = flash_attn_varlen_func
flash_attn_with_kvcache_gpu = flash_attn_with_kvcache

__all__ = [
    "flash_attn_func", "flash_attn_gpu",
    "flash_attn_varlen_func", "flash_attn_varlen_gpu",
    "flash_attn_with_kvcache", "flash_attn_with_kvcache_gpu",
]
