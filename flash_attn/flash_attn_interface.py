"""`flash_attn.flash_attn_interface` — the import path most integrations use
(reference: flash_attn/flash_attn_interface.py:1-17 re-exports the v100
implementation module under this name)."""

from flash_attn_v100_tpu.ops.flash_attention import flash_attn_func
from flash_attn_v100_tpu.ops.varlen import flash_attn_varlen_func
from flash_attn_v100_tpu.ops.kvcache import flash_attn_with_kvcache

flash_attn_gpu = flash_attn_func
flash_attn_varlen_gpu = flash_attn_varlen_func
flash_attn_with_kvcache_gpu = flash_attn_with_kvcache

__all__ = [
    "flash_attn_func", "flash_attn_gpu",
    "flash_attn_varlen_func", "flash_attn_varlen_gpu",
    "flash_attn_with_kvcache", "flash_attn_with_kvcache_gpu",
]
