"""flash_attn_v100_tpu — a TPU-native flash-attention engine in JAX/Pallas.

A from-scratch re-design of the capability surface of ai-bond/flash-attention-v100
(a Volta CUDA FlashAttention-2 drop-in for the `flash_attn` package,
see /root/reference) for TPU hardware:

  * fused QK^T -> online-softmax -> PV forward and recompute-based backward as
    Pallas MXU kernels (the reference's WMMA/smem machinery is replaced by
    Mosaic's native tiling),
  * causal / sliding-window / softcap / ALiBi masking, position-keyed Philox
    dropout with forward/backward replay,
  * varlen packing via cu_seqlens, KV-cache decode with fused rotary embedding,
    paged block_table, and real split-KV (the reference stubs `num_splits`),
  * INT8/FP8-quantized KV cache,
  * multi-chip scaling via jax.sharding meshes: head/KV-sharded decode and
    ring-attention context parallelism over ICI.

Public API mirrors flash_attn 2.8.x (reference:
flash_attn_v100/flash_attn_interface.py) with JAX-functional semantics: the
kv-cache update returns new cache arrays instead of mutating in place.
"""

__version__ = "2.8.3"  # capability-parity version masquerade, like the
# reference's dist-info shim (reference: setup.py:114-124).

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
