"""Parallelism layer: device meshes, sharded attention wrappers, ring /
Ulysses sequence parallelism, multi-host entry points."""

from flash_attn_v100_tpu.parallel.mesh import (
    make_mesh, attention_specs, DATA_AXIS, SEQ_AXIS, MODEL_AXIS)
from flash_attn_v100_tpu.parallel.ring import (
    ring_attention, ring_attention_local, ulysses_attention,
    zigzag_shard, zigzag_unshard)
from flash_attn_v100_tpu.parallel.sharded import (
    flash_attn_func_sharded, flash_attn_with_kvcache_sharded,
    merge_lse_across)
from flash_attn_v100_tpu.parallel.distributed import (
    initialize, make_hybrid_mesh)

__all__ = [
    "make_mesh", "attention_specs", "DATA_AXIS", "SEQ_AXIS", "MODEL_AXIS",
    "ring_attention", "ring_attention_local", "ulysses_attention",
    "zigzag_shard", "zigzag_unshard",
    "flash_attn_func_sharded", "flash_attn_with_kvcache_sharded",
    "merge_lse_across", "initialize", "make_hybrid_mesh",
]
