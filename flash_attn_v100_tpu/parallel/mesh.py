"""Device-mesh construction helpers.

The reference has no distributed layer at all (SURVEY §2.4: no
torch.distributed, NCCL stubbed out of existence); scaling is a first-class
component of this framework.  Axis convention used throughout:

  "data"  — batch (data parallel; DCN-friendly, no intra-step collectives)
  "seq"   — KV/context sharding (ring attention / LSE-merge combine; ICI)
  "model" — attention heads (tensor parallel; zero-comm during attention,
            all-reduce at the o-projection boundary)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1,
    seq: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """3D (data, seq, model) mesh.  Sizes must multiply to the device count;
    pass -1 for one axis to absorb the remainder."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [data, seq, model]
    if -1 in sizes:
        i = sizes.index(-1)
        rest = int(np.prod([s for s in sizes if s != -1]))
        assert n % rest == 0, (n, sizes)
        sizes[i] = n // rest
    total = int(np.prod(sizes))
    assert total <= n, f"mesh {sizes} needs more than {n} devices"
    arr = np.asarray(devices[:total]).reshape(sizes)  # sub-mesh is fine
    return Mesh(arr, axis_names=(DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def attention_specs(mesh: Mesh, *, shard_kv_heads: bool, seq_shard_kv: bool = False):
    """PartitionSpecs for (B, M, H, D) attention tensors on the standard mesh.

    GQA co-location (q heads with their kv head on the same chip) when the kv
    head count divides the model axis; otherwise kv is replicated across
    "model" (boom guide §14 pattern)."""
    q_spec = P(DATA_AXIS, None, MODEL_AXIS, None)
    kv_head = MODEL_AXIS if shard_kv_heads else None
    kv_seq = SEQ_AXIS if seq_shard_kv else None
    kv_spec = P(DATA_AXIS, kv_seq, kv_head, None)
    return q_spec, kv_spec
