"""Per-head-dim tile configuration — the TPU analog of the reference's
compile-time `KernelConfig<D>` tile tables (reference: include/forward.h:9-40,
include/backward.h:9-37).

On TPU the constraints are MXU shape (128x128), VMEM budget (~16-128 MB/core
depending on generation; we budget ~4 MB per kernel instance so Mosaic can
double-buffer), and the (sublane, lane) = (8/16, 128) tiling minimums.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile sizes for the attention kernels.

    block_q / block_k: forward tiles.
    block_q_dq / block_k_dq: dQ-centric backward tiles.
    block_q_dkv / block_k_dkv: dKV-centric backward tiles.
    """

    block_q: int = 256
    block_k: int = 512
    block_q_dq: int = 256
    block_k_dq: int = 256
    block_q_dkv: int = 256
    block_k_dkv: int = 256

    @staticmethod
    def for_shape(seqlen_q: int, seqlen_k: int, head_dim: int,
                  base: Optional["BlockSizes"] = None,
                  dropout: bool = False) -> "BlockSizes":
        """Pick tiles for a given problem, analog of the per-D table
        (reference: include/forward.h:9-23): larger D -> smaller tiles to stay
        inside the VMEM budget; tiles never exceed the (padded) sequence.

        `dropout`: the keep-mask hash adds ~11 int-op passes per score
        element; (512, 1024) fwd tiles measured best under that VPU load
        (r5 A/B: causal 35.7 TF/s vs 29.4 at 1024², benchmarks log in
        docs/performance.md) and keep the U=2 pipelined region inside
        VMEM."""
        if base is None and dropout and head_dim <= 128:
            base = BlockSizes(512, 1024, 512, 512, 512, 512)
        if base is None:
            # fwd tiles from v5e sweeps (benchmarks/sweep_dense.py shapes,
            # 4k, flattened-grid kernel): D64 (1024,1024) 43 TF/s causal;
            # D128 (1024,1024) 83 causal / 124 full; D256 (512,512) 85 —
            # bigger q tiles amortize the per-step VPU softmax cost that
            # dominates at small D.
            # bwd tiles: 512-square measured best at D<=128 (45.5 TF/s
            # effective vs 37.7 at 256-square, same 4k shape)
            if head_dim <= 64:
                base = BlockSizes(1024, 1024, 512, 512, 512, 512)
            elif head_dim <= 128:
                base = BlockSizes(1024, 1024, 512, 512, 512, 512)
            else:
                base = BlockSizes(512, 512, 128, 256, 256, 128)

        def clamp(block: int, seq: int) -> int:
            # tiles of at least one sublane group; tiny sequences get one tile
            return min(block, max(round_up(seq, 16), 16))

        return BlockSizes(
            block_q=clamp(base.block_q, seqlen_q),
            block_k=clamp(base.block_k, seqlen_k),
            block_q_dq=clamp(base.block_q_dq, seqlen_q),
            block_k_dq=clamp(base.block_k_dq, seqlen_k),
            block_q_dkv=clamp(base.block_q_dkv, seqlen_q),
            block_k_dkv=clamp(base.block_k_dkv, seqlen_k),
        )


# Lane width of the VPU; running-max/sum scratch is replicated across lanes.
MIN_LANES = 128
