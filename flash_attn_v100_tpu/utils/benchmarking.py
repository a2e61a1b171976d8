"""Wall-clock measurement utilities.

The reference times with CUDA events, median of 10 (reference:
test.py:87-100).  On this TPU setup dispatch is asynchronous and
`block_until_ready` on an individual result does not reliably fence a single
call (remote-tunnel dispatch), so the robust recipe is *queue-and-delta*:
enqueue M calls back-to-back, fetch the last result, and difference two queue
depths — fixed dispatch overhead cancels.

Validated against the MXU roofline: an 8192^3 bf16 matmul measures
~189 TFLOP/s on v5e (peak ~197)."""

from __future__ import annotations

import time
from typing import Callable

import jax


def _fence(res) -> None:
    """Hard fence: fetch one scalar *derived from* the result to host.  On
    the remote-tunnel backend `block_until_ready` sometimes returns before
    execution; a host fetch of a dependent scalar cannot."""
    leaf = jax.tree_util.tree_leaves(res)[0]
    scalar = leaf[(0,) * leaf.ndim] if leaf.ndim else leaf
    jax.device_get(scalar)


def measure(fn: Callable, *args, iters: int = 32, warmup: int = 2,
            repeats: int = 3, min_window_s: float = 0.1) -> float:
    """Queue-delta timing: seconds per call of jitted `fn`.  Enqueues M calls
    back-to-back and differences two queue depths so fixed dispatch overhead
    cancels.

    Robustness against tunnel stalls (remote dispatch can hiccup for
    milliseconds, which dwarfs a ~1 ms kernel at small iteration counts):
    the iteration count adapts until the measured window is at least
    `min_window_s` of device work, and each depth is sampled `repeats`
    times taking medians."""
    import statistics

    _fence(fn(*args))

    def timed(m):
        t0 = time.perf_counter()
        res = None
        for _ in range(m):
            res = fn(*args)
        _fence(res)
        return time.perf_counter() - t0

    timed(warmup)  # second warmup after compile: steady-state queue
    # adaptive sizing from a rough single-shot estimate
    est = timed(8) / 8
    n = max(iters, int(min_window_s / max(est, 1e-7)))
    n = min(n, 2048)
    t_small = statistics.median(timed(warmup) for _ in range(repeats))
    t_big = statistics.median(timed(warmup + n) for _ in range(repeats))
    return max((t_big - t_small) / n, 1e-9)


def tflops(flops: int, seconds: float) -> float:
    return flops / seconds / 1e12


def gbps(nbytes: int, seconds: float) -> float:
    return nbytes / seconds / 1e9


def attention_flops(B, M, N, Hq, D, causal=False) -> int:
    """Matmul FLOPs of one attention forward (QK^T + PV), the standard
    4*B*H*M*N*D convention; causal halves it."""
    f = 4 * B * Hq * M * N * D
    return f // 2 if causal else f
