"""Debug instrumentation: NaN/Inf scans, interpret-mode stage reports, and a
profiler-trace helper.

TPU re-design of the reference's compile-gated kernel instrumentation
(`include/debug.h`: `__CHECK_ERRORS` stage-aware NaN scans, `__PRINT_MATRIX`
tile dumps) and of its ncu profiling scripts
(`utils/sass/mma_swizzle/ncu_fwd.sh`).  Interpret mode makes the smem-
corruption class of bug unrepresentable, so what remains useful is: find the
first non-finite value, scan every stage of a call, and capture an xprof
trace.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def find_nonfinite(x: Any, name: str = "array") -> Optional[Dict[str, Any]]:
    """First non-finite entry of `x` (index, value, counts), or None.

    Analog of the reference's per-stage `__CHECK_ERRORS` scan
    (include/debug.h:153-191), run host-side.
    """
    a = np.asarray(jax.device_get(x), dtype=np.float32)
    bad = ~np.isfinite(a)
    if not bad.any():
        return None
    idx = tuple(int(i) for i in np.argwhere(bad)[0])
    return dict(name=name, index=idx, value=float(a[idx]),
                num_nan=int(np.isnan(a).sum()),
                num_inf=int(np.isinf(a).sum()), shape=a.shape)


def assert_finite(x: Any, name: str = "array") -> None:
    info = find_nonfinite(x, name)
    assert info is None, f"non-finite in {info['name']}: {info}"


def stage_report(fn: Callable, args: Sequence[Any],
                 kwargs: Optional[Dict[str, Any]] = None, *,
                 grad_argnums: Optional[Tuple[int, ...]] = None,
                 verbose: bool = True) -> Dict[str, Any]:
    """Run `fn(*args, **kwargs, interpret=True)` and scan every output leaf —
    and, if `grad_argnums` is given, every gradient leaf — for non-finites.

    Returns {stage_name: scan_result_or_None}.  The stage list is the TPU
    analog of the reference's debug stages table (utils/docs/debug.md:14-32).
    """
    kwargs = dict(kwargs or {})
    kwargs.setdefault("interpret", True)
    report: Dict[str, Any] = {}

    out = fn(*args, **kwargs)
    leaves = jax.tree_util.tree_leaves_with_path(out)
    for path, leaf in leaves:
        key = "out" + jax.tree_util.keystr(path)
        report[key] = find_nonfinite(leaf, key)

    if grad_argnums:
        def scalar(*a):
            o = fn(*a, **kwargs)
            first = jax.tree_util.tree_leaves(o)[0]
            return first.astype(jnp.float32).sum()

        grads = jax.grad(scalar, argnums=grad_argnums)(*args)
        for gi, g in zip(grad_argnums, grads):
            key = f"grad[arg{gi}]"
            report[key] = find_nonfinite(g, key)

    if verbose:
        for k, v in report.items():
            print(f"  {k}: {'OK' if v is None else v}")
    return report


@contextlib.contextmanager
def trace(logdir: str = "/tmp/fa_tpu_trace"):
    """Capture a jax.profiler trace (view with xprof / TensorBoard) — the ncu
    analog (reference: utils/sass/mma_swizzle/ncu_fwd.sh:1-14)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def compiled_hlo(fn: Callable, *args, **kwargs) -> str:
    """Final optimized HLO of jit(fn) on the given args — the SASS-dump analog
    (reference: run.sh:38-89 extracts marker-delimited PTX/SASS)."""
    return jax.jit(lambda *a: fn(*a, **kwargs)).lower(*args).compile().as_text()
