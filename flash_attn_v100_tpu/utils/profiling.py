"""Device-level profiling harness — the TPU analog of the reference's
ncu/SASS probe scripts (reference: utils/sass/mma_swizzle/ncu_fwd.sh).

The reference inspects smem bank conflicts / warp occupancy with ncu; on
TPU the equivalent ground truth is the xplane/trace capture: per-op device
durations straight from the hardware's tracer, free of host/tunnel noise.

    from flash_attn_v100_tpu.utils.profiling import profile_ops
    ops = profile_ops(jitted_fn, *args)     # [(op_name, total_us, calls)]

`benchmarks/profile_kernels.py` captures the standard benches and renders
the per-kernel notes in docs/profiles.md.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict
from typing import List, Tuple

import jax


def capture_trace(fn, *args, iters: int = 3, trace_dir: str | None = None) -> str:
    """Run `fn(*args)` `iters` times under the JAX profiler.  Returns the
    trace directory (contains xplane.pb + trace.json.gz)."""
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="fa_trace_")
    fn(*args)  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        res = None
        for _ in range(iters):
            res = fn(*args)
        leaf = jax.tree_util.tree_leaves(res)[0]
        jax.device_get(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    return trace_dir


def summarize_trace(trace_dir: str, top: int = 0) -> List[Tuple[str, float, int]]:
    """Aggregate per-op device events from the trace.json.gz produced by
    `capture_trace`: [(label, total_us, count)] sorted by total time.

    Only the device's "XLA Ops" lane is counted — the "XLA Modules" lane
    carries whole-program spans that would double-count every op, and host
    lanes carry python/dispatch noise.  Pallas custom-calls are labeled
    `pallas <module> (<file>:<line>)` from the event's source attribution;
    other ops keep their HLO name (jit hashes / op counters stripped) plus
    source when available."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    ops_lanes = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if e.get("args", {}).get("name") == "XLA Ops":
                ops_lanes.add((e["pid"], e["tid"]))
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if ops_lanes and (e.get("pid"), e.get("tid")) not in ops_lanes:
            continue
        lab = _readable_label(e)
        agg[lab][0] += e["dur"]
        agg[lab][1] += 1
    rows = sorted(((n, v[0], v[1]) for n, v in agg.items()),
                  key=lambda r: -r[1])
    return rows[:top] if top else rows


# kernel module file -> subsystem name (for pallas custom-call labels)
_PALLAS_MODULES = {
    "fwd.py": "dense_fwd",
    "bwd.py": "dense_bwd",
    "varlen.py": "varlen",
    "decode.py": "kvcache_decode",
}


def _readable_label(e) -> str:
    """Human label for an XLA-Ops trace event (see summarize_trace)."""
    import re
    name = e.get("name", "?")
    args = e.get("args", {}) or {}
    src = str(args.get("source", ""))
    src_short = ""
    if src:
        base = os.path.basename(src.split(":")[0])
        line = src.split(":")[-1] if ":" in src else ""
        src_short = f"{base}:{line}"
    if "pallas_call" in str(args.get("tf_op", "")):
        mod = _PALLAS_MODULES.get(src_short.split(":")[0], "")
        return f"pallas {mod} ({src_short})" if mod else f"pallas ({src_short})"
    name = re.sub(r"\(\d{6,}\)", "", name)
    name = re.sub(r"\.\d+$", "", name)
    return f"{name} ({src_short})" if src_short else name


def profile_ops(fn, *args, iters: int = 3, top: int = 20):
    """One-call convenience: capture + summarize the device ops of jitted
    `fn(*args)`."""
    d = capture_trace(fn, *args, iters=iters)
    return summarize_trace(d, top=top)
