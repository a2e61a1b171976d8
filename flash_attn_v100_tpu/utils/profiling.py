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
    """Aggregate device-lane events from the trace.json.gz produced by
    `capture_trace`: [(op_name, total_us, count)] sorted by total time.
    Host-side lanes (python, dispatch) are excluded by keeping only events
    from process lanes whose name mentions the device/XLA ops."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # map pid -> process name to find device lanes
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, n in pid_name.items()
                   if "TPU" in n or "/device" in n or "Chip" in n}
    agg = defaultdict(lambda: [0.0, 0])
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        agg[_readable_label(e)][0] += e["dur"]
        agg[_readable_label(e)][1] += 1
    rows = sorted(((n, v[0], v[1]) for n, v in agg.items()),
                  key=lambda r: -r[1])
    return rows[:top] if top else rows


# substrings of HLO/kernel symbols -> human names (this package's kernels)
_KERNEL_NAMES = (
    ("_fwd_kernel", "dense_fwd (pallas)"),
    ("_dq_kernel", "bwd_dq (pallas)"),
    ("_dkv_kernel", "bwd_dkv (pallas)"),
    ("_varlen_fwd_kernel_paged", "varlen_fwd_paged (pallas)"),
    ("_varlen_fwd_kernel", "varlen_fwd (pallas)"),
    ("_varlen_dq_kernel", "varlen_dq (pallas)"),
    ("_varlen_dkv_kernel", "varlen_dkv (pallas)"),
    ("_decode_kernel", "kvcache_decode (pallas)"),
)


def _readable_label(e) -> str:
    """Human label for a trace event: prefer the kernel/op symbol buried in
    the event args (`long_name` / `hlo_op` / `tf_op`), map this package's
    pallas kernel symbols to short names, strip jit hash suffixes."""
    import re
    name = e.get("name", "?")
    args = e.get("args", {}) or {}
    cands = [str(args.get(k, "")) for k in
             ("long_name", "hlo_op", "tf_op", "name", "kernel_name")]
    blob = " ".join([name] + cands)
    for sym, label in _KERNEL_NAMES:
        if sym in blob:
            return label
    # fall back to the event name, de-noised: strip "(12345...)" jit hashes
    # and trailing ".N" op counters
    name = re.sub(r"\(\d{6,}\)", "", name)
    name = re.sub(r"\.\d+$", "", name)
    return name


def profile_ops(fn, *args, iters: int = 3, top: int = 20):
    """One-call convenience: capture + summarize the device ops of jitted
    `fn(*args)`."""
    d = capture_trace(fn, *args, iters=iters)
    return summarize_trace(d, top=top)
