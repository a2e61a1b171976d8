"""Verify ICI collective/compute overlap in the RING attention schedule
(VERDICT r1 #5) by AOT-compiling for a deviceless v5e 2x4 TPU topology and
checking the final HLO: every collective-permute must be split into
(start, done) async pairs with the step's attention custom-call scheduled
between them — i.e., the KV rotation rides the ICI while the MXU works.

Usage: python benchmarks/check_ring_overlap.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from flash_attn_v100_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS, MODEL_AXIS
    from flash_attn_v100_tpu.parallel.ring import ring_attention

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    mesh = Mesh(np.asarray(topo.devices).reshape(1, 8, 1),
                axis_names=(DATA_AXIS, SEQ_AXIS, MODEL_AXIS))

    B, M, H, D = 1, 8192, 4, 128
    sh = NamedSharding(mesh, P(None, SEQ_AXIS, None, None))
    args = [jax.ShapeDtypeStruct((B, M, H, D), jnp.bfloat16, sharding=sh)
            for _ in range(3)]

    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, causal=True))
    import re
    compiled = f.lower(*args).compile()
    hlo = compiled.as_text()
    lines = hlo.splitlines()
    # the ENTRY computation of a compiled TPU module is the final schedule:
    # ops execute in listed order, with start/done async windows
    entry = max(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    seq = []
    for l in lines[entry:]:
        if l.strip() == "}":
            break
        m = re.match(r"\s*%(collective-permute-(start|done))[.\d]* =", l)
        if m:
            seq.append(m.group(2))
        elif " conditional(" in l or "tpu_custom_call" in l:
            # the attention of causal ring steps lives inside `conditional`
            # sub-computations
            seq.append("attn")
    print("schedule:", " ".join(seq))
    n_attn = seq.count("attn")
    # overlapped pattern: starts issued BEFORE an attention whose dones
    # come AFTER it — count attentions with a pending (started, not done)
    # transfer in flight
    overlapped = 0
    pending = 0
    for op in seq:
        if op == "start":
            pending += 1
        elif op == "done":
            pending = max(0, pending - 1)
        elif op == "attn" and pending > 0:
            overlapped += 1
    print(f"attention steps: {n_attn}; with a transfer in flight: "
          f"{overlapped}")
    # every step except the last (nothing left to rotate) must overlap
    ok = n_attn > 0 and overlapped >= n_attn - 1
    print("ring overlap check:", "OK" if ok else "FAILED")

    # ---- quantify: expected exposed-comm fraction per ring step ----
    # The schedule above PROVES each permute is in flight during the step's
    # attention; whether it is fully HIDDEN is bytes/ICI vs compute time.
    # v5e ICI ~45 GB/s per link+direction; the ring rotates K+V one hop per
    # step.  Compute time uses the measured causal kernel rate
    # (docs/performance.md: ~94 TF/s effective on 4k causal).
    ICI_GBS = 45e9
    KERNEL_TFS = 94e12

    def ratio(B, M, Hq, Hk, D, shards):
        m_shard = M // shards
        comm_bytes = 2 * B * m_shard * Hk * D * 2          # K+V chunk, bf16
        # per-step per-chip attention flops (causal halves the average)
        flops = 4 * B * m_shard * m_shard * Hq * D / 2
        t_comm = comm_bytes / ICI_GBS
        t_comp = flops / KERNEL_TFS
        return t_comm / t_comp, t_comm * 1e6, t_comp * 1e6

    r_toy, c_toy, p_toy = ratio(B, M, H, H, D, 8)
    print(f"toy AOT shape: comm {c_toy:.0f} us vs compute {p_toy:.0f} us "
          f"per step -> comm/compute = {r_toy:.2f} (toy: comm-bound, "
          f"expected at B=1 H=4)")
    # realistic long-context shape: llama-70B heads, 32k ctx over a v5e-8
    r, c_us, p_us = ratio(1, 32768, 32, 8, 128, 8)
    print(f"realistic 32k/8-chip llama shape: comm {c_us:.0f} us vs "
          f"compute {p_us:.0f} us per step -> comm/compute = {r:.2f} "
          f"(fully hidden while < 1)")
    ok = ok and r < 1.0
    print("ring overlap quantified:", "OK" if r < 1.0 else "EXPOSED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
