"""Multi-PROCESS dryrun: the multi-host code path (jax.distributed +
DCN-aware hybrid mesh) validated with local CPU processes.

Launcher mode (no env): spawns N worker processes of THIS script, each a
jax.distributed participant contributing `--local-devices` virtual CPU
devices, and checks that every worker runs one hybrid-mesh train step.
Worker mode (FA_PROCESS_ID set): initializes distributed, builds the
hybrid mesh (data on the inter-process "DCN" dimension, seq/model on the
local "ICI" devices), and runs one sgd_train_step.

Usage: python benchmarks/dryrun_multiprocess.py [--procs 2] [--local-devices 4]
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    # distributed init MUST run before anything touches the backend
    from flash_attn_v100_tpu.parallel.distributed import initialize, make_hybrid_mesh
    assert initialize(), "expected multi-process initialization"
    assert jax.process_count() > 1, "distributed init did not take effect"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flash_attn_v100_tpu.models.transformer import (
        ModelConfig, init_params, sgd_train_step, param_shardings)
    pid = jax.process_index()
    n_procs = jax.process_count()
    mesh = make_hybrid_mesh(data=-1, seq=2, model=2)

    cfg = ModelConfig.tiny(n_heads=4, n_kv_heads=2, dim=64, head_dim=16,
                           ffn_dim=128, n_layers=2, max_seq_len=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params, param_shardings(params, cfg, mesh))
    data_size = mesh.shape["data"]
    B, S = 2 * data_size, 32 * mesh.shape["seq"] + 1
    tokens = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(
            0, cfg.vocab_size, (B, S)), jnp.int32),
        NamedSharding(mesh, P("data", None)))

    step = jax.jit(lambda p, t: sgd_train_step(p, t, cfg, lr=1e-2, mesh=mesh))
    loss, _ = step(params, tokens)
    loss = float(loss)
    assert np.isfinite(loss), loss
    print(f"[proc {pid}/{n_procs}] hybrid mesh {dict(mesh.shape)} "
          f"loss={loss:.4f} — OK", flush=True)

    # ---- engine phase: cross-host continuous-batching decode parity ----
    # The SAME ServingEngine host loop runs SPMD on every process over the
    # hybrid mesh (pages sharded on "seq" across it, heads on "model");
    # its greedy tokens must match a plain single-process engine exactly.
    from flash_attn_v100_tpu.runtime.engine import ServingEngine
    ecfg = ModelConfig.tiny(n_heads=4, n_kv_heads=2, dim=64, head_dim=16,
                            ffn_dim=128, n_layers=2, max_seq_len=64)
    eparams = init_params(jax.random.PRNGKey(1), ecfg)
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1, 8, 2, 8, 1], [9, 9, 8]]

    ref_eng = ServingEngine(eparams, ecfg, max_batch=2, num_pages=16,
                            page_size=8)
    ref_ids = [ref_eng.submit(p, max_new_tokens=6) for p in prompts]
    ref_out = ref_eng.run_to_completion()

    eparams_g = jax.device_put(eparams, param_shardings(eparams, ecfg, mesh))
    eng = ServingEngine(eparams_g, ecfg, max_batch=2, num_pages=16,
                        page_size=8, mesh=mesh)
    assert eng.multiprocess, "engine must detect the multi-process mesh"
    ids = [eng.submit(p, max_new_tokens=6) for p in prompts]
    out = eng.run_to_completion()
    for r, m in zip(ref_ids, ids):
        assert ref_out[r] == out[m], (ref_out[r], out[m])
    assert all(eng.ttft(i) is not None for i in ids)
    print(f"[proc {pid}/{n_procs}] cross-host engine parity "
          f"({len(prompts)} reqs, greedy tokens identical) — OK", flush=True)


def launch(procs: int, local_devices: int) -> int:
    port = 29533
    children = []
    for pid in range(procs):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(env.get("XLA_FLAGS", "") +
                       f" --xla_force_host_platform_device_count={local_devices}"),
            FA_COORDINATOR=f"localhost:{port}",
            FA_NUM_PROCESSES=str(procs),
            FA_PROCESS_ID=str(pid),
        )
        children.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    rc = 0
    for pid, c in enumerate(children):
        out, _ = c.communicate(timeout=600)
        ok = (c.returncode == 0 and "— OK" in out
              and "engine parity" in out)
        tail = "\n".join(out.strip().splitlines()[-4:])
        print(f"--- proc {pid}: rc={c.returncode} ---\n{tail}")
        if not ok:
            rc = 1
    print("dryrun_multiprocess:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    if "FA_PROCESS_ID" in os.environ:
        worker()
    else:
        ap = argparse.ArgumentParser()
        ap.add_argument("--procs", type=int, default=2)
        ap.add_argument("--local-devices", type=int, default=4)
        a = ap.parse_args()
        sys.exit(launch(a.procs, a.local_devices))
