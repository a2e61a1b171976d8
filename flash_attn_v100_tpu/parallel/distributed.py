"""Multi-host entry points: jax.distributed initialization and DCN-aware
hybrid meshes.

The reference is single-GPU (no distributed layer at all — SURVEY §2.4);
multi-host is a first-class target of this framework (BASELINE: >= 0.9
scaling efficiency at 2 hosts).  The recipe:

  * every host process calls `initialize()` (env-driven; a no-op when
    single-process) BEFORE first device use,
  * build the mesh with `make_hybrid_mesh()`: the "data" axis maps to the
    slow inter-host network (DCN) — data parallelism needs no intra-step
    collectives, only the gradient all-reduce — while "seq" and "model"
    stay inside a host's ICI domain where the ring/LSE-merge/TP collectives
    are cheap,
  * everything downstream (ring attention, sharded decode, the engine,
    `sgd_train_step`) is already written against named mesh axes and runs
    unchanged on the hybrid mesh.

Env contract (either the standard cloud TPU env, which
`jax.distributed.initialize()` auto-detects, or the explicit variables):
  FA_COORDINATOR   host:port of process 0           (e.g. "10.0.0.2:1234")
  FA_NUM_PROCESSES total process count
  FA_PROCESS_ID    this process's index
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from flash_attn_v100_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize jax.distributed from args or the FA_* env (see module
    docstring).  Returns True if multi-process mode was initialized, False
    for the single-process no-op.  Safe to call more than once."""
    coordinator_address = coordinator_address or os.environ.get("FA_COORDINATOR")
    if num_processes is None and "FA_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FA_NUM_PROCESSES"])
    if process_id is None and "FA_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FA_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # cloud TPU pods auto-detect; plain single-process runs don't need it
        try:
            if jax.process_count() > 1:
                return True
        except Exception:
            pass
        return False

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    return True


def make_hybrid_mesh(
    data: int = -1,
    seq: int = 1,
    model: int = 1,
    *,
    allow_split_physical_axes: bool = False,
) -> Mesh:
    """(data, seq, model) mesh with "data" on the DCN (inter-host) dimension
    and "seq"/"model" inside each host's ICI domain.

    data = -1 absorbs the process count (the common case: pure data
    parallelism across hosts).  seq * model must divide the per-host device
    count; a host's leftover devices extend the data axis.
    """
    n_procs = jax.process_count()
    n_local = jax.local_device_count()
    if seq * model > n_local:
        raise ValueError(
            f"seq*model = {seq * model} exceeds the per-host device count "
            f"{n_local}; 'seq' and 'model' must stay inside one host's ICI")
    if n_local % (seq * model):
        raise ValueError(f"seq*model = {seq * model} must divide the "
                         f"per-host device count {n_local}")
    data_local = n_local // (seq * model)
    if data == -1:
        data = n_procs * data_local
    if data != n_procs * data_local:
        raise ValueError(
            f"data = {data} must equal processes * per-host remainder "
            f"({n_procs} * {data_local})")

    if n_procs == 1:
        from flash_attn_v100_tpu.parallel.mesh import make_mesh
        return make_mesh(data=data, seq=seq, model=model)

    from jax.experimental import mesh_utils
    # TPU slices carry distinct slice_index values (the DCN granule);
    # CPU/other backends report one slice for every process — group by
    # process there (the multi-process dryrun path)
    slices = {getattr(d, "slice_index", None) for d in jax.devices()}
    granule_is_process = len(slices) < n_procs
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(data_local, seq, model),
        dcn_mesh_shape=(n_procs, 1, 1),
        allow_split_physical_axes=allow_split_physical_axes,
        process_is_granule=granule_is_process,
    )
    return Mesh(devices.reshape(data, seq, model),
                axis_names=(DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
