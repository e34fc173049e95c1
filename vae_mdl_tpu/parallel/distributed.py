"""Multi-host (multi-process) initialisation.

The reference is single-process forever (SURVEY.md §2.3). Here multi-host is
three lines per process:

    from vae_mdl_tpu.parallel.distributed import init_distributed
    init_distributed()          # no-op on a single host / under test
    mesh = make_mesh(MeshConfig())   # mesh spans all global devices

and the data pipeline feeds each process its shard
(data.pipeline.setup_data(process_index=jax.process_index(), ...), already
wired in train.trainer). Collectives ride ICI within a slice and DCN across
slices — all inserted by GSPMD from the shardings.
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Call ``jax.distributed.initialize`` when a cluster is configured.

    Configuration via args or env (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID); TPU pods auto-detect when none are given. Returns True
    when distributed mode was initialised.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )

    if coordinator_address is None and num_processes is None:
        return False  # single host; nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
