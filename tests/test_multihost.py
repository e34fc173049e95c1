"""Two-process multi-host test: real jax.distributed over localhost.

SURVEY.md §4 item 5: the reference has NO multi-node testing (nothing
distributed exists). Here two coordinated processes (4 virtual CPU devices
each, 8 global) run the data-parallel train step with per-process disjoint
data shards — the actual multi-host code path (DCN-style), not an emulation
within one process.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_training():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"

    import tempfile

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = repo
    env["MULTIHOST_CKPT_DIR"] = tempfile.mkdtemp()

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        # generous: TWO worker processes compile the jitted step while the
        # parent pytest process also holds this host's single core — 240s
        # flaked once under full-suite contention with a cold XLA cache
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"

    lines = [l for out in outs for l in out.splitlines()
             if l.startswith("MULTIHOST_OK")]
    assert len(lines) == 2, f"missing worker output: {outs}"

    # both processes must report IDENTICAL losses (replicated state)
    losses = [l.split("losses=")[1] for l in lines]
    assert losses[0] == losses[1]
    values = [float(v) for v in losses[0].split(",")]
    assert values[-1] < values[0]  # and training improves

    # the full Trainer path (per-process feeding, global val loss,
    # collective checkpoint saves) must agree across processes too
    tlines = [l for out in outs for l in out.splitlines()
              if l.startswith("TRAINER_OK")]
    assert len(tlines) == 2, f"missing Trainer output: {outs}"
    bests = {l.split("best=")[1] for l in tlines}
    assert len(bests) == 1, f"best_val diverged across processes: {tlines}"

    # process-sharded eval: each process computed HALF the batches, and the
    # allgathered mean LLH is identical on both (VERDICT r1 item #8)
    elines = [l for out in outs for l in out.splitlines()
              if l.startswith("EVAL_OK")]
    assert len(elines) == 2, f"missing eval output: {outs}"
    means = {l.split("mean=")[1].split()[0] for l in elines}
    assert len(means) == 1, f"sharded eval mean diverged: {elines}"
    locals_ = [int(l.split("local_batches=")[1].split()[0]) for l in elines]
    assert sorted(locals_) == [3, 3], f"work not split evenly: {elines}"
