"""XLA:TPU compiler-option sweep for the model05 scanned train step.

The one family of knobs §12's attribution work had not probed: TPU
compiler scheduling/fusion limits. XLA_FLAGS cannot carry them through
the axon relay (the LOCAL parser rejects --xla_tpu_* before anything is
sent), but PJRT per-compile ``compiler_options`` ARE forwarded to and
validated by the remote TPU compiler (a bogus option fails the remote
compile), so each variant is an AOT ``.lower().compile()`` of the same
traced step in one process. Setup shared with bench.py
(setup_scanned_step). Run SOLO on the TPU:
`python scripts/xla_flag_sweep.py`. Results: design.md §12k.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import setup_scanned_step  # noqa: E402

CONFIGS = [
    ("baseline", {}),
    ("vmem=32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem=64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem=96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs-sched", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("no-multi-level-fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
]


def main() -> None:
    import jax

    spc, n_iters = 10, 5
    # donate=False: every variant starts from the same live state0 buffers
    step, state0, batch, cfg, _ = setup_scanned_step(
        "model05", spc=spc, donate=False)
    b = cfg.data.batch_size
    lowered = step.lower(state0, batch)

    base = None
    for label, options in CONFIGS:
        try:
            compiled = lowered.compile(compiler_options=options or None)
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            print(f"{label}: compile FAILED ({type(e).__name__}: "
                  f"{str(e)[:150]})", flush=True)
            continue
        state, m = compiled(state0, batch)
        state, m = compiled(state, batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, m = compiled(state, batch)
        jax.block_until_ready(m["loss"])
        t = n_iters * spc * b / (time.perf_counter() - t0)
        if base is None:
            base = t
            print(f"{label}: {t:.0f} imgs/s", flush=True)
        else:
            print(f"{label}: {t:.0f} imgs/s ({100 * (t / base - 1):+.1f}%)",
                  flush=True)


if __name__ == "__main__":
    main()
