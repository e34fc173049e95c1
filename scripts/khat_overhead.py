"""Cost of the eval scan's streaming extras: PSIS k-hat tail + IS curve.

The top-M accumulator (evaluation/psis.py) adds a [M+1+k_chunk, B] top_k
per chunk; the IS-convergence curve adds one O(B) logmeanexp finalize per
chunk. Measures model05's 5000-IS eval imgs/sec without extras, with each,
and with both (bf16 body + Pallas MoDL kernel, the bench configuration).
Run SOLO on the TPU: `python scripts/khat_overhead.py`.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def eval_throughput(with_khat: bool, with_curve: bool = False,
                    batch_size: int = 100,
                    k_chunk: int = 100, n_samples: int = 5000) -> float:
    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.evaluation.harness import make_batch_evaluator
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.state import create_train_state

    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:svhn_cropped"),
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                  use_pallas=True),
    )
    model = build_model(cfg.model)
    x0 = jnp.zeros((16, 32, 32, 3), jnp.float32)
    state = create_train_state(model, cfg.train, x0, cfg.model.n_samples)
    evaluator = make_batch_evaluator(model, cfg, n_samples, k_chunk,
                                     with_khat=with_khat,
                                     with_curve=with_curve)
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (batch_size, 32, 32, 3), dtype=np.uint8))
    out = evaluator(state.params, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = evaluator(state.params, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    return batch_size / (time.perf_counter() - t0)


def main():
    base = eval_throughput(False)
    print(f"eval 5000-IS (no extras): {base:.1f} imgs/s", flush=True)
    k = eval_throughput(True)
    print(f"eval 5000-IS (+khat tail): {k:.1f} imgs/s "
          f"({100 * (k / base - 1):+.1f}%)", flush=True)
    c = eval_throughput(False, with_curve=True)
    print(f"eval 5000-IS (+k-curve): {c:.1f} imgs/s "
          f"({100 * (c / base - 1):+.1f}%)", flush=True)
    b = eval_throughput(True, with_curve=True)
    print(f"eval 5000-IS (+both): {b:.1f} imgs/s "
          f"({100 * (b / base - 1):+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
