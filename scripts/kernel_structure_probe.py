"""Step-level structural decomposition of the MoDL kernel's cost.

§12m showed the mixture math (2.9 ms/step: fwd 1.12 + bwd 1.77) runs at
~16% of its transcendental VPU bound — so where do the other ~2.4 ms go?
This probe swaps `mdl_log_prob` for structurally reduced variants with
IDENTICAL grid/layout/IO (same pallas_call scaffolding, same custom_vjp
shape contract) inside the REAL model05 train step — the one harness this
relay times reliably (design.md §12m) — and reads component costs off the
step-time deltas:

  dl_head              : no mixture kernels at all (baseline floor)
  dma                  : kernels that only read/write the tiles
                         (no transpose, no math) -> launch + HBM traffic
  transpose            : dma + the [BP,10n]<->[10n,BP] VMEM transposes
                         (fwd: 1 in; bwd: 1 in + 1 out) -> relayout cost
  full                 : the shipped kernels

Run SOLO on the TPU: python scripts/kernel_structure_probe.py
Results: docs/design.md §12n.
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import vae_mdl_tpu.ops.pallas.mdl_kernel as mk


def make_variant(fwd_body, bwd_body):
    """custom_vjp with the same scaffolding/IO as mdl_log_prob but reduced
    kernel bodies (timing probe only — numerics are meaningless)."""

    def call_fwd(x01, parameters):
        n_mix = parameters.shape[-1] // 10
        x_flat, p_flat, k, p, lead = mk._flatten_operands(x01, parameters)
        bp = mk._block_pixels(p)
        out = pl.pallas_call(
            functools.partial(fwd_body, n_mix=n_mix),
            out_shape=jax.ShapeDtypeStruct((k, p // bp, 1, bp), jnp.float32),
            grid=(k, p // bp),
            in_specs=[
                pl.BlockSpec((bp, x_flat.shape[-1]), lambda ik, ib: (ib, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bp, 10 * n_mix), lambda ik, ib: (ik, ib, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, bp),
                                   lambda ik, ib: (ik, ib, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x_flat, p_flat)
        return out.reshape(lead + (1,))

    @jax.custom_vjp
    def f(x01, parameters):
        return call_fwd(x01, parameters)

    def fwd_rule(x01, parameters):
        return call_fwd(x01, parameters), (x01, parameters)

    def bwd_rule(res, g):
        x01, parameters = res
        n_mix = parameters.shape[-1] // 10
        x_flat, p_flat, k, p, lead = mk._flatten_operands(x01, parameters)
        bp = mk._block_pixels(p)
        g_flat = g.reshape(k, p // bp, 1, bp)
        dp = pl.pallas_call(
            functools.partial(bwd_body, n_mix=n_mix),
            out_shape=jax.ShapeDtypeStruct(p_flat.shape, jnp.float32),
            grid=(k, p // bp),
            in_specs=[
                pl.BlockSpec((bp, x_flat.shape[-1]), lambda ik, ib: (ib, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bp, 10 * n_mix), lambda ik, ib: (ik, ib, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, bp), lambda ik, ib: (ik, ib, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bp, 10 * n_mix),
                                   lambda ik, ib: (ik, ib, 0),
                                   memory_space=pltpu.VMEM),
        )(x_flat, p_flat, g_flat)
        return jnp.zeros_like(x01), dp.reshape(parameters.shape)

    f.defvjp(fwd_rule, bwd_rule)
    return f


# --- reduced kernel bodies ----------------------------------------------------


def fwd_dma(x_ref, p_ref, o_ref, *, n_mix):
    # touch every input element, no transpose: lane-axis reduction
    o_ref[:] = (jnp.sum(p_ref[0], axis=-1)
                + jnp.sum(x_ref[:], axis=-1)).reshape(o_ref.shape)


def bwd_dma(x_ref, p_ref, g_ref, dp_ref, *, n_mix):
    gv = g_ref[0, 0].reshape(-1, 1)            # [bp, 1]
    dp_ref[0] = p_ref[0] * 0.5 + gv            # touch p + g, write full tile


def fwd_tr(x_ref, p_ref, o_ref, *, n_mix):
    pt = p_ref[0].T                            # the [BP,10n]->[10n,BP] relayout
    xt = x_ref[:].T
    o_ref[:] = (jnp.sum(pt, axis=0, keepdims=True)
                + jnp.sum(xt, axis=0, keepdims=True)).reshape(o_ref.shape)


def bwd_tr(x_ref, p_ref, g_ref, dp_ref, *, n_mix):
    pt = p_ref[0].T                            # transpose in
    gv = g_ref[0, 0]                           # [1, bp]
    dpt = pt * 0.5 + gv                        # [10n, bp]
    dp_ref[0] = dpt.T                          # transpose out


def main():
    from bench import setup_scanned_step, time_scanned_step

    if jax.default_backend() != "tpu":
        print("needs the TPU backend"); return

    real = mk.mdl_log_prob
    results = {}

    def measure(label):
        step, state, batch, cfg, _ = setup_scanned_step("model05")
        r = time_scanned_step(step, state, batch, 10, cfg.data.batch_size)
        ms = cfg.data.batch_size / float(np.median(r)) * 1e3
        results[label] = ms
        print(f"{label:10s} {ms:.3f} ms/step "
              f"({float(np.median(r)):.0f} imgs/s)", flush=True)

    try:
        measure("full")
        step, state, batch, cfg, _ = None, None, None, None, None
        import dataclasses

        from vae_mdl_tpu.models.zoo import experiment  # noqa: F401

        mk.mdl_log_prob = make_variant(fwd_dma, bwd_dma)
        measure("dma")
        mk.mdl_log_prob = make_variant(fwd_tr, bwd_tr)
        measure("transpose")
    finally:
        mk.mdl_log_prob = real

    # dl_head baseline from the ablation's measured 2.68-2.77; re-measure
    # here for a same-session delta
    from bench import setup_scanned_step as sss

    step, state, batch, cfg, _ = sss("model05",
                                     model_over={"likelihood": "dl"})
    r = time_scanned_step(step, state, batch, 10, cfg.data.batch_size)
    results["dl_head"] = cfg.data.batch_size / float(np.median(r)) * 1e3
    print(f"{'dl_head':10s} {results['dl_head']:.3f} ms/step", flush=True)

    base = results["dl_head"]
    print(f"\nlaunch+DMA           : {results['dma'] - base:+.3f} ms")
    print(f"transposes           : {results['transpose'] - results['dma']:+.3f} ms")
    print(f"math (cascade+rest)  : {results['full'] - results['transpose']:+.3f} ms")
    print(f"total mixture        : {results['full'] - base:+.3f} ms")


if __name__ == "__main__":
    main()
