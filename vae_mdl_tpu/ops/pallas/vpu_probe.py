"""VPU transcendental-throughput probe (Pallas loop kernels).

The model05 perf story attributes the ~35% MFU plateau to the MoDL
likelihood's transcendental mass (docs/design.md §12c) — but MFU's MXU
denominator under-credits a VPU-bound model. This module supplies the
falsifiable denominator VERDICT r3 item #1 asked for: the chip's RAW
per-op transcendental throughput, measured at the MoDL kernel's own
block geometry (stacked [3n, BP] -> (16, 2048) f32 tiles,
ops/pallas/mdl_kernel.py), so the kernel's step time can be compared
against an arithmetic VPU-bound floor:

    floor_seconds = sum_op  census[op] / measured_rate[op]

with the census from utils.flops.mdl_transcendental_census. Rates are
measured DIFFERENTIALLY — the same kernel at two loop depths, rate =
extra_evals / extra_time — so dispatch + DMA overhead (dominant on
tunnelled hosts) cancels exactly.

Each probe kernel holds one VMEM-resident tile and applies the op in a
loop-carried ``fori_loop`` chain: every iteration is a full tile of
independent lanes, so the VPU's transcendental pipeline stays saturated
while the chain defeats dead-code elimination. Value drift (exp -> inf,
log -> nan) is irrelevant to timing: TPU vector units have no
denormal/NaN assists — every lane retires at the same rate regardless
of value.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# jax.nn-level ops, the same units the analytic census counts in
# (utils.flops.mdl_transcendental_census): primitive decomposition
# (softplus -> exp+log1p, sigmoid -> logistic) cancels between the
# census numerator and these measured denominators.
OPS: Dict[str, Callable] = {
    "exp": jnp.exp,
    "log": jnp.log,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
}

# the MoDL kernel's stacked work block is [3n, BP] = [15, 2048] at the
# reference n_mix=5, which tiles as (16, 2048) f32 sublane tiles — the
# probe measures at exactly that geometry so the floor reflects what the
# kernel can actually reach, not an unrelated peak shape
DEFAULT_BLOCK: Tuple[int, int] = (16, 2048)


def _loop_probe(op: Callable, iters: int, grid: int,
                block: Tuple[int, int]) -> Callable:
    """Jitted ``x [grid*block0, block1] -> same`` applying ``op`` ``iters``
    times per element in a loop-carried chain, one grid step per tile."""

    def kernel(x_ref, o_ref):
        o_ref[:] = jax.lax.fori_loop(
            0, iters, lambda i, v: op(v), x_ref[:])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid * block[0], block[1]),
                                       jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(block, lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(block, lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )
    # scalar output: timing must FETCH a value — on the tunnelled backend
    # ``block_until_ready`` acks the dispatch without waiting for device
    # completion (measured: a 200-matmul chain "completed" in 0.03 ms by
    # block_until_ready but took 28 ms to produce its value), so only a
    # host transfer is a reliable sync point
    return jax.jit(lambda x: call(x)[0, 0])


def _time_call(fn, x, repeats: int) -> float:
    """Median wall-time of ``fn(x_i)`` over ``repeats`` (after one warmup),
    synced by VALUE FETCH and with a distinct input per repeat so neither
    the lying block_until_ready nor any result reuse can short-circuit the
    measurement. Median, not min: tunnelled dispatch jitter is two-sided."""
    float(fn(x))
    ts = []
    for i in range(repeats):
        xi = x + jnp.float32(i) * 1e-6
        float(xi[0, 0])  # materialise the perturbed input outside the clock
        t0 = time.perf_counter()
        float(fn(xi))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_op_rate(name: str, *, block: Tuple[int, int] = DEFAULT_BLOCK,
                    grid: int = 32, iters: Tuple[int, int] = (1000, 21000),
                    repeats: int = 5, op: Optional[Callable] = None) -> float:
    """Measured evals/sec for one op at the probe geometry (differential
    over the two loop depths, dispatch/DMA overhead cancelled).

    Loop depths are deep by default: XLA:TPU lowers the transcendentals to
    a handful of VPU instructions, so rates reach O(1e11-1e12)/s — the
    differential work must be tens of ms to clear the ~2 ms tunnelled
    dispatch jitter (measured: 100/1100-depth probes returned pure noise,
    including negative rates)."""
    op = op if op is not None else OPS[name]
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0.5, 1.5,
                                         (grid * block[0], block[1])),
        jnp.float32,
    )
    lo, hi = iters
    t_lo = _time_call(_loop_probe(op, lo, grid, block), x, repeats)
    t_hi = _time_call(_loop_probe(op, hi, grid, block), x, repeats)
    elems = grid * block[0] * block[1]
    return elems * (hi - lo) / (t_hi - t_lo)


def measure_rates(names: Optional[Iterable[str]] = None,
                  **kw) -> Dict[str, float]:
    """evals/sec per op name (default: every op the census uses)."""
    return {n: measure_op_rate(n, **kw) for n in (names or OPS)}


def vpu_floor_seconds(counts: Dict[str, float],
                      rates: Dict[str, float]) -> float:
    """Arithmetic VPU-bound floor: time to issue ``counts`` transcendental
    evals at the measured per-op rates (ops of different types share the
    special-function pipeline, so times ADD — the additive model is
    validated against the measured fused DL cascade in
    scripts/vpu_roofline.py)."""
    return sum(counts[op] / rates[op] for op in counts)
