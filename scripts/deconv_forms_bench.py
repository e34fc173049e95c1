"""Compare exact-equivalent polyphase forms of ConvTranspose(4x4, s2, SAME).

Forms (all bit-equivalent to lax.conv_transpose up to reassociation):
  A. lax.conv_transpose (the baseline the decoder used)
  B. pad(1,1) 2x2 conv -> (h+1, w+1, 4F) -> shifted slice-stacks  [current]
  C. SAME 3x3 conv with per-phase statically zero-padded kernels
     -> (h, w, 4F) -> one transpose depth-to-space
Measures fwd and fwd+bwd at the model05 decoder shapes.

Run SOLO: python scripts/deconv_forms_bench.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, args, n=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n):
        eps = jnp.asarray((i + 1) * 1e-7, args[0].dtype)
        out = fn(args[0] + eps, *args[1:])
        acc += float(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / n
    print(f"  {label:36s} {dt*1000:9.2f} ms  (acc {acc:.3f})", flush=True)
    return dt


def form_a(x, w):
    return jax.lax.conv_transpose(
        x, w, strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _w4_phases(w):
    k, _, c_in, f = w.shape
    s = 2
    w4 = w.reshape(2, s, 2, s, c_in, f).transpose(0, 2, 4, 1, 3, 5)
    return w4.reshape(2, 2, c_in, s * s * f)  # [di, dj, C, (r c f)]


def form_b(x, w):
    s, f = 2, w.shape[-1]
    c_in = w.shape[2]
    h, wd = x.shape[1], x.shape[2]
    w4 = _w4_phases(w)
    y = jax.lax.conv_general_dilated(
        x, w4, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(y.shape[0], h + 1, wd + 1, s, s, f)
    rows = jnp.stack([y[:, :h, :, 0], y[:, 1:, :, 1]], axis=2)
    cols = jnp.stack([rows[..., :wd, 0, :], rows[..., 1:, 1, :]], axis=4)
    return cols.reshape(y.shape[0], s * h, s * wd, f)


def _w3_phases(w):
    """3x3 kernel with static zeros: phase r taps [W[0],W[2],0] (r=0) or
    [0,W[1],W[3]] (r=1) over the SAME window (x[i-1], x[i], x[i+1])."""
    k, _, c_in, f = w.shape
    # phase r: window pos 0 -> W[0] (r=0 only); pos 1 -> W[2] (r=0) / W[1]
    # (r=1); pos 2 -> W[3] (r=1 only); same map in columns
    a_of = {0: {0: 0, 1: 2}, 1: {1: 1, 2: 3}}
    cols = []
    for r in (0, 1):
        for c in (0, 1):
            m = jnp.zeros((3, 3, c_in, f), w.dtype)
            for pi, ai in a_of[r].items():
                for pj, aj in a_of[c].items():
                    m = m.at[pi, pj].set(w[ai, aj])
            cols.append(m)
    w3 = jnp.stack(cols, axis=-2)  # [3, 3, C, (r c), F]
    return w3.reshape(3, 3, c_in, 4 * f)


def form_c(x, w3, f):
    s = 2
    h, wd = x.shape[1], x.shape[2]
    y = jax.lax.conv_general_dilated(
        x, w3, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [N, h, w, 4F]
    y = y.reshape(y.shape[0], h, wd, s, s, f)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(y.shape[0], s * h, s * wd, f)


def main():
    rng = np.random.default_rng(0)
    N = 10_000
    shapes = [((4, 4, 128), 128), ((8, 8, 128), 64), ((16, 16, 64), 32)]

    for (h, wdim, c), f in shapes:
        x = jnp.asarray(rng.normal(size=(N, h, wdim, c)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(4, 4, c, f)).astype(np.float32)) * 0.05
        w3 = _w3_phases(w)

        ya = form_a(x[:4], w)
        yb = form_b(x[:4], w)
        yc = form_c(x[:4], w3, f)
        ea = float(jnp.max(jnp.abs(ya - yb)))
        ec = float(jnp.max(jnp.abs(ya - yc)))
        print(f"{h}x{wdim}x{c}->{f}:  equiv B {ea:.2e}  C {ec:.2e}")

        a = jax.jit(form_a)
        b = jax.jit(form_b)
        cf = jax.jit(lambda x, w3=w3, f=f: form_c(x, w3, f))
        ta = bench(a, (x, w), label="A conv_transpose fwd")
        tb = bench(b, (x, w), label="B pad11+slices fwd")
        tc = bench(cf, (x,), label="C k3-static-zeros fwd")

        ga = jax.jit(jax.grad(lambda x, w: jnp.sum(form_a(x, w) ** 2)))
        gb = jax.jit(jax.grad(lambda x, w: jnp.sum(form_b(x, w) ** 2)))
        gc = jax.jit(jax.grad(lambda x: jnp.sum(form_c(x, w3, f) ** 2)))
        bench(ga, (x, w), n=5, label="A fwd+bwd(x)")
        bench(gb, (x, w), n=5, label="B fwd+bwd(x)")
        bench(gc, (x,), n=5, label="C fwd+bwd(x)")
        print(f"  fwd speedups vs A:  B {ta/tb:.2f}x  C {ta/tc:.2f}x")


if __name__ == "__main__":
    main()
