"""AOT model export for serving: ``jax.export`` / StableHLO artifacts.

The reference has no deployment story — its entire inference surface is
the plotting code inside each model's ``report``
(models/model01.py:228-261), reachable only by reconstructing the Python
model. Here a trained model exports to a **self-contained, versioned
StableHLO artifact**: trained weights are baked in as constants, so a
serving process needs only ``jax`` (no framework import, no config, no
checkpoint plumbing) and can run it on any backend the artifact was
lowered for (TPU and/or CPU) — the TPU-native equivalent of the usual
SavedModel/TorchScript hand-off.

    from vae_mdl_tpu.models.export import export_sampler, load_exported
    blob = export_sampler(model, cfg.model, params, n=64,
                          path="model05_sampler.stablehlo")
    # ... in the serving process (only jax needed):
    sample = load_exported("model05_sampler.stablehlo")
    imgs = sample(jax.random.PRNGKey(0))          # uint8 [64, H, W, C]

CLI: ``vae-mdl-tpu export <model> --what sampler|reconstructor|encoder``.

Cross-platform note: ``jax.export`` lowers for the platforms requested at
export time. The default is the exporting process's backend; pass
``platforms=("tpu", "cpu")`` to produce one artifact servable on both
(e.g. exporting on a CPU host for TPU serving).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_callable(
    fn: Callable,
    example_args: Sequence,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    in_shardings=None,
    out_shardings=None,
) -> bytes:
    """Serialize ``jax.jit(fn)`` at the example arguments' shapes/dtypes.

    ``fn`` must close over everything it needs (weights included) — the
    returned bytes are the whole deployable unit. Writes to ``path`` when
    given; always returns the serialized bytes.

    ``in_shardings`` (optional, same pytree as the args) embeds a
    multi-device serving layout: the artifact then records the device
    count and GSPMD partitioning, and a serving process with the same
    topology runs it sharded (inputs laid out per the recorded shardings,
    collectives compiled in). Single-device serving stays the default.
    """
    specs = tuple(
        jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))
        for a in example_args
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    jit_kwargs = {}
    if in_shardings is not None:
        jit_kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        jit_kwargs["out_shardings"] = out_shardings
    exported = jax_export.export(jax.jit(fn, **jit_kwargs), **kwargs)(*specs)
    blob = bytes(exported.serialize())
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(path_or_bytes) -> Callable:
    """Deserialize an exported artifact into a callable.

    Accepts a filesystem path (str or PathLike) or the raw bytes. The
    callable takes exactly the arguments the export was traced with
    (weights are baked in).
    """
    import os

    blob = path_or_bytes
    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(bytearray(blob))
    return lambda *args: exported.call(*args)


def export_sampler(model, config, params, n: int,
                   path: Optional[str] = None,
                   platforms: Optional[Sequence[str]] = None,
                   mesh=None) -> bytes:
    """Prior sampler with weights baked in: ``f(key) -> uint8 [n,H,W,C]``.

    With ``mesh``, the output (and hence, by GSPMD propagation, the whole
    generation) is sharded n-on-'data' over the mesh."""
    from vae_mdl_tpu.models.inference import make_sampler

    sampler = make_sampler(model, config)

    def fn(key):
        return sampler(params, key, n)

    out_shardings = None
    if mesh is not None:
        from vae_mdl_tpu.parallel.mesh import batch_sharding

        out_shardings = batch_sharding(mesh)
    return export_callable(fn, (jax.random.PRNGKey(0),), path, platforms,
                           out_shardings=out_shardings)


def _batch_shardings(mesh):
    """(replicated key, batch-on-'data' images) — the serving layout for a
    framework mesh (parallel/mesh.py axis names)."""
    if mesh is None:
        return None
    from vae_mdl_tpu.parallel.mesh import batch_sharding, replicated

    return (replicated(mesh), batch_sharding(mesh))


def export_reconstructor(model, config, params, image_shape,
                         path: Optional[str] = None,
                         platforms: Optional[Sequence[str]] = None,
                         mesh=None) -> bytes:
    """Posterior-mean reconstruction: ``f(key, x01[B,H,W,C]) -> float``.

    With ``mesh``, the artifact embeds a batch-sharded (data-parallel)
    serving layout over the mesh's 'data' axis."""
    from vae_mdl_tpu.models.inference import make_reconstructor

    recon = make_reconstructor(model, config)

    def fn(key, x01):
        return recon(params, key, x01)

    x = jnp.zeros(image_shape, jnp.float32)
    return export_callable(fn, (jax.random.PRNGKey(0), x), path, platforms,
                           in_shardings=_batch_shardings(mesh))


def export_encoder(model, config, params, image_shape,
                   path: Optional[str] = None,
                   platforms: Optional[Sequence[str]] = None,
                   mesh=None) -> bytes:
    """Amortized posterior means: ``f(key, x01) -> tuple of latents``.

    With ``mesh``, the batch axis is sharded over the mesh's 'data' axis."""
    from vae_mdl_tpu.models.inference import make_encoder_fn

    encode = make_encoder_fn(model)

    def fn(key, x01):
        return encode(params, key, x01)

    x = jnp.zeros(image_shape, jnp.float32)
    return export_callable(fn, (jax.random.PRNGKey(0), x), path, platforms,
                           in_shardings=_batch_shardings(mesh))
