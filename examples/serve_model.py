"""Train → export → serve, as two decoupled processes in ~30 lines each.

The reference has no deployment path: generating images requires
reconstructing the Python model class and loading a Keras checkpoint
into it (/root/reference/models/model01.py:306-317). Here the trained
model ships as ONE self-contained StableHLO artifact (weights baked in,
docs/design.md §13) and the "server" needs only jax — it never imports
this framework.

Run on CPU (~1 min):

    JAX_PLATFORMS=cpu python examples/serve_model.py

On a TPU host drop the env var; add ``platforms=("tpu", "cpu")`` to the
export call to produce one artifact servable on both backends.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import jax
import jax.numpy as jnp


def trainer_process(artifact: str) -> None:
    """The training side: fit briefly, then export the sampler."""
    import dataclasses

    from vae_mdl_tpu.config import DataConfig
    from vae_mdl_tpu.models.export import export_sampler
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.trainer import Trainer

    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=32),
        train=dataclasses.replace(
            cfg.train, n_updates=50, eval_interval=25,
            checkpoint_dir=os.path.join(os.path.dirname(artifact), "ckpt"),
            log_dir=os.path.join(os.path.dirname(artifact), "tb")),
    )
    trainer = Trainer(cfg)
    state = trainer.fit()
    export_sampler(trainer.model, cfg.model, state.params, n=16,
                   path=artifact)
    print(f"[trainer] exported sampler ({os.path.getsize(artifact)} bytes) "
          f"to {artifact}")


# The serving side, as a literal subprocess script: ONLY jax is imported.
SERVER = """
import sys, jax
from jax import export
with open(sys.argv[1], "rb") as f:
    sampler = export.deserialize(bytearray(f.read()))
imgs = sampler.call(jax.random.PRNGKey(0))
print(f"[server] sampled {imgs.shape} {imgs.dtype} images "
      f"(mean pixel {float(imgs.mean()):.1f})")
"""


def main() -> None:
    with tempfile.TemporaryDirectory() as d:
        artifact = os.path.join(d, "model01_sampler.stablehlo")
        trainer_process(artifact)
        subprocess.run([sys.executable, "-c", SERVER, artifact], check=True,
                       env=os.environ)
        # same artifact, loaded in-process through the library helper
        from vae_mdl_tpu.models.export import load_exported

        imgs = load_exported(artifact)(jax.random.PRNGKey(1))
        assert imgs.shape == (16, 28, 28, 1) and imgs.dtype == jnp.uint8
        print("[main] in-process load_exported agrees:", imgs.shape)


if __name__ == "__main__":
    main()
