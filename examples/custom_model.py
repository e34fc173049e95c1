"""Define, register and train a brand-new model family in ~40 lines.

The reference has no extension point at all: a variant meant copying a
whole model file and editing hardcoded constants (SURVEY.md §5 "Config /
flag system: None"; e.g. /root/reference/models/model03.py is model02 with
a different likelihood pasted in). Here a new family is ONE frozen config
plus ``register_model`` — after which the full framework surface works
unchanged: ``experiment()``, ``Trainer`` (staircase LR, checkpoints,
auto-resume, EMA, SIGTERM safety), the streaming importance-sampled
evaluator, sampling, the CLI and the mesh parallelism paths.

This example builds a small CIFAR-10 VAE with the per-pixel-mixture
observation model (``pmdl`` — PixelMixtureDiscretizedLogistic: per-pixel
mixture weights instead of the MoDL's per-image ones; no zoo entry uses
it, which also makes this an end-to-end exercise of that head).

Run on CPU (~2 min):

    JAX_PLATFORMS=cpu python examples/custom_model.py

On a TPU host just drop the env var. Without CIFAR-10 files on disk the
data layer falls back to shape-correct synthetic data (pass
``strict=True`` in DataConfig to refuse that).
"""
from __future__ import annotations

import dataclasses

import jax

from vae_mdl_tpu.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ModelConfig,
    TrainConfig,
    conv,
    deconv,
)
from vae_mdl_tpu.evaluation import evaluate_llh
from vae_mdl_tpu.models import experiment, register_model
from vae_mdl_tpu.train.trainer import Trainer

# 1. The new family: every architectural fact is config data. The decoder's
#    last layer emits n_mix*10 channels, so ConvDecoder folds it into the
#    stack as the (always-float32) likelihood head.
N_MIX = 3
TINY_CIFAR_PMDL = ModelConfig(
    name="tiny_cifar_pmdl",
    image_shape=(32, 32, 3),
    n_latent=16,
    likelihood="pmdl",
    n_mix=N_MIX,
    encoder=EncoderConfig(
        kind="conv",
        conv_layers=(conv(16, 3, 2, "gelu"), conv(32, 3, 2, "gelu")),
    ),
    decoder=DecoderConfig(
        kind="conv",
        base_size=(8, 8, 32),
        conv_layers=(deconv(16, 4, 2, "gelu"),
                     deconv(N_MIX * 10, 4, 2, "none")),
    ),
)

# 2. One call makes it a first-class citizen (CLI included:
#    `vae-mdl-tpu train tiny_cifar_pmdl` now works).
register_model(TINY_CIFAR_PMDL, dataset="cifar10", n_updates=300)


def main(workdir: str = "/tmp/tiny_cifar_pmdl", n_updates: int = 120):
    # 3. experiment() assembles the reference-style defaults; dataclasses
    #    .replace tweaks anything per-run. Small numbers so the demo runs
    #    in minutes on CPU.
    cfg = experiment("tiny_cifar_pmdl")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, batch_size=32, val_batch_size=64),
        train=dataclasses.replace(
            cfg.train,
            n_updates=n_updates,
            eval_interval=max(10, n_updates // 2),
            steps_per_call=10,
            checkpoint_dir=f"{workdir}/ckpt",
            log_dir=f"{workdir}/logs",
            resume=False,
            n_eval_samples=20,
        ),
    )

    trainer = Trainer(cfg)
    state = trainer.fit()
    print(f"trained to step {int(state.step)}, "
          f"best val loss {float(state.best_val_loss):.2f}")

    # 4. The streaming 5000-IS harness at demo scale (20 importance samples)
    test_x = trainer.test_set[0][:64]
    mean_llh, _, metrics = evaluate_llh(
        trainer.model, cfg, state.params, test_x,
        n_samples=20, k_chunk=10, batch_size=32, progress=False,
    )
    print(f"20-IS test LLH {mean_llh:.2f} nats  bpd {metrics['bpd']:.4f}")

    # 5. Ancestral samples from the prior, through the serving surface
    from vae_mdl_tpu.models.inference import make_sampler

    sampler = make_sampler(trainer.model, cfg.model)
    imgs = sampler(state.params, jax.random.PRNGKey(0), 4)
    print(f"sampled {imgs.shape} from the prior")
    return state, mean_llh


if __name__ == "__main__":
    main()
