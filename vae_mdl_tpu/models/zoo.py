"""model01 .. model06 as named configs.

Each entry reproduces one reference model file's architecture exactly
(SURVEY.md §2.1); the table maps config -> reference source:

  model01  MLP IWAE, Bernoulli obs, binarized MNIST   models/model01.py
  model02  conv VAE, Gaussian obs, SVHN               models/model02.py
  model03  conv VAE, DiscretizedLogistic obs, SVHN    models/model03.py
  model04  big conv + GLU stack, DL obs, SVHN         models/model04.py
  model05  conv VAE, MoDL obs (n_mix=5), SVHN         models/model05.py
  model06  two stochastic layers, DL obs, SVHN        models/model06.py

All of them train with Adam(1e-3), k=5 importance samples and the
2^i*7000-staircase LR schedule (model01.py:125-149 — identical in every file).
"""
from __future__ import annotations

from vae_mdl_tpu.config import (
    DataConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
    conv,
    deconv,
)

# conv trunk shared by models 02/03/05 (model02.py:30-47) — relu activations
_ENC_CONV_RELU = (
    conv(32, 3, 1, "relu"),
    conv(64, 3, 2, "relu"),
    conv(128, 3, 2, "relu"),
    conv(256, 3, 2, "relu"),
)
# gelu variant used by model06 (model06.py:102-121)
_ENC_CONV_GELU = (
    conv(32, 3, 1, "gelu"),
    conv(64, 3, 2, "gelu"),
    conv(128, 3, 2, "gelu"),
    conv(256, 3, 2, "gelu"),
)
# mirrored deconv trunk (model02.py:66-80); final layer is the likelihood head
_DEC_DECONV_RELU = (
    deconv(128, 4, 2, "relu"),
    deconv(64, 4, 2, "relu"),
    deconv(32, 4, 2, "relu"),
)
_DEC_DECONV_GELU = (
    deconv(128, 4, 2, "gelu"),
    deconv(64, 4, 2, "gelu"),
    deconv(32, 4, 2, "gelu"),
)


MODEL01 = ModelConfig(
    name="model01",
    image_shape=(28, 28, 1),
    n_latent=100,
    likelihood="bernoulli",
    encoder=EncoderConfig(kind="mlp", n_hidden=200, activation="tanh",
                          std_transform="exp"),
    decoder=DecoderConfig(kind="mlp", n_hidden=200, activation="tanh"),
)

MODEL02 = ModelConfig(
    name="model02",
    image_shape=(32, 32, 3),
    n_latent=20,
    likelihood="gaussian",
    encoder=EncoderConfig(kind="conv", conv_layers=_ENC_CONV_RELU),
    decoder=DecoderConfig(
        kind="conv",
        base_size=(4, 4, 128),
        conv_layers=_DEC_DECONV_RELU + (conv(6, 3, 1, "none"),),
    ),
)

MODEL03 = ModelConfig(
    name="model03",
    image_shape=(32, 32, 3),
    n_latent=20,
    likelihood="dl",
    encoder=EncoderConfig(kind="conv", conv_layers=_ENC_CONV_RELU),
    decoder=DecoderConfig(
        kind="conv",
        base_size=(4, 4, 128),
        conv_layers=_DEC_DECONV_RELU + (conv(6, 3, 1, "none"),),
    ),
)

MODEL04 = ModelConfig(
    name="model04",
    image_shape=(32, 32, 3),
    n_latent=50,
    likelihood="dl",
    encoder=EncoderConfig(
        kind="conv",
        conv_layers=(
            conv(128, 4, 2, "relu"),
            conv(256, 4, 2, "relu"),
            conv(256, 3, 1, "relu"),
        ),
        n_glu=5,
        glu_features=64,
    ),
    decoder=DecoderConfig(
        kind="conv",
        base_size=(8, 8, 63),  # 63-channel base at /4 resolution (model04.py:60-62)
        pre_layers=(conv(256, 3, 1, "relu"),),
        n_glu=5,
        glu_features=64,
        conv_layers=(deconv(128, 4, 2, "relu"), deconv(6, 4, 2, "none")),
    ),
)

MODEL05 = ModelConfig(
    name="model05",
    image_shape=(32, 32, 3),
    n_latent=20,
    likelihood="mdl",
    n_mix=5,
    encoder=EncoderConfig(kind="conv", conv_layers=_ENC_CONV_RELU),
    decoder=DecoderConfig(
        kind="conv",
        base_size=(4, 4, 128),
        conv_layers=_DEC_DECONV_RELU + (conv(50, 3, 1, "none"),),  # n_mix*10
    ),
)

MODEL06 = ModelConfig(
    name="model06",
    image_shape=(32, 32, 3),
    n_latent=20,
    likelihood="dl",
    n_stochastic=2,
    mlp_hidden=100,
    mlp_activation="gelu",
    encoder=EncoderConfig(kind="conv", conv_layers=_ENC_CONV_GELU),
    decoder=DecoderConfig(
        kind="conv",
        base_size=(4, 4, 128),
        fc_activation="gelu",
        conv_layers=_DEC_DECONV_GELU + (conv(6, 3, 1, "none"),),
    ),
)

# demo config on the one REAL offline dataset (sklearn 8x8 digits, 16x16
# upscaled): a small model01-style Bernoulli IWAE
DIGITS = ModelConfig(
    name="digits",
    image_shape=(16, 16, 1),
    n_latent=16,
    likelihood="bernoulli",
    encoder=EncoderConfig(kind="mlp", n_hidden=128, activation="tanh",
                          std_transform="exp"),
    decoder=DecoderConfig(kind="mlp", n_hidden=128, activation="tanh"),
)

from vae_mdl_tpu.models.bidirectional import (  # noqa: E402
    BILADDER_CELEBA,
    BILADDER_SVHN,
)
from vae_mdl_tpu.models.ladder import LADDER_SVHN  # noqa: E402

MODELS = {m.name: m for m in
          (MODEL01, MODEL02, MODEL03, MODEL04, MODEL05, MODEL06, LADDER_SVHN,
           BILADDER_SVHN, BILADDER_CELEBA, DIGITS)}

_DATASETS = {
    "model01": "mnist",
    "model02": "svhn_cropped",
    "model03": "svhn_cropped",
    "model04": "svhn_cropped",
    "model05": "svhn_cropped",
    "model06": "svhn_cropped",
    "ladder_svhn": "svhn_cropped",
    "biladder_svhn": "svhn_cropped",
    "biladder_celeba": "celeba",
    "digits": "digits",
}

# reference run lengths: model01 trains 1.4M updates (model01.py:303),
# the SVHN models 100k (model05.py:249, model06.py:334)
_N_UPDATES = {
    "model01": 1_400_000,
    "model02": 100_000,
    "model03": 100_000,
    "model04": 100_000,
    "model05": 100_000,
    "model06": 100_000,
    "ladder_svhn": 100_000,
    "biladder_svhn": 100_000,
    "biladder_celeba": 200_000,
    "digits": 20_000,
}


def register_model(model, dataset: str = "svhn_cropped",
                   n_updates: int = 100_000) -> None:
    """Register a user-defined model config under ``model.name`` so
    :func:`experiment` and the CLI (``run train/eval/sample <name>``)
    drive it exactly like a zoo entry.

    ``model`` is any config :func:`vae_mdl_tpu.models.vae.build_model`
    accepts — a :class:`ModelConfig`, a ladder config, or a user dataclass
    with a registered builder. The reference has NO extension point:
    adding a variant meant copying a whole model file and editing
    hardcoded constants (SURVEY.md §5 "Config / flag system: None");
    here a new family is one config value. See examples/custom_model.py.
    """
    MODELS[model.name] = model
    _DATASETS[model.name] = dataset
    _N_UPDATES[model.name] = n_updates


def experiment(name: str, **overrides) -> ExperimentConfig:
    """Full experiment config for a named model, reference defaults."""
    model = MODELS[name]
    # model01 validates on the WHOLE 10k MNIST test set as one batch
    # (model01.py:55-63); the other models use 500 (utils/data.py:20)
    val_bs = 10_000 if name == "model01" else 500
    cfg = ExperimentConfig(
        model=model,
        data=DataConfig(
            dataset=_DATASETS[name],
            val_batch_size=val_bs,
            # celeba trains with random horizontal flips (utils/data.py:88)
            augment_flip=_DATASETS[name] == "celeba",
        ),
        train=TrainConfig(n_updates=_N_UPDATES[name]),
    )
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return cfg
