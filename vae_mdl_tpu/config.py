"""Dataclass config system.

The reference has no config system at all: every hyperparameter is a
hardcoded constant inside one of six ~300-line model files, and variants are
expressed by commenting code in/out (SURVEY.md §5). Here the entire ladder is
data: :class:`ExperimentConfig` fully describes architecture, objective, data
and training; ``models/zoo.py`` defines model01..model06 as named configs.

Everything is a frozen dataclass of hashable values, so configs can be
closed over by jitted functions and used as static arguments.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# (features, kernel, stride, transpose, activation)
ConvLayer = Tuple[int, int, int, bool, str]


def conv(features: int, kernel: int, stride: int, activation: str = "relu") -> ConvLayer:
    return (features, kernel, stride, False, activation)


def deconv(features: int, kernel: int, stride: int, activation: str = "relu") -> ConvLayer:
    return (features, kernel, stride, True, activation)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    kind: str = "conv"  # "mlp" | "conv"
    # mlp
    n_hidden: int = 200
    activation: str = "tanh"
    std_transform: str = "exp"
    # conv
    conv_layers: Tuple[ConvLayer, ...] = ()
    n_glu: int = 0
    glu_features: int = 64
    glu_activation: str = "relu"


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    kind: str = "conv"  # "mlp" | "conv"
    # mlp
    n_hidden: int = 200
    activation: str = "tanh"
    # conv
    base_size: Tuple[int, int, int] = (4, 4, 128)
    pre_layers: Tuple[ConvLayer, ...] = ()
    conv_layers: Tuple[ConvLayer, ...] = ()
    n_glu: int = 0
    glu_features: int = 64
    glu_activation: str = "relu"
    fc_activation: str = "relu"
    # emit >= this many likelihood-head channels and slice to the real count
    # (lane-alignment experiment: the MoDL head's n_mix*10 = 50 is
    # tile-hostile on 128-lane hardware; 0 = exact head)
    head_pad: int = 0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "model01"
    image_shape: Tuple[int, int, int] = (28, 28, 1)
    n_latent: int = 100
    n_samples: int = 5  # importance samples k during training
    likelihood: str = "bernoulli"  # bernoulli | gaussian | dl | mdl
    bound_logstd: bool = False  # the reference's commented-out tanh(logstd)
    n_mix: int = 5
    # stochastic depth: 1 = models 01-05; 2 = model06; >2 supported generically
    n_stochastic: int = 1
    # latent sizes per stochastic layer beyond the first (top layers are MLPs)
    mlp_hidden: int = 100
    mlp_activation: str = "gelu"
    latent_sizes: Tuple[int, ...] = ()  # defaults to (n_latent,) * n_stochastic
    encoder: EncoderConfig = EncoderConfig()
    decoder: DecoderConfig = DecoderConfig()
    compute_dtype: str = "float32"  # "bfloat16" for the conv/matmul body
    # fused Pallas likelihood kernels: None = auto (MoDL kernel on TPU —
    # measured faster than XLA fusion in train AND eval, docs/design.md §7 —
    # off elsewhere); True/False force
    use_pallas: Optional[bool] = None
    # quantize the decoder-head -> likelihood boundary tensor (the MoDL
    # parameter tensor that crosses the Pallas custom-call boundary) to
    # this dtype, e.g. "bfloat16". The likelihood MATH still runs float32
    # (kernel and jnp path upcast in-register); only the materialized
    # boundary tensor shrinks, halving its HBM traffic: +9% model05 train
    # throughput measured (docs/design.md §12n). None = float32 boundary
    # (exact reference-parity numerics). mdl likelihood only.
    likelihood_io_dtype: Optional[str] = None
    beta: float = 1.0  # KL weight in the bound (reference always 1.0)
    # "iwae" | "elbo" (reference exports both, models/loss.py:26-70) |
    # "iwae_dreg" — the IWAE bound trained with doubly-reparameterized
    # gradients (Tucker et al. 2019; VAE family only; production extension)
    objective: str = "iwae"
    # >0: per-layer free bits — each stochastic layer's expected KL is
    # floored at this many nats inside the objective (Kingma et al. 2016
    # §C.8; requires objective="elbo"; production extension). Pairs with
    # beta_warmup_steps and the active-units diagnostic.
    free_bits: float = 0.0

    def __post_init__(self):
        # validate likelihood_io_dtype at CONFIG time: the value reaches
        # jnp.astype deep inside the decoder head (nn/decoders.py
        # make_observation), where a typo'd dtype string surfaces as an
        # opaque trace error; and only the mdl boundary tensor is quantized
        # — any other likelihood would silently ignore the setting
        # (ADVICE r4).
        if self.likelihood_io_dtype is not None:
            if self.likelihood_io_dtype not in ("bfloat16", "float32", "float16"):
                raise ValueError(
                    "likelihood_io_dtype must be one of 'bfloat16', "
                    "'float32', 'float16' or None; got "
                    f"{self.likelihood_io_dtype!r}")
            if self.likelihood != "mdl":
                raise ValueError(
                    "likelihood_io_dtype only applies to the 'mdl' "
                    "likelihood (it quantizes the MoDL head->kernel "
                    f"boundary tensor); likelihood={self.likelihood!r} "
                    "would silently ignore it")

    def latents(self) -> Tuple[int, ...]:
        return self.latent_sizes or (self.n_latent,) * self.n_stochastic


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "mnist"  # mnist | svhn_cropped | cifar10 | celeba | synthetic
    data_dir: Optional[str] = None
    batch_size: int = 128  # parity: /root/reference/utils/data.py:20
    val_batch_size: int = 500
    dynamic_binarization: bool = True  # mnist only (model01.py:31-33)
    # random horizontal flip on TRAIN batches, applied on device inside the
    # jitted step (celeba parity: /root/reference/utils/data.py:88)
    augment_flip: bool = False
    # refuse the synthetic fallback: missing dataset files raise instead of
    # silently substituting synthetic data (parity-run guard, docs/parity.md)
    strict: bool = False
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    n_updates: int = 1_000_000
    eval_interval: int = 1000
    learning_rate: float = 1e-3
    # staircase: lr * 10^(-step/(2^7*7000)) at steps 2^i*7000, i<8
    # (parity: /root/reference/models/model01.py:143-149)
    lr_staircase: bool = True
    lr_staircase_base: int = 7000
    lr_staircase_levels: int = 8
    # >0: linear warmup 0 -> lr over this many steps, composed with the
    # base schedule (production extension; the reference has none)
    lr_warmup_steps: int = 0
    # >0: KL annealing — the bound's beta ramps linearly 0 -> model.beta
    # over this many TRAIN steps (standard VAE posterior-collapse remedy,
    # Bowman et al. 2016; not in the reference — production extension).
    # Training only: val/test use the full beta, and the 5000-IS evaluator
    # is a beta=1 log-likelihood bound regardless.
    beta_warmup_steps: int = 0
    # "adamax" is the reference's commented alternative; "adam_keras" is the
    # reference's EXACT Adam formulation (eps=1e-7 on the uncorrected sqrt(v),
    # train/state.keras_adam) — the default optax.adam deviates negligibly
    # (eps=1e-8, bias-corrected denominator; PARITY.md quirks)
    optimizer: str = "adam"
    grad_accum_steps: int = 1  # >1: optax.MultiSteps gradient accumulation
    # >0: clip gradients to this global norm before the update (standard
    # hierarchical-VAE stability practice, e.g. VDVAE's 200; not in the
    # reference — production extension)
    grad_clip_norm: float = 0.0
    # >0: SKIP the whole update — params, optimizer moments, EMA — when the
    # global gradient norm is non-finite or exceeds this threshold (VDVAE's
    # skip rule). state.step still advances, so the data stream and the
    # step-derived rngs keep moving; the OPTIMIZER's own count (which
    # drives the LR schedule and Adam bias correction) rolls back with the
    # rest of the optimizer state, i.e. the schedule position counts
    # APPLIED updates, not attempted ones. Skips are counted in
    # metrics["skipped"] (summed over a steps_per_call window). Applies to
    # the jit, scanned, device-resident, shard_map and ZeRO-1 paths alike.
    grad_skip_threshold: float = 0.0
    # >1: lax.scan that many updates per dispatched program (amortises host
    # overhead for small/fast models); must divide eval_interval & n_updates
    steps_per_call: int = 1
    # keep the whole train split in HBM and gather batches on device —
    # removes host->device transfer entirely for datasets that fit
    # (MNIST train = 47 MB); sampling is i.i.d. with replacement
    device_dataset: bool = False
    seed: int = 0
    checkpoint_dir: str = "./saved_models"
    log_dir: str = "/tmp/tensorboard"
    resume: bool = True  # auto-resume from the latest full-state checkpoint
    # >0: also write an immutable 'step_<N>' snapshot checkpoint at every
    # snapshot_interval steps (must be a multiple of eval_interval), rotated
    # to the newest max_snapshots — post-hoc analysis / rollback points
    # beyond the mutable latest/best pair (production extension)
    snapshot_interval: int = 0
    max_snapshots: int = 3
    # >0: keep an exponential moving average of the params (decay per step);
    # val/test/report then use the EMA weights (standard hierarchical-VAE
    # practice, e.g. VDVAE; not in the reference — production extension)
    ema_decay: float = 0.0
    report_images: bool = True  # log image grids at each eval interval
    n_eval_samples: int = 5000  # importance samples for the final eval


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. ``data`` shards the batch, ``sample`` shards the
    importance-sample axis (the workload's one novel parallel axis,
    SURVEY.md §2.3)."""

    data: int = -1  # -1: all devices on the data axis
    sample: int = 1
    # >1 adds a third "model" axis: wide kernels channel-sharded over it
    # (Megatron-pattern tensor parallelism, parallel/tensor.py)
    model: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()
