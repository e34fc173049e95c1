"""vae_mdl_tpu — a TPU-native JAX framework with the capabilities of nbip/vae-mdl.

The reference (mounted read-only at /root/reference) is a TF2 + TFP research
codebase: a ladder of six IWAE models that swap the observation likelihood
(Bernoulli -> Gaussian -> discretized logistic -> mixture of discretized
logistics) and the latent depth (1 -> 2 stochastic layers), trained on
MNIST/SVHN and evaluated with a 5000-importance-sample log-likelihood.

This framework re-designs that capability surface TPU-first:

- explicit event-axes distributions (no ``axes`` monkey-patching,
  cf. reference models/loss.py:9-23),
- ``vmap``/broadcast over importance samples (no rank-5 reshape tricks,
  cf. reference modules/enc.py:8-27),
- jitted functional train steps with on-device preprocessing,
- data-parallel + importance-sample-parallel execution over a
  ``jax.sharding.Mesh``,
- optional fused Pallas kernels for the discretized-logistic likelihoods.
"""

__version__ = "0.3.0"

from vae_mdl_tpu.distributions import (
    Bernoulli,
    DiscretizedLogistic,
    DistributionTuple,
    Logistic,
    MixtureDiscretizedLogistic,
    Normal,
    PixelMixtureDiscretizedLogistic,
)
from vae_mdl_tpu.ops.math import logmeanexp

__all__ = [
    "Bernoulli",
    "DiscretizedLogistic",
    "DistributionTuple",
    "Logistic",
    "MixtureDiscretizedLogistic",
    "Normal",
    "PixelMixtureDiscretizedLogistic",
    "logmeanexp",
    "__version__",
]


def __getattr__(name):
    """Lazy heavyweight exports: models/trainer/eval without import cost."""
    if name in ("MODELS", "build_model", "experiment", "register_model",
                "compute_loss", "iwae_loss", "elbo_loss"):
        import vae_mdl_tpu.models as m

        return getattr(m, name)
    if name == "Trainer":
        from vae_mdl_tpu.train.trainer import Trainer

        return Trainer
    if name == "evaluate_llh":
        from vae_mdl_tpu.evaluation import evaluate_llh

        return evaluate_llh
    if name in ("make_sampler", "make_reconstructor", "make_encoder_fn"):
        import vae_mdl_tpu.models.inference as inf

        return getattr(inf, name)
    if name in ("export_sampler", "export_reconstructor", "export_encoder",
                "export_callable", "load_exported"):
        import vae_mdl_tpu.models.export as ex

        return getattr(ex, name)
    if name in ("load_reference_weights", "save_reference_weights"):
        import vae_mdl_tpu.utils.import_reference as ir

        return getattr(ir, name)
    raise AttributeError(f"module 'vae_mdl_tpu' has no attribute {name!r}")
