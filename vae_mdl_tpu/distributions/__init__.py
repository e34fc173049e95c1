from vae_mdl_tpu.distributions.base import Distribution, DistributionTuple
from vae_mdl_tpu.distributions.continuous import Bernoulli, Logistic, Normal
from vae_mdl_tpu.distributions.discretized import (
    DiscretizedLogistic,
    discretized_logistic_log_prob,
)
from vae_mdl_tpu.distributions.mixture import (
    MixtureDiscretizedLogistic,
    PixelMixtureDiscretizedLogistic,
    autoregressive_locs,
    mixture_log_prob,
    split_mixture_params,
)

__all__ = [
    "Bernoulli",
    "DiscretizedLogistic",
    "Distribution",
    "DistributionTuple",
    "Logistic",
    "MixtureDiscretizedLogistic",
    "Normal",
    "PixelMixtureDiscretizedLogistic",
    "autoregressive_locs",
    "discretized_logistic_log_prob",
    "mixture_log_prob",
    "split_mixture_params",
]
