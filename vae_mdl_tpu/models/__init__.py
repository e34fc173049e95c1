from vae_mdl_tpu.models.losses import (
    elbo_loss,
    hierarchical_iwae_loss,
    iwae_loss,
    two_layer_iwae_loss,
)
from vae_mdl_tpu.models.objective import compute_loss
from vae_mdl_tpu.models.vae import VAE, build_model
from vae_mdl_tpu.models.zoo import (
    MODEL01,
    MODEL02,
    MODEL03,
    MODEL04,
    MODEL05,
    MODEL06,
    MODELS,
    experiment,
    register_model,
)

__all__ = [
    "VAE",
    "build_model",
    "compute_loss",
    "elbo_loss",
    "hierarchical_iwae_loss",
    "iwae_loss",
    "two_layer_iwae_loss",
    "MODEL01",
    "MODEL02",
    "MODEL03",
    "MODEL04",
    "MODEL05",
    "MODEL06",
    "MODELS",
    "experiment",
    "register_model",
]
