from vae_mdl_tpu.evaluation.diagnostics import active_units
from vae_mdl_tpu.evaluation.harness import evaluate_llh, make_batch_evaluator
from vae_mdl_tpu.evaluation.psis import (
    fit_gpd_khat,
    khat_from_log_weights,
    khat_from_top_log_weights,
)

__all__ = [
    "active_units",
    "evaluate_llh",
    "make_batch_evaluator",
    "fit_gpd_khat",
    "khat_from_log_weights",
    "khat_from_top_log_weights",
]
