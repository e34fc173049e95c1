from vae_mdl_tpu.evaluation.diagnostics import active_units
from vae_mdl_tpu.evaluation.harness import evaluate_llh, make_batch_evaluator

__all__ = ["active_units", "evaluate_llh", "make_batch_evaluator"]
