from vae_mdl_tpu.evaluation.harness import evaluate_llh, make_batch_evaluator

__all__ = ["evaluate_llh", "make_batch_evaluator"]
