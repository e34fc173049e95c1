from vae_mdl_tpu.evaluation.harness import evaluate_llh

__all__ = ["evaluate_llh"]
