from vae_mdl_tpu.ops.math import (
    logmeanexp,
    log_prob_from_logits,
    streaming_logmeanexp_init,
    streaming_logmeanexp_update,
    streaming_logmeanexp_finalize,
)

__all__ = [
    "logmeanexp",
    "log_prob_from_logits",
    "streaming_logmeanexp_init",
    "streaming_logmeanexp_update",
    "streaming_logmeanexp_finalize",
]
