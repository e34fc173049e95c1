from vae_mdl_tpu.ops.pallas.dl_kernel import dl_log_prob
from vae_mdl_tpu.ops.pallas.mdl_kernel import mdl_log_prob

__all__ = ["dl_log_prob", "mdl_log_prob"]
