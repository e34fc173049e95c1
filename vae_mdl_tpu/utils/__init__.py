from vae_mdl_tpu.utils.images import fill_canvas, save_png
from vae_mdl_tpu.utils.logging import MetricLogger

__all__ = ["fill_canvas", "save_png", "MetricLogger"]
