from vae_mdl_tpu.data.pipeline import DataSplits, setup_data
from vae_mdl_tpu.data.preprocess import binarize, dequantize, random_flip
from vae_mdl_tpu.data.sources import load_dataset

__all__ = ["DataSplits", "setup_data", "load_dataset", "dequantize",
           "binarize", "random_flip"]
