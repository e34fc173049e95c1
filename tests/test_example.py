"""The examples/ are product surface: they must keep running.

Drives examples/custom_model.py end-to-end (register_model -> Trainer ->
streaming evaluator -> serving sampler) on synthetic CIFAR shapes — also
the suite's only end-to-end exercise of the ``pmdl`` observation head
(PixelMixtureDiscretizedLogistic; no zoo entry uses it).
"""
import importlib.util
import sys
from pathlib import Path

import numpy as np

EXAMPLE = Path(__file__).parent.parent / "examples" / "custom_model.py"


def _load_example():
    spec = importlib.util.spec_from_file_location("custom_model_example",
                                                  EXAMPLE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_custom_model_example_end_to_end(tmp_path):
    mod = _load_example()

    # registration made it a first-class zoo citizen
    from vae_mdl_tpu.models import MODELS, experiment
    assert "tiny_cifar_pmdl" in MODELS
    cfg = experiment("tiny_cifar_pmdl")
    assert cfg.model.likelihood == "pmdl"
    assert cfg.data.dataset == "cifar10"

    state, mean_llh = mod.main(workdir=str(tmp_path), n_updates=20)
    assert int(state.step) == 20
    assert np.isfinite(mean_llh)
