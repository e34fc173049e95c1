"""Observability tests: metrics logger writes JSONL (+ TensorBoard events
when available) and image grids."""
import json
import os

import numpy as np

from vae_mdl_tpu.utils.images import fill_canvas, save_png, to_uint8
from vae_mdl_tpu.utils.logging import MetricLogger


def test_metric_logger_jsonl_and_images(tmp_path):
    logger = MetricLogger(str(tmp_path), "testrun")
    logger.scalars(5, {"loss": 1.25, "bpd": np.float32(0.5)})
    logger.scalars(10, {"loss": 1.0})
    logger.image(5, "grid", np.zeros((16, 16, 3), np.float32))
    logger.close()

    jsonl = os.path.join(logger.dir, "metrics.jsonl")
    records = [json.loads(l) for l in open(jsonl)]
    assert records[0] == {"step": 5, "prefix": "Evaluation",
                          "loss": 1.25, "bpd": 0.5}
    assert records[1]["loss"] == 1.0

    # TensorBoard event file exists (tensorboardX is in this image)
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(logger.dir))


def test_fill_canvas_and_png(tmp_path):
    imgs = np.random.default_rng(0).random((4, 8, 8, 1)).astype(np.float32)
    canvas = fill_canvas(imgs, 2)
    assert canvas.shape == (16, 16, 1)
    # partial grid: missing cells stay zero
    canvas3 = fill_canvas(imgs[:3], 2)
    assert np.all(canvas3[8:, 8:] == 0)

    path = str(tmp_path / "grid.png")
    save_png(canvas, path)
    assert os.path.getsize(path) > 0

    assert to_uint8(np.array([0.0, 1.0, 2.0])).tolist() == [0, 255, 255]


def test_compilation_cache_helper(tmp_path, monkeypatch):
    from vae_mdl_tpu.utils.cache import enable_compilation_cache

    target = str(tmp_path / "xla")
    path = enable_compilation_cache(target)
    assert path == target and os.path.isdir(target)

    import jax

    assert jax.config.jax_compilation_cache_dir == target


def test_init_distributed_noop_without_config(monkeypatch):
    """Single host, no env/args: must be a no-op returning False."""
    from vae_mdl_tpu.parallel.distributed import init_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() is False
