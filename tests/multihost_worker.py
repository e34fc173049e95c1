"""Worker script for the two-process multi-host test (test_multihost.py).

Each process owns 4 virtual CPU devices (8 global), initialises
jax.distributed against a localhost coordinator, feeds its OWN disjoint data
shard, and runs the standard data-parallel train step over the global mesh.
Prints the per-step losses; the parent asserts both processes agree
(replicated state) and that training proceeds.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8  # global
    assert len(jax.local_devices()) == 4

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from vae_mdl_tpu.config import DataConfig, MeshConfig, TrainConfig
    from vae_mdl_tpu.data.pipeline import setup_data
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.parallel.mesh import make_mesh
    from vae_mdl_tpu.train.state import create_train_state, make_optimizer
    from vae_mdl_tpu.train.steps import make_train_step

    from vae_mdl_tpu.config import DecoderConfig, EncoderConfig, ModelConfig

    tiny = ModelConfig(
        name="tiny", image_shape=(28, 28, 1), n_latent=8, n_samples=2,
        likelihood="bernoulli",
        encoder=EncoderConfig(kind="mlp", n_hidden=32),
        decoder=DecoderConfig(kind="mlp", n_hidden=32),
    )
    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg,
        model=tiny,
        data=DataConfig(dataset="synthetic:mnist", batch_size=16),
        train=TrainConfig(lr_staircase=False),
    )
    mesh = make_mesh(MeshConfig(data=8, sample=1))

    # per-process disjoint shard of the data (the multi-host feeding hook)
    train_iter, _, _ = setup_data(
        "synthetic:mnist",
        batch_size=cfg.data.batch_size // jax.process_count(),
        seed=0,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    model = build_model(cfg.model)
    tx = make_optimizer(cfg.train)
    state = create_train_state(model, cfg.train, jnp.zeros((16, 28, 28, 1)), 2)

    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_train_step(model, cfg, tx, donate=False)

    losses = []
    for i in range(3):
        local = next(train_iter)  # [2, 28, 28, 1] per process
        # assemble the GLOBAL batch from per-process local shards
        global_batch = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), local,
            global_shape=(16,) + local.shape[1:],
        )
        state, metrics = step(state, global_batch)
        losses.append(float(metrics["loss"]))

    print(f"MULTIHOST_OK process={jax.process_index()} "
          f"losses={','.join(f'{l:.4f}' for l in losses)}", flush=True)

    # ---- and the FULL Trainer path: per-process shard feeding, global
    # val loss, collective best/latest checkpoint saves -----------------
    import tempfile

    from vae_mdl_tpu.train.trainer import Trainer

    # checkpoint saves are COLLECTIVE: all processes must use the same dir
    tmp = os.environ["MULTIHOST_CKPT_DIR"]
    cfg2 = dataclasses.replace(
        cfg,
        data=DataConfig(dataset="synthetic:mnist", batch_size=16,
                        val_batch_size=64),
        train=TrainConfig(n_updates=4, eval_interval=2, lr_staircase=False,
                          report_images=False,
                          checkpoint_dir=os.path.join(tmp, "ckpt"),
                          log_dir=os.path.join(tmp, "tb", str(process_id))),
    )
    trainer = Trainer(cfg2, mesh=mesh)
    state = trainer.fit(progress=False)
    print(f"TRAINER_OK process={jax.process_index()} "
          f"step={int(state.step)} best={float(state.best_val_loss):.4f}",
          flush=True)

    # ---- process-sharded test-set eval: batches strided across processes,
    # per-image LLHs allgathered (VERDICT r1 item #8) ---------------------
    from vae_mdl_tpu.evaluation import evaluate_llh

    with jax.default_device(jax.local_devices()[0]):
        mean_llh, per_image, em = evaluate_llh(
            model, cfg, state.params, np.asarray(trainer.test_set[0][:96]),
            n_samples=4, k_chunk=4, batch_size=16, progress=False,
        )
    print(f"EVAL_OK process={jax.process_index()} "
          f"mean={mean_llh:.4f} local_batches={em['local_batches']} "
          f"n={len(per_image)}", flush=True)


if __name__ == "__main__":
    main()
