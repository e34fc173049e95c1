"""Training loop: the reference's trainer.py semantics, production-grade.

Parity (/root/reference/trainer.py:6-15): train one batch per update; every
``eval_interval`` updates run one validation batch, save "latest", save
"best" when validation loss improves. Additions the reference lacks
(SURVEY.md §5): full-state checkpoints with auto-resume, imgs/sec and
step-time metrics, optional device mesh (data-parallel batches), TensorBoard
+ JSONL logging, and the three reporting image grids (inputs /
reconstructions / prior samples, models/model01.py:206-261).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_mdl_tpu.config import ExperimentConfig
from vae_mdl_tpu.models.vae import VAE, build_model
from vae_mdl_tpu.train.checkpoint import Checkpointer
from vae_mdl_tpu.train.state import (TrainState, create_train_state,
                                     eval_params, make_optimizer)
from vae_mdl_tpu.train.steps import (
    make_eval_step,
    make_multi_train_step,
    make_train_step,
    preprocess,
)
from vae_mdl_tpu.utils.images import fill_canvas
from vae_mdl_tpu.utils.logging import MetricLogger


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        mesh=None,
        data=None,
        logger: Optional[MetricLogger] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.model: VAE = build_model(cfg.model)

        # GLOBAL batch sizes must divide the data mesh axis (shard axis 0)
        # and the process count (each process feeds its slice; _put
        # assembles the global array from per-process local batches)
        d_axis = mesh.shape["data"] if mesh is not None else 1
        n_proc = jax.process_count()
        if cfg.data.batch_size % max(d_axis, n_proc):
            raise ValueError(
                f"batch_size {cfg.data.batch_size} not divisible by the "
                f"mesh data axis ({d_axis}) / process count ({n_proc})"
            )
        local_bs = cfg.data.batch_size // n_proc
        local_mult = max(1, d_axis // n_proc)
        local_val_bs = max(
            local_mult,
            (cfg.data.val_batch_size // n_proc) // local_mult * local_mult,
        )

        self._splits = None
        self._iter_kw = None  # set iff the trainer owns its data pipeline
        if data is None:
            from vae_mdl_tpu.data.pipeline import (
                iterators_from_splits,
                make_splits,
            )

            self._splits = make_splits(
                cfg.data.dataset, cfg.data.data_dir,
                allow_synthetic_fallback=not cfg.data.strict,
            )
            self._iter_kw = dict(
                batch_size=local_bs,
                val_batch_size=local_val_bs,
                seed=cfg.data.seed,
                process_index=jax.process_index(),
                process_count=n_proc,
                batch_multiple=local_mult,
            )
            data = iterators_from_splits(self._splits, **self._iter_kw)
        self.train_iter, self.val_iter, self.test_set = data

        example = jnp.asarray(next(self.val_iter)).astype(jnp.float32) / 255.0
        self.tx = make_optimizer(cfg.train)
        self.state = create_train_state(
            self.model, cfg.train, example[: cfg.data.batch_size], cfg.model.n_samples
        )

        self.ckpt = Checkpointer(cfg.train.checkpoint_dir, cfg.model.name)
        if cfg.train.resume:
            restored = self.ckpt.restore_latest(self.state)
            if restored is not None:
                self.state = restored
                print(f"[trainer] resumed from step {int(self.state.step)}")

        if mesh is not None:
            if "model" in mesh.axis_names and mesh.shape["model"] > 1:
                # TP layout: wide kernels + their Adam moments channel-sharded
                # over the "model" axis; the SAME jitted step partitions
                from vae_mdl_tpu.parallel.tensor import shard_state_tp

                self.state = shard_state_tp(self.state, mesh)
            else:
                from vae_mdl_tpu.parallel.mesh import shard_state

                self.state = shard_state(mesh, self.state)

        spc = cfg.train.steps_per_call
        if spc > 1 and (cfg.train.eval_interval % spc or
                        cfg.train.n_updates % spc):
            raise ValueError(
                "steps_per_call must divide eval_interval and n_updates"
            )
        if (cfg.train.snapshot_interval
                and cfg.train.snapshot_interval % cfg.train.eval_interval):
            # snapshots piggyback on the eval cadence; an off-cadence
            # interval would silently never fire
            raise ValueError(
                "snapshot_interval must be a multiple of eval_interval"
            )
        if cfg.train.snapshot_interval and cfg.train.max_snapshots < 1:
            raise ValueError(
                "max_snapshots must be >= 1 when snapshots are enabled"
            )
        self._device_data = None
        if cfg.train.device_dataset:
            from vae_mdl_tpu.train.steps import make_device_data_train_step

            if self._splits is None:
                from vae_mdl_tpu.data.pipeline import make_splits

                self._splits = make_splits(
                    cfg.data.dataset, cfg.data.data_dir,
                    allow_synthetic_fallback=not cfg.data.strict,
                )
            # the FULL split (not per-process shards): replicated device_put
            # requires identical values on every process, and the set fits
            # in HBM by assumption
            train_x = self._splits.train[0]
            if mesh is None:
                self._device_data = jax.device_put(train_x)
            else:
                from vae_mdl_tpu.parallel.mesh import replicated

                self._device_data = jax.device_put(train_x, replicated(mesh))
            self.train_step = make_device_data_train_step(
                self.model, cfg, self.tx, n_steps=spc,
                n_data=len(train_x), mesh=mesh,
            )
        elif spc > 1:
            self.train_step = make_multi_train_step(self.model, cfg, self.tx,
                                                    n_steps=spc)
        else:
            self.train_step = make_train_step(self.model, cfg, self.tx)
        self.steps_per_call = spc
        self.eval_step = make_eval_step(self.model, cfg)
        self.logger = logger or MetricLogger(cfg.train.log_dir, cfg.model.name)
        self._report_jit = None
        self._stream = None  # lazily-started async device-prefetch stream
        self._retrace_warned: set = set()

    # ------------------------------------------------------------------ utils

    def _put(self, batch: np.ndarray, stacked: bool = False) -> jax.Array:
        if self.mesh is None:
            return jnp.asarray(batch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        # stacked [spc, B, ...] scan inputs shard the BATCH axis (1),
        # plain batches shard axis 0
        spec = P(None, "data") if stacked else P("data")
        sharding = NamedSharding(self.mesh, spec)
        if jax.process_count() > 1:
            # each process holds ITS slice of the global batch; assemble the
            # global array (device_put's replicated-value contract does not
            # hold for per-process shards)
            axis = 1 if stacked else 0
            gshape = list(batch.shape)
            gshape[axis] *= jax.process_count()
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(batch), tuple(gshape)
            )
        return jax.device_put(batch, sharding)

    def _check_retrace(self):
        """Warn (once per function) if a hot-loop jit has recompiled.

        A silent retrace in the training loop is a classic production
        failure on TPU: an input-signature drift (shape, dtype, weak-type)
        makes every step pay a full XLA compile instead of a device launch,
        and nothing crashes — throughput just silently collapses. The step
        functions take ``(state, batch)`` with fixed shapes, so exactly one
        compiled variant is expected; checked at every eval interval.
        """
        for name, fn in (("train_step", self.train_step),
                         ("eval_step", self.eval_step)):
            cache_size = getattr(fn, "_cache_size", None)  # private jax API
            if cache_size is None:
                continue  # keep checking the other step fns
            n = cache_size()
            if n > 1 and name not in self._retrace_warned:
                self._retrace_warned.add(name)
                print(
                    f"[trainer] WARNING: {name} has {n} compiled variants — "
                    "an input signature (shape/dtype/weak-type) is drifting "
                    "between calls and every retrace stalls training for a "
                    "full XLA compile"
                )

    def _record_config(self) -> None:
        """Run provenance: write the resolved config as ``config.json`` next
        to the checkpoints, so every checkpoint is accompanied by the exact
        settings that produced it (``cli.run train --config`` reproduces the
        run; the reference's settings live only in source-file archaeology,
        SURVEY.md §5). On resume with drifted flags, print a field diff
        first — a silent lr/beta/dtype change mid-run is a classic
        irreproducibility bug — then record the live config (the file
        mirrors what is actually running)."""
        import os

        from vae_mdl_tpu.config_io import diff_configs, load_config, save_config

        if jax.process_index() != 0:
            return
        path = os.path.join(self.ckpt.base, "config.json")
        if os.path.exists(path):
            try:
                recorded = load_config(path)
            except (ValueError, TypeError, OSError) as e:
                print(f"[trainer] WARNING: could not read {path} ({e}); "
                      "rewriting it")
            else:
                drift = diff_configs(recorded, self.cfg)
                if drift:
                    print(f"[trainer] WARNING: live config differs from the "
                          f"recorded {path}:")
                    for line in drift:
                        print(f"  {line}")
        save_config(self.cfg, path)

    # ------------------------------------------------------------------ loop

    def fit(
        self,
        n_updates: Optional[int] = None,
        eval_interval: Optional[int] = None,
        progress: bool = True,
        profile_dir: Optional[str] = None,
        profile_steps: int = 20,
    ) -> TrainState:
        """Train. ``profile_dir`` captures a ``jax.profiler`` trace of
        ``profile_steps`` steps early in the run (the reference has no
        profiling at all, SURVEY.md §5)."""
        cfg = self.cfg
        n_updates = n_updates if n_updates is not None else cfg.train.n_updates
        eval_interval = (
            eval_interval if eval_interval is not None else cfg.train.eval_interval
        )
        # same validation as __init__ — an override that steps_per_call does
        # not divide would silently never hit `i % eval_interval == 0`,
        # disabling every periodic eval/checkpoint
        if self.steps_per_call > 1 and (
            eval_interval % self.steps_per_call
            or n_updates % self.steps_per_call
        ):
            raise ValueError(
                "steps_per_call must divide eval_interval and n_updates"
            )
        if (cfg.train.snapshot_interval
                and cfg.train.snapshot_interval % eval_interval):
            # an eval_interval OVERRIDE must re-satisfy the snapshot
            # cadence too, or snapshots silently thin out / never fire
            raise ValueError(
                "snapshot_interval must be a multiple of eval_interval"
            )
        self._record_config()
        # profile start/stop aligned to loop iteration values (stride = spc)
        profile_at = (
            int(self.state.step) + self.steps_per_call if profile_dir else -1
        )
        spc = self.steps_per_call
        start_step = int(self.state.step)
        steps = range(start_step, n_updates, spc)
        pbar = None
        if progress:
            try:
                from tqdm import tqdm

                # bar counts TRAINING STEPS (each iteration advances spc)
                pbar = tqdm(total=n_updates, initial=start_step)
            except ImportError:
                pass

        if self._stream is None and self._device_data is None:
            from vae_mdl_tpu.data.pipeline import device_prefetch

            src = self.train_iter
            if start_step and self._iter_kw is not None:
                # data-deterministic resume: seek the trainer-owned train
                # stream to the checkpointed step, so the resumed run
                # consumes the exact batch sequence an uninterrupted run
                # would (the step-derived rngs already make everything else
                # deterministic; see tests/test_train.py)
                from vae_mdl_tpu.data.pipeline import iterators_from_splits

                src, _, _ = iterators_from_splits(
                    self._splits, start_step=start_step, **self._iter_kw)
                self.train_iter = src
            if spc > 1:
                # stack spc batches -> one [spc, B, ...] scan input
                def stacked(it=src, n=spc):
                    while True:
                        yield np.stack([next(it) for _ in range(n)])

                src = stacked()
            put = (lambda b: self._put(b, stacked=True)) if spc > 1 else self._put
            self._stream = device_prefetch(src, size=2, put=put)

        # graceful preemption: SIGTERM finishes the in-flight step, then
        # breaks out to the final checkpoint below — zero training-step loss
        # on preemption instead of losing up to eval_interval steps (the
        # reference loses everything since the last manual save,
        # /root/reference/trainer.py:10-15)
        import signal

        stop_requested = {"flag": False}

        def _on_sigterm(signum, frame):
            stop_requested["flag"] = True

        installed = False
        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
            installed = True
        except ValueError:
            pass  # not in the main thread; periodic checkpoints still cover

        try:
            self._fit_loop(
                steps, eval_interval, pbar, profile_dir, profile_steps,
                profile_at, stop_requested,
            )
        finally:
            # restore the handler on EVERY exit path (normal, SIGTERM break,
            # data error, OOM) — a stale handler would silently swallow all
            # later SIGTERMs for the rest of the process. getsignal/signal
            # return None for a handler installed from C; Python cannot
            # restore that, so fall back to SIG_DFL (terminate), never leave
            # the dead-flag handler in place
            if installed:
                signal.signal(
                    signal.SIGTERM,
                    prev_handler if prev_handler is not None
                    else signal.SIG_DFL,
                )
        return self.state

    def _fit_loop(self, steps, eval_interval, pbar, profile_dir,
                  profile_steps, profile_at, stop_requested):
        cfg = self.cfg
        spc = self.steps_per_call
        profiling = False
        window_t0 = time.perf_counter()
        window_imgs = 0
        window_steps = 0
        for i in steps:
            if stop_requested["flag"]:
                print(f"[trainer] SIGTERM — checkpointing at step "
                      f"{int(self.state.step)} and exiting")
                break
            if i == profile_at:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            if self._device_data is not None:
                self.state, metrics = self.train_step(
                    self.state, self._device_data
                )
                window_imgs += spc * cfg.data.batch_size
            else:
                batch = next(self._stream)
                self.state, metrics = self.train_step(self.state, batch)
                window_imgs += batch.shape[0] * (
                    batch.shape[1] if spc > 1 else 1
                )
            window_steps += spc
            if pbar is not None:
                pbar.update(spc)
            if profiling and i >= profile_at + profile_steps:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                print(f"[trainer] wrote profiler trace to {profile_dir}")

            if i % eval_interval == 0:
                # throughput over the window just finished (excludes eval)
                jax.block_until_ready(self.state.params)
                dt = time.perf_counter() - window_t0
                imgs_per_sec = window_imgs / dt if dt > 0 else 0.0

                val_metrics = self.eval_step(self.state, self._put(next(self.val_iter)))
                self._check_retrace()
                val_loss = float(val_metrics["loss"])
                # the most recent train-step metrics: the reference created
                # a train writer and never wrote to it (PARITY.md quirks);
                # here the stability signals (grad_norm, skipped) only
                # exist train-side, so they'd be invisible otherwise
                self.logger.scalars(i, metrics, prefix="Train")
                self.logger.scalars(i, val_metrics, prefix="Evaluation")
                self.logger.scalars(
                    i,
                    {"imgs_per_sec": imgs_per_sec,
                     "step_ms": 1000.0 * dt / max(1, window_steps)},
                    prefix="Perf",
                )
                if cfg.train.report_images:
                    self.report(i)

                # fold the improved best_val_loss into the state BEFORE the
                # 'latest' save: a 'latest' carrying the stale (higher)
                # threshold would, after a hard-kill resume, let a worse
                # model overwrite the 'best' checkpoint
                improved = val_loss < float(self.state.best_val_loss)
                if improved:
                    best = jnp.asarray(val_loss, jnp.float32)
                    if self.mesh is not None:
                        # keep every checkpointed leaf globally replicated
                        # (a host-local scalar cannot be serialised
                        # collectively in multi-process runs)
                        from vae_mdl_tpu.parallel.mesh import replicated

                        best = jax.device_put(best, replicated(self.mesh))
                    self.state = self.state.replace(best_val_loss=best)
                self.ckpt.save(self.state, "latest")
                if improved:
                    self.ckpt.save(self.state, "best")
                snap = cfg.train.snapshot_interval
                if snap and i > 0 and i % snap == 0:
                    # immutable rollback point named by the TRUE step count
                    # (evals run after the step(s) at loop value i)
                    self.ckpt.save(self.state, f"step_{i + spc}")
                    self.ckpt.prune_snapshots(cfg.train.max_snapshots)

                window_t0 = time.perf_counter()
                window_imgs = 0
                window_steps = 0

        if pbar is not None:
            pbar.close()
        if profiling:  # run ended before profile_steps elapsed
            jax.profiler.stop_trace()
            print(f"[trainer] wrote profiler trace to {profile_dir}")

        # final save so auto-resume continues from the true last step (the
        # reference only saves on eval intervals, trainer.py:10-15, losing
        # the tail of the run)
        jax.block_until_ready(self.state.params)
        self.ckpt.save(self.state, "latest")
        self.ckpt.wait()  # join in-flight async saves before returning

    # ------------------------------------------------------------------ report

    def report(self, step: int, n_grid: int = 8):
        """Log the three image grids: inputs, reconstructions (posterior
        mean), prior samples (models/model01.py:206-261)."""
        n = n_grid * n_grid
        # through _put: in multi-process runs a host-local array is NOT a
        # valid replicated jit input (each process would feed different
        # data as the 'same' value); _put assembles the global batch
        x_raw = self._put(np.asarray(next(self.val_iter))[:n])

        if self._report_jit is None:
            cfg = self.cfg
            model = self.model
            top_shape = (
                cfg.model.top_latent_shape()
                if hasattr(cfg.model, "top_latent_shape")
                else (cfg.model.latents()[-1],)
            )

            @jax.jit
            def _report(state, batch):
                rngs = state.next_rngs("rep_sample", "rep_binarize", "rep_prior")
                x = preprocess(cfg, batch, rngs["rep_binarize"])
                params = eval_params(cfg.train, state)
                Qs, Ps, pxz = model.apply(
                    params, x, 1, rngs={"sample": rngs["rep_sample"]}
                )
                recon = _obs_mean(pxz.dist)[0]  # first (only) importance sample
                k_prior, k_gen = jax.random.split(rngs["rep_prior"])
                z_top = jax.random.normal(k_prior, (batch.shape[0],) + top_shape)
                gen = model.apply(
                    params, z_top, rngs={"sample": k_gen}, method="generate"
                )
                # Gaussian obs: show the mean function, not noisy draws
                # (reference parity: models/model02.py:205-221)
                if cfg.model.likelihood == "gaussian":
                    return x, recon, _obs_mean(gen.dist)
                return x, recon, gen.sample

            self._report_jit = _report

        x, recon, samples = self._report_jit(self.state, x_raw)
        self.logger.image(step, "inputs", fill_canvas(np.asarray(x), n_grid))
        self.logger.image(step, "reconstructions",
                          fill_canvas(np.asarray(recon), n_grid))
        self.logger.image(step, "samples", fill_canvas(np.asarray(samples), n_grid))


    # ------------------------------------------------------------------ test

    def test(self, n_samples: Optional[int] = None, ckpt: str = "best",
             **kwargs):
        """Reference ``model.test(n_samples)`` parity
        (/root/reference/models/model01.py:196-204): restore the requested
        checkpoint and run the importance-weighted test evaluation.
        ``n_samples`` defaults to ``cfg.train.n_eval_samples`` (5000).
        Returns (mean_llh, per_image_llh, metrics)."""
        from vae_mdl_tpu.evaluation import evaluate_llh

        n_samples = n_samples or self.cfg.train.n_eval_samples
        state = self.state
        if ckpt and self.ckpt.has(ckpt):
            state = self.ckpt.restore(self.state, ckpt)
        return evaluate_llh(
            self.model, self.cfg, eval_params(self.cfg.train, state),
            self.test_set[0], n_samples=n_samples, mesh=self.mesh, **kwargs,
        )


def _obs_mean(dist):
    """Posterior-mean image for reporting; MoDL's Monte-Carlo mean uses a
    fixed key (reference parity: utils/mdl.py:254-255, 100 samples)."""
    from vae_mdl_tpu.distributions import MixtureDiscretizedLogistic

    if isinstance(dist, MixtureDiscretizedLogistic):
        return dist.mean(jax.random.PRNGKey(0), n=32)
    return dist.mean()


def train(cfg: ExperimentConfig, mesh=None, **fit_kwargs) -> TrainState:
    """Functional entry point (reference trainer.train equivalent)."""
    return Trainer(cfg, mesh=mesh).fit(**fit_kwargs)
