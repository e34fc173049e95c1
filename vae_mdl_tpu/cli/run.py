"""CLI entry point.

The reference has NO flag system: entry is six per-model ``__main__`` blocks
run as ``CUDA_VISIBLE_DEVICES=1 nohup python -m models.model01 ...``
(/root/reference/models/model01.py:283-330) with every hyperparameter
hardcoded, and a broken ``train_model.py`` (imports a gitignored module,
train_model.py:1). Here:

    python -m vae_mdl_tpu.cli.run train model01 [--n-updates N] [--dataset D]
    python -m vae_mdl_tpu.cli.run eval  model01 [--n-samples 5000] [--ckpt best]
    python -m vae_mdl_tpu.cli.run sample model05 [--n 64]
    python -m vae_mdl_tpu.cli.run export model05 [--what sampler] [--platforms tpu,cpu]
    python -m vae_mdl_tpu.cli.run list

``train`` runs the reference protocol end-to-end: train with eval-interval
checkpointing, then reload "best", run the 5000-IS test evaluation, and dump
the input/reconstruction/sample PNG grids to ./assets/ (parity with
models/model01.py:305-330).

Provenance: every ``train`` records the resolved experiment as
``<checkpoint_dir>/<model>/config.json`` (config_io.py); any command takes
``--config FILE`` to rebuild the exact experiment from such a file (flag
overrides still apply), and ``describe --json`` emits the machine-readable
model card.
"""
from __future__ import annotations

import argparse
import dataclasses
import math
import os
from typing import Optional


def _json_finite(obj):
    """Recursively map non-finite floats (NaN/±inf) to None so json.dump
    emits strict RFC 8259 JSON (`null`), not Python's bare `NaN` token."""
    if isinstance(obj, float):
        return obj if math.isfinite(obj) else None
    if isinstance(obj, dict):
        return {k: _json_finite(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_finite(v) for v in obj]
    return obj


def _replace_model_field(model_cfg, field: str, value, flag: str):
    """dataclasses.replace that names the flag and config family instead of
    surfacing a raw TypeError when the field does not exist — the model-
    config families differ (LadderConfig/BiLadderConfig carry no
    objective/free_bits; the curated refusal in training_loss_fn would
    otherwise be unreachable from the CLI)."""
    if field not in {f.name for f in dataclasses.fields(model_cfg)}:
        raise SystemExit(
            f"{flag} is not supported by the {type(model_cfg).__name__} "
            f"family ({getattr(model_cfg, 'name', '?')}): it has no "
            f"{field!r} knob")
    return dataclasses.replace(model_cfg, **{field: value})


def _apply_overrides(cfg, args):
    model = cfg.model
    data = cfg.data
    train = cfg.train
    if args.n_updates is not None:
        train = dataclasses.replace(train, n_updates=args.n_updates)
    if args.eval_interval is not None:
        train = dataclasses.replace(train, eval_interval=args.eval_interval)
    if args.dataset is not None:
        data = dataclasses.replace(data, dataset=args.dataset)
    if args.data_dir is not None:
        data = dataclasses.replace(data, data_dir=args.data_dir)
    if args.batch_size is not None:
        data = dataclasses.replace(data, batch_size=args.batch_size)
    if args.checkpoint_dir is not None:
        train = dataclasses.replace(train, checkpoint_dir=args.checkpoint_dir)
    if args.log_dir is not None:
        train = dataclasses.replace(train, log_dir=args.log_dir)
    if args.bf16:
        model = dataclasses.replace(model, compute_dtype="bfloat16")
    if args.pallas is not None:
        model = dataclasses.replace(model, use_pallas=args.pallas)
    if getattr(args, "likelihood_io_dtype", None):
        model = _replace_model_field(model, "likelihood_io_dtype",
                                     args.likelihood_io_dtype,
                                     "--likelihood-io-dtype")
    if args.no_resume:
        train = dataclasses.replace(train, resume=False)
    if getattr(args, "steps_per_call", None):
        train = dataclasses.replace(train, steps_per_call=args.steps_per_call)
    if getattr(args, "device_dataset", False):
        train = dataclasses.replace(train, device_dataset=True)
    if getattr(args, "strict_data", False):
        data = dataclasses.replace(data, strict=True)
    if getattr(args, "ema", None) is not None:
        train = dataclasses.replace(train, ema_decay=args.ema)
    if getattr(args, "bound_logstd", False):
        model = dataclasses.replace(model, bound_logstd=True)
    if getattr(args, "grad_clip", None) is not None:
        train = dataclasses.replace(train, grad_clip_norm=args.grad_clip)
    if getattr(args, "grad_skip", None) is not None:
        train = dataclasses.replace(train, grad_skip_threshold=args.grad_skip)
    if getattr(args, "beta_warmup", None) is not None:
        train = dataclasses.replace(train, beta_warmup_steps=args.beta_warmup)
    if getattr(args, "objective", None):
        model = _replace_model_field(model, "objective", args.objective,
                                     "--objective")
    if getattr(args, "free_bits", None) is not None:
        model = _replace_model_field(model, "free_bits", args.free_bits,
                                     "--free-bits")
    if getattr(args, "snapshot_interval", None) is not None:
        train = dataclasses.replace(
            train, snapshot_interval=args.snapshot_interval)
    if getattr(args, "max_snapshots", None) is not None:
        train = dataclasses.replace(train, max_snapshots=args.max_snapshots)
    return dataclasses.replace(cfg, model=model, data=data, train=train)


def _base_config(args):
    """Base ExperimentConfig: ``--config FILE`` wins (a recorded run's
    ``config.json`` or a hand-written experiment file, config_io.py);
    otherwise the zoo entry named by the positional. With both, the
    positional must match the file's model name — evaluating checkpoint A
    under config B is exactly the mistake provenance exists to prevent."""
    from vae_mdl_tpu.models.zoo import experiment

    if getattr(args, "config", None):
        from vae_mdl_tpu.config_io import load_config

        try:
            cfg = load_config(args.config)
        except (OSError, ValueError) as e:
            raise SystemExit(f"--config {args.config}: {e}")
        if args.model and args.model != cfg.model.name:
            raise SystemExit(
                f"--config {args.config} describes model "
                f"{cfg.model.name!r} but the command names {args.model!r}")
        return cfg
    if not args.model:
        raise SystemExit("a model name or --config FILE is required")
    return experiment(args.model)


def _parse_mesh_spec(mesh_spec: str) -> tuple:
    """``"D"``, ``"DxS"`` or ``"DxSxM"`` -> ``(data, sample, model)``.
    Empty components default to 1 ("4x" == 4x1); anything else is a
    SystemExit with the expected grammar. Shared by every command that
    accepts --mesh so the describe preview validates exactly what
    train/eval/export would accept."""
    parts = mesh_spec.split("x")
    if not 1 <= len(parts) <= 3:
        raise SystemExit(
            f"--mesh {mesh_spec!r}: expected D, DxS or DxSxM (e.g. 4, 4x2, "
            "2x2x2)")
    try:
        vals = [int(p) if p else 1 for p in parts]
    except ValueError:
        raise SystemExit(
            f"--mesh {mesh_spec!r}: components must be integers (or 'none')")
    if any(v < 1 for v in vals):
        raise SystemExit(
            f"--mesh {mesh_spec!r}: components must be >= 1")
    vals += [1] * (3 - len(vals))
    return tuple(vals)


def _make_mesh_or_none(mesh_spec: Optional[str], mesh_cfg=None):
    """Mesh from --mesh, or from the experiment's MeshConfig when absent."""
    import jax

    from vae_mdl_tpu.config import MeshConfig
    from vae_mdl_tpu.parallel.mesh import make_mesh

    if mesh_spec is None:
        if len(jax.devices()) == 1:
            return None
        return make_mesh(mesh_cfg or MeshConfig())
    if mesh_spec == "none":
        return None
    data, sample, model = _parse_mesh_spec(mesh_spec)
    return make_mesh(MeshConfig(data=data, sample=sample, model=model))


def cmd_train(args) -> None:
    from vae_mdl_tpu.parallel.distributed import init_distributed
    from vae_mdl_tpu.train.trainer import Trainer

    init_distributed()
    cfg = _apply_overrides(_base_config(args), args)
    mesh = _make_mesh_or_none(args.mesh, cfg.mesh)
    trainer = Trainer(cfg, mesh=mesh)

    if args.from_reference:
        if int(trainer.state.step) != 0:
            raise SystemExit(
                "--from-reference warm-starts a FRESH run, but a resumable "
                "checkpoint exists; pass --no-resume or a new "
                "--checkpoint-dir")
        _import_reference(trainer, cfg, args.from_reference, "train")
    elif cfg.model.name == "model01":
        _maybe_bias_init(trainer, cfg)

    state = trainer.fit(profile_dir=args.profile)
    print(f"[train] finished at step {int(state.step)}, "
          f"best val loss {float(state.best_val_loss):.4f}")
    khat = getattr(args, "khat", False)
    k_curve = getattr(args, "k_curve", False)

    # reload "best" BEFORE the asset grids, like the final eval — reference
    # parity (models/model01.py:306-317: model.load("best") precedes
    # _plot_samples). Dumping from the final state can even render NaN
    # garbage when a run diverged after its best checkpoint (seen with
    # model04's unbounded logstd, docs/protocols.md).
    if trainer.ckpt.has("best"):
        trainer.state = trainer.ckpt.restore(trainer.state, "best")
    _dump_assets(trainer, cfg)
    if not args.skip_final_eval:
        _final_eval(trainer, cfg,
                    args.n_samples or cfg.train.n_eval_samples, mesh,
                    khat=khat, k_curve=k_curve)


def _import_reference(trainer, cfg, prefix: str, what: str) -> None:
    """Load a reference (nbip/vae-mdl Keras ``save_weights``) checkpoint into
    the live state — the migration path: train there, eval/sample/fine-tune
    here. Leaves keep the template's sharding (mesh runs)."""
    import jax
    import jax.numpy as jnp

    from vae_mdl_tpu.utils.import_reference import load_reference_weights

    new = load_reference_weights(prefix, cfg.model.name, trainer.state.params)

    def put(n, old):
        n = jnp.asarray(n, old.dtype) if hasattr(old, "dtype") else n
        sh = getattr(old, "sharding", None)
        return jax.device_put(n, sh) if sh is not None else n

    params = jax.tree.map(put, new, trainer.state.params)
    state = trainer.state.replace(params=params)
    if state.ema_params is not None:
        # seed the EMA at the imported point, as a fresh EMA run would
        state = state.replace(ema_params=params)
    trainer.state = state
    print(f"[{what}] imported reference weights from {prefix!r} "
          f"({cfg.model.name})")


def _maybe_bias_init(trainer, cfg) -> None:
    """model01's decoder-bias init from the train-mean image
    (/root/reference/models/model01.py:294-301) — only when starting fresh."""
    import jax.numpy as jnp
    import numpy as np

    from vae_mdl_tpu.train.state import init_output_bias

    if int(trainer.state.step) != 0:
        return
    batches = [next(trainer.train_iter) for _ in range(8)]
    mean_img = np.concatenate(batches).astype(np.float32).mean(0) / 255.0
    trainer.state = init_output_bias(trainer.state, jnp.asarray(mean_img))
    print("[train] decoder output bias initialised to train-mean logits")


def _print_khat(metrics, n_samples: int, n_images: int) -> None:
    """The PSIS k-hat readout (shared by eval and train's final eval)."""
    frac = metrics["khat_frac_gt_07"]
    kmax = metrics["khat_max"]
    n_under = metrics["khat_n_underflow"]
    n_ties = metrics["khat_n_ties"]
    if kmax < 0.5:
        verdict = "RELIABLE (k < 0.5: CLT-rate convergence)"
    elif kmax <= 0.7:
        verdict = ("MARGINAL (0.5 <= k <= 0.7: usable but "
                   "slower-than-CLT convergence)")
    else:
        verdict = (f"{frac:.1%} of images have k-hat > 0.7 — their "
                   f"bound is unreliable at k={n_samples}; raise "
                   "--n-samples")
    mean = metrics["khat_mean"]
    mean_str = (f"{mean:.3f}" if math.isfinite(mean)
                else "n/a (no fittable tails)")
    print(f"[eval] PSIS k-hat (Vehtari et al. 2024): "
          f"mean {mean_str}, max {kmax:.3f} -> {verdict}")
    if n_under or n_ties:
        print(f"[eval]   degenerate tails: {n_under} underflow-heavy "
              f"(treated as unreliable), {n_ties} all-tied "
              f"(perfect-proposal) of {n_images} images")


def _print_k_curve(metrics) -> None:
    ks = metrics["k_curve_ks"]
    vals = metrics["k_curve_llh"]
    # log-spaced rows + the final one; the whole curve is in metrics
    shown = sorted({len(ks) - 1} | {
        int(round(len(ks) ** (p / 6))) - 1 for p in range(7)})
    print("[eval] IS convergence (test-mean bound vs k, one stream):")
    for j in shown:
        tail = "  (final)" if j == len(ks) - 1 else (
            f"  ({vals[-1] - vals[j]:+.3f} to final)")
        print(f"         k={int(ks[j]):>6d}  {vals[j]:.3f}{tail}")


def _final_eval(trainer, cfg, n_samples, mesh,
                khat: bool = False, k_curve: bool = False) -> None:
    from vae_mdl_tpu.evaluation import evaluate_llh

    # cmd_train already reloaded "best" into trainer.state before the asset
    # dump — no second Orbax read here (round-3 review fix)
    state = trainer.state
    from vae_mdl_tpu.train.state import eval_params

    mean_llh, _, metrics = evaluate_llh(
        trainer.model, cfg, eval_params(cfg.train, state), trainer.test_set[0],
        n_samples=n_samples, mesh=mesh, khat=khat, k_curve=k_curve,
    )
    print(f"[eval] {n_samples}-IS test LLH: {mean_llh:.2f} nats, "
          f"bpd: {metrics['bpd']:.4f}")
    if khat:
        _print_khat(metrics, n_samples, len(trainer.test_set[0]))
    if k_curve:
        _print_k_curve(metrics)


def _dump_assets(trainer, cfg, out_dir: str = "./assets") -> None:
    """Final PNG grids (parity: models/model01.py:315-330)."""
    import numpy as np

    from vae_mdl_tpu.utils.images import fill_canvas, save_png

    os.makedirs(out_dir, exist_ok=True)
    import jax.numpy as jnp

    x_raw = trainer._put(np.asarray(next(trainer.val_iter))[:64])
    if trainer._report_jit is None:
        trainer.report(int(trainer.state.step))  # builds the jit
    x, recon, samples = trainer._report_jit(trainer.state, x_raw)
    name = cfg.model.name
    save_png(fill_canvas(np.asarray(x)), f"{out_dir}/{name}_inputs.png")
    save_png(fill_canvas(np.asarray(recon)), f"{out_dir}/{name}_recon.png")
    save_png(fill_canvas(np.asarray(samples)), f"{out_dir}/{name}_samples.png")
    print(f"[assets] wrote {out_dir}/{name}_{{inputs,recon,samples}}.png")


def cmd_eval(args) -> None:
    from vae_mdl_tpu.parallel.distributed import init_distributed
    from vae_mdl_tpu.train.trainer import Trainer

    # multi-host: without this, every host would redundantly evaluate the
    # full test set (process_count stays 1) against a local-only mesh
    init_distributed()
    cfg = _no_resume(_apply_overrides(_base_config(args), args))
    mesh = _make_mesh_or_none(args.mesh, cfg.mesh)
    trainer = Trainer(cfg, mesh=mesh)
    _restore_weights(trainer, cfg, args, "eval")

    from vae_mdl_tpu.evaluation import evaluate_llh

    n_samples = args.n_samples or cfg.train.n_eval_samples
    from vae_mdl_tpu.train.state import eval_params

    mean_llh, _, metrics = evaluate_llh(
        trainer.model, cfg, eval_params(cfg.train, trainer.state),
        trainer.test_set[0], n_samples=n_samples, mesh=mesh,
        khat=args.khat, k_curve=args.k_curve,
    )
    print(f"[eval] {n_samples}-IS test LLH: {mean_llh:.2f} nats, "
          f"bpd: {metrics['bpd']:.4f}")
    if args.khat:
        _print_khat(metrics, n_samples, len(trainer.test_set[0]))
    if args.k_curve:
        _print_k_curve(metrics)

    if args.active_units:
        from vae_mdl_tpu.evaluation import active_units

        test = trainer.test_set[0]
        au = active_units(
            trainer.model, cfg, eval_params(cfg.train, trainer.state),
            test, batch_size=min(500, len(test)),
        )
        layers = ", ".join(
            f"z{li + 1}: {a}/{d}"
            for li, (a, d) in enumerate(zip(au["au"], au["n_dims"])))
        print(f"[eval] active units (Cov_x(E_q[z|x]) > 0.01, Burda et al. "
              f"2016): {layers}")


def _no_resume(cfg):
    """eval/sample/export configs: skip the Trainer's full-state
    auto-resume — these consumers restore weights-only via
    ``_restore_weights`` (robust to optimizer-flag differences between the
    training run and this invocation, e.g. a --grad-clip-trained
    checkpoint evaluated without the flag)."""
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=False))


def _restore_weights(trainer, cfg, args, what: str) -> None:
    """Shared eval/sample/export preamble: a --from-reference import beats
    the Orbax restore; either way say which weights are in play.
    Weights-only (``Checkpointer.restore_weights``): the optimizer state's
    structure may differ from this invocation's flags and is never used."""
    if args.from_reference:
        _import_reference(trainer, cfg, args.from_reference, what)
        return
    for tag in (args.ckpt, "latest", "best"):
        if trainer.ckpt.has(tag):
            trainer.state = trainer.ckpt.restore_weights(trainer.state, tag)
            note = "" if tag == args.ckpt else \
                f" (no '{args.ckpt}' checkpoint; fell back)"
            print(f"[{what}] loaded '{tag}' at step "
                  f"{int(trainer.state.step)}{note}")
            _warn_dropped_ema(trainer, cfg, tag, what)
            return
    print(f"[{what}] WARNING: no '{args.ckpt}' checkpoint; using INIT weights")


def _warn_dropped_ema(trainer, cfg, tag: str, what: str) -> None:
    """Checkpoints trained with --ema carry an EMA weight copy; restoring
    them with ema_decay=0 silently drops it and uses RAW params — which can
    score worse than the training-time 'best' metric (computed on EMA
    weights). Make the mismatch visible."""
    if cfg.train.ema_decay == 0 and trainer.ckpt.saved_with_ema(tag):
        print(f"[{what}] NOTE: checkpoint '{tag}' carries EMA weights but "
              f"--ema was not given; using RAW params. Pass --ema <decay> "
              f"(e.g. the training value) to {what} the EMA copy.")


def cmd_sample(args) -> None:
    """Batch image generation (serving-style): prior -> decoder -> PNG grid."""
    import math

    import jax
    import numpy as np

    from vae_mdl_tpu.models.inference import make_sampler
    from vae_mdl_tpu.parallel.distributed import init_distributed
    from vae_mdl_tpu.train.trainer import Trainer
    from vae_mdl_tpu.utils.images import fill_canvas, save_png

    init_distributed()
    cfg = _no_resume(_apply_overrides(_base_config(args), args))
    trainer = Trainer(cfg, mesh=_make_mesh_or_none(args.mesh, cfg.mesh))
    _restore_weights(trainer, cfg, args, "sample")
    sampler = make_sampler(trainer.model, cfg.model)
    from vae_mdl_tpu.train.state import eval_params

    imgs = np.asarray(sampler(eval_params(cfg.train, trainer.state),
                              jax.random.PRNGKey(0), args.n))
    out = args.out or f"./assets/{cfg.model.name}_prior_samples.png"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_png(fill_canvas(imgs, int(math.sqrt(args.n))), out)
    print(f"[sample] wrote {args.n} prior samples to {out}")


def cmd_export(args) -> None:
    """AOT-export a trained model for serving (jax.export / StableHLO):
    weights baked in, loadable with only jax (models/export.py)."""
    from vae_mdl_tpu.models import export as mexport
    from vae_mdl_tpu.train.state import eval_params
    from vae_mdl_tpu.train.trainer import Trainer

    cfg = _no_resume(_apply_overrides(_base_config(args), args))
    # an EXPLICIT --mesh embeds the multi-device serving layout in the
    # artifact; the default stays a single-device export regardless of how
    # many chips the exporting host has
    mesh = (_make_mesh_or_none(args.mesh, cfg.mesh)
            if args.mesh and args.mesh != "none" else None)
    trainer = Trainer(cfg, mesh=None)
    _restore_weights(trainer, cfg, args, "export")
    params = eval_params(cfg.train, trainer.state)

    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 if args.platforms else None)
    out = args.out or f"./assets/{cfg.model.name}_{args.what}.stablehlo"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    if args.what == "sampler":
        blob = mexport.export_sampler(trainer.model, cfg.model, params,
                                      n=args.n, path=out,
                                      platforms=platforms, mesh=mesh)
    else:
        shape = (args.n,) + tuple(cfg.model.image_shape)
        fn = (mexport.export_reconstructor if args.what == "reconstructor"
              else mexport.export_encoder)
        blob = fn(trainer.model, cfg.model, params, shape, path=out,
                  platforms=platforms, mesh=mesh)
    print(f"[export] wrote {args.what} ({len(blob)} bytes, "
          f"platforms={platforms or 'native'}, "
          f"layout={'sharded ' + str(tuple(mesh.shape.values())) if mesh else 'single-device'}) "
          f"to {out}")


def cmd_convert(args) -> None:
    """One-shot migration: reference Keras checkpoint -> native Orbax
    checkpoint. After this, eval/sample/train resume from the converted
    checkpoint WITHOUT TensorFlow installed (TF is only needed here, to
    read the TF-format file)."""
    from vae_mdl_tpu.train.trainer import Trainer

    if not args.from_reference:
        raise SystemExit("convert requires --from-reference CKPT_PREFIX")
    cfg = _apply_overrides(_base_config(args), args)
    # a conversion is always a FRESH step-0 state: never auto-resume into
    # it, and never clobber an existing trained checkpoint at the tag
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume=False))
    trainer = Trainer(cfg, mesh=None)
    if trainer.ckpt.has(args.tag):
        raise SystemExit(
            f"convert refuses to overwrite the existing '{args.tag}' "
            f"checkpoint under {cfg.train.checkpoint_dir}/{cfg.model.name}; "
            "pass a fresh --checkpoint-dir (or the other --tag)")
    _import_reference(trainer, cfg, args.from_reference, "convert")
    trainer.ckpt.save(trainer.state, args.tag)
    trainer.ckpt.wait()
    print(f"[convert] saved Orbax '{args.tag}' checkpoint (step 0) under "
          f"{cfg.train.checkpoint_dir}/{cfg.model.name} — eval/sample read "
          "it directly; train warm-starts from it (auto-resume falls back "
          "to 'best' when no 'latest' exists)")


# reference-parity targets (BASELINE.md): metric, value, absolute
# tolerance, source. model01's band is the prescribed 0.5% of the target;
# the BPD rows carry the precision the reference publishes ("≈" to one
# decimal -> ±0.05); digits is the in-suite rehearsal target on the one
# real offline dataset (repo README).
_PARITY_TARGETS = {
    "model01": ("llh", -85.02, 0.43, "/root/reference/README.md:11-13"),
    "model05": ("bpd", 4.5, 0.05, "/root/reference/README.md:75-77"),
    "model06": ("bpd", 5.4, 0.05, "/root/reference/README.md:88-90"),
    "digits": ("llh", -71.3, 1.5, "README.md (digits protocol row)"),
}

# expected on-disk layouts (data/sources.py), shown when files are missing
_DATA_LAYOUTS = {
    "mnist": "<data-dir>/train-images-idx3-ubyte[.gz] (+ t10k-*)",
    "svhn_cropped": "<data-dir>/{train,test[,extra]}_32x32.mat",
    "cifar10": "<data-dir>/cifar-10-batches-py/data_batch_*",
    "celeba": "<data-dir>/celeba-tfr/{train,validation}/* (Glow shards)",
}


def cmd_parity(args) -> None:
    """One-command reference parity (VERDICT r3 item #4): verify the data
    files exist, run the reference-length protocol (resumable), the
    5000-IS eval with the k-hat + k-curve reliability diagnostics, compare
    against the BASELINE.md target, and write a parity report JSON.
    Exits 1 on a failed comparison so scripts can gate on it."""
    import json as _json
    import time as _time

    from vae_mdl_tpu.parallel.distributed import init_distributed
    from vae_mdl_tpu.train.trainer import Trainer

    init_distributed()
    cfg = _apply_overrides(_base_config(args), args)
    name = cfg.model.name
    synthetic = cfg.data.dataset.startswith("synthetic")
    if synthetic and not args.allow_synthetic:
        raise SystemExit(
            f"parity: dataset {cfg.data.dataset!r} is synthetic — a parity "
            "run needs real data (--data-dir); pass --allow-synthetic only "
            "to rehearse the command path")
    if not synthetic and not args.allow_synthetic:
        # fail loudly up front, never silently fall back to synthetic
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, strict=True))
        from vae_mdl_tpu.data.sources import load_dataset

        try:
            load_dataset(cfg.data.dataset, cfg.data.data_dir,
                         allow_synthetic_fallback=False)
        except FileNotFoundError as e:
            layout = _DATA_LAYOUTS.get(cfg.data.dataset, "")
            raise SystemExit(
                f"parity: {e}\nexpected layout: {layout}\n"
                f"(docs/parity.md lists every dataset's files)")

    target = _PARITY_TARGETS.get(name)
    mesh = _make_mesh_or_none(args.mesh, cfg.mesh)
    trainer = Trainer(cfg, mesh=mesh)

    if not args.eval_only:
        if name == "model01":
            _maybe_bias_init(trainer, cfg)
        state = trainer.fit()
        print(f"[parity] trained to step {int(state.step)}, best val loss "
              f"{float(state.best_val_loss):.4f}")
    if trainer.ckpt.has("best"):
        trainer.state = trainer.ckpt.restore(trainer.state, "best")
    elif args.eval_only and int(trainer.state.step) == 0:
        raise SystemExit(
            f"parity --eval-only: no checkpoint found under "
            f"{cfg.train.checkpoint_dir}/{name}")
    _dump_assets(trainer, cfg)

    from vae_mdl_tpu.evaluation import evaluate_llh
    from vae_mdl_tpu.train.state import eval_params

    n_samples = args.n_samples or cfg.train.n_eval_samples
    mean_llh, _, metrics = evaluate_llh(
        trainer.model, cfg, eval_params(cfg.train, trainer.state),
        trainer.test_set[0], n_samples=n_samples, mesh=mesh,
        khat=True, k_curve=True,
    )
    curve = metrics["k_curve_llh"]
    report = {
        "model": name,
        "dataset": cfg.data.dataset,
        "synthetic_rehearsal": bool(synthetic or args.allow_synthetic),
        "step": int(trainer.state.step),
        "n_updates_protocol": cfg.train.n_updates,
        "n_samples": n_samples,
        "llh": mean_llh,
        "bpd": metrics["bpd"],
        "khat_mean": metrics["khat_mean"],
        "khat_max": metrics["khat_max"],
        "khat_frac_gt_07": metrics["khat_frac_gt_07"],
        "khat_n_underflow": metrics["khat_n_underflow"],
        "khat_n_ties": metrics["khat_n_ties"],
        # bound climb over the second half of the weight stream: ~0 means
        # the quoted number is converged at this sample count
        "k_curve_second_half_climb": float(curve[-1] - curve[len(curve) // 2]),
        "timestamp": _time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    if target is None:
        report.update(status="NO_TARGET", target=None)
        verdict = f"no reference target for {name!r} (report only)"
    else:
        metric, value, tol, source = target
        got = report[metric]
        ok = abs(got - value) <= tol
        report.update(
            status="PASS" if ok else "FAIL",
            target={"metric": metric, "value": value, "tolerance": tol,
                    "source": source},
            deviation=got - value,
        )
        verdict = (f"{metric}={got:.4f} vs target {value} ±{tol} "
                   f"({source}) -> {report['status']}")
    if report["synthetic_rehearsal"]:
        verdict += "  [SYNTHETIC REHEARSAL — not a parity claim]"

    path = args.report or os.path.join(
        cfg.train.checkpoint_dir, name, "parity.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        # strict RFC JSON: khat_mean can be NaN (no fittable tails) and
        # json.dump would emit a bare `NaN` token that breaks jq/non-Python
        # consumers gating on this report — map non-finite floats to null
        # (ADVICE r4)
        _json.dump(_json_finite(report), f, indent=2)
    print(f"[parity] {verdict}")
    print(f"[parity] report: {path}")
    if report["status"] == "FAIL" and not report["synthetic_rehearsal"]:
        raise SystemExit(1)


def cmd_list(args) -> None:
    from vae_mdl_tpu.models.zoo import MODELS, _DATASETS

    for name, m in MODELS.items():
        latent = (m.latents() if hasattr(m, "latents")
                  else f"spatial {m.top_latent_shape()}")
        print(f"{name}: {m.likelihood} obs, {m.n_stochastic} stochastic "
              f"layer(s), latent {latent}, dataset {_DATASETS[name]}")


def cmd_describe(args) -> None:
    """Static model card: config, parameter/memory footprint, analytic
    FLOPs, and the mesh plan — all via ``jax.eval_shape`` (no device
    compute, no checkpoint needed). The reference offers nothing
    comparable: its hyperparameters are constants scattered through each
    model file (SURVEY.md §5 'Config / flag system: None')."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_mdl_tpu.models.vae import build_model
    from vae_mdl_tpu.nn.decoders import head_channels
    from vae_mdl_tpu.utils.flops import (
        V5E_PEAK_FLOPS,
        forward_flops,
        train_step_flops,
    )

    cfg = _base_config(args)
    m = cfg.model
    if args.batch_size is not None:
        cfg = _dc.replace(cfg, data=_dc.replace(cfg.data,
                                                batch_size=args.batch_size))
    if args.bf16:
        m = _dc.replace(m, compute_dtype="bfloat16")
        cfg = _dc.replace(cfg, model=m)
    batch = cfg.data.batch_size

    # parameter census without touching a device: trace init abstractly
    model = build_model(m)
    h, w, c = m.image_shape
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def _init(x):
        return model.init({"params": k0, "sample": k1}, x, m.n_samples)

    variables = jax.eval_shape(
        _init, jax.ShapeDtypeStruct((2, h, w, c), jnp.float32))
    leaves = jax.tree.leaves(variables)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    params_mib = n_params * 4 / 2**20  # params are stored float32

    # optimizer slot census (train/state.make_optimizer): adam family keeps
    # two moments; MultiSteps accumulation adds one params-sized buffer;
    # EMA adds one more copy of the params
    slots = 2.0
    if cfg.train.grad_accum_steps > 1:
        slots += 1.0
    if cfg.train.ema_decay > 0:
        slots += 1.0
    state_mib = params_mib * (1.0 + slots)

    fwd = forward_flops(m, batch=1)
    step = train_step_flops(m, batch)
    ceiling = V5E_PEAK_FLOPS / (step / batch)

    latent = (m.latents() if hasattr(m, "latents")
              else f"spatial {m.top_latent_shape()}")
    lk_head = head_channels(m.likelihood, c, m.n_mix)
    if cfg.train.lr_staircase:
        sched = (f"staircase(base {cfg.train.lr_staircase_base}, "
                 f"{cfg.train.lr_staircase_levels} levels)")
    else:
        sched = "constant"
    if cfg.train.lr_warmup_steps:
        sched += f" + warmup {cfg.train.lr_warmup_steps}"
    if m.use_pallas is None:
        pallas = ("auto (fused MoDL kernel on TPU)"
                  if m.likelihood in ("mdl", "pmdl")
                  else "auto (n/a: no fused kernel default for this head)")
    else:
        pallas = "forced on" if m.use_pallas else "off"

    mesh_plan = None
    if args.mesh and args.mesh != "none":
        d, s, mm = _parse_mesh_spec(args.mesh)
        ks = cfg.train.n_eval_samples
        mesh_plan = {
            "data": d, "sample": s, "model": mm, "n_devices": d * s * mm,
            # default GSPMD jit path: batch sharded over 'data' only
            # (parallel/mesh.batch_sharding); shard_map/ZeRO-1 opt-ins
            # flatten the batch over ALL axes (parallel/spmd.py)
            "batch_per_data_device": batch // max(d, 1),
            "batch_divides_data": batch % max(d, 1) == 0,
            "batch_per_device_flattened": batch // (d * s * mm),
            "batch_divides_flattened": batch % (d * s * mm) == 0,
            "eval_samples_per_sample_device": ks // max(s, 1),
            "eval_samples_divide": ks % max(s, 1) == 0,
            # multi-slice fleets: make_mesh lays slices out as major blocks
            # on 'data'; sample/model collectives stay on ICI
            "dcn_axis": "data",
        }

    if getattr(args, "json", False):
        import json as _json

        from vae_mdl_tpu.config_io import config_to_dict

        card = {
            "name": m.name,
            "n_params": n_params,
            "params_mib": round(params_mib, 3),
            "train_state_mib": round(state_mib, 3),
            "optimizer_slots": slots,
            "forward_flops_per_img": fwd,
            "train_step_flops": step,
            "flops_peak": V5E_PEAK_FLOPS,
            "ceiling_imgs_per_sec": ceiling,
            "config": config_to_dict(cfg),
        }
        if mesh_plan is not None:
            card["mesh_plan"] = mesh_plan
        print(_json.dumps(card))
        return

    def _flops(v: float) -> str:
        return (f"{v / 1e9:.2f} GFLOP" if v >= 1e8
                else f"{v / 1e6:.2f} MFLOP")

    print(f"{m.name} — {m.likelihood} obs, {m.n_stochastic} "
          f"stochastic layer(s)")
    print(f"  dataset          {cfg.data.dataset} {m.image_shape}, "
          f"batch {batch}")
    print(f"  latents          {latent}")
    print(f"  importance k     {m.n_samples} (train), "
          f"{cfg.train.n_eval_samples} (final eval)")
    print(f"  likelihood head  {m.likelihood}: {lk_head} channels"
          + (f" (n_mix={m.n_mix})" if m.likelihood in ("mdl", "pmdl") else ""))
    print(f"  compute dtype    {m.compute_dtype} "
          f"(likelihood math always f32)")
    print(f"  pallas           {pallas}")
    beta = getattr(m, "beta", 1.0)
    obj = getattr(m, "objective", "iwae")
    print(f"  objective        {obj}, beta {beta}")
    print(f"  optimizer        {cfg.train.optimizer}, "
          f"lr {cfg.train.learning_rate:g}, {sched}")
    print(f"  protocol         {cfg.train.n_updates:,} updates, "
          f"eval every {cfg.train.eval_interval:,}")
    print()
    print(f"  parameters       {n_params:,}  ({params_mib:.1f} MiB f32)")
    print(f"  train state      ~{state_mib:.1f} MiB "
          f"(params + {slots:g} optimizer-side copies)")
    print(f"  forward FLOPs    {_flops(fwd)}/img (k={m.n_samples})")
    print(f"  train step       {_flops(step / batch)}/img — "
          f"{step / 1e12:.3f} TFLOP/step at batch {batch}")
    print(f"  v5e-1 ceiling    {ceiling:,.0f} imgs/s at 100% bf16 peak "
          f"(197 TFLOP/s; measured MFU tables: docs/design.md §12)")

    if mesh_plan is not None:
        d, s, mm = mesh_plan["data"], mesh_plan["sample"], mesh_plan["model"]
        print()
        print(f"  mesh plan        (data={d}, sample={s}, model={mm}) = "
              f"{mesh_plan['n_devices']} devices")
        div = "" if mesh_plan["batch_divides_data"] else "  [! does not divide]"
        print(f"    train batch    {batch} -> "
              f"{mesh_plan['batch_per_data_device']} "
              f"per data-axis device (default GSPMD path){div}")
        if d * s * mm > d:
            div2 = ("" if mesh_plan["batch_divides_flattened"]
                    else "  [! does not divide]")
            print(f"                   shard_map/ZeRO-1 opt-ins flatten all "
                  f"axes: {batch} -> "
                  f"{mesh_plan['batch_per_device_flattened']} per device{div2}")
        ks = cfg.train.n_eval_samples
        kdiv = "" if mesh_plan["eval_samples_divide"] else "  [! does not divide]"
        print(f"    eval IS axis   {ks} importance samples -> "
              f"{mesh_plan['eval_samples_per_sample_device']} "
              f"per sample-axis device{kdiv}")
        if mm > 1:
            print(f"    tensor par.    wide conv/dense kernels channel-"
                  f"sharded over model={mm} (parallel/tensor.py)")
        print(f"    optimizer      ZeRO-1 available: moments reduce-"
              f"scattered over all {d * s * mm} devices "
              f"(parallel/spmd.py)")
        print(f"    multi-slice    on DCN-joined fleets 'data' is the "
              f"slice-major axis; sample/model collectives stay on ICI "
              f"(parallel/mesh.py)")


def build_parser() -> argparse.ArgumentParser:
    # read at parse time so models added via zoo.register_model are
    # runnable from the CLI (docs/extending.md, examples/custom_model.py)
    from vae_mdl_tpu.models.zoo import MODELS

    p = argparse.ArgumentParser(prog="vae_mdl_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("model", nargs="?", choices=list(MODELS),
                        help="zoo entry (optional when --config is given)")
        sp.add_argument("--config", metavar="FILE",
                        help="build the experiment from a config JSON "
                             "(e.g. a run's recorded config.json) instead "
                             "of the zoo; flag overrides still apply")
        sp.add_argument("--dataset")
        sp.add_argument("--data-dir")
        sp.add_argument("--batch-size", type=int)
        sp.add_argument("--n-updates", type=int)
        sp.add_argument("--eval-interval", type=int)
        sp.add_argument("--checkpoint-dir")
        sp.add_argument("--log-dir")
        sp.add_argument("--n-samples", type=int, default=None,
                        help="importance samples for the final eval "
                             "(default: cfg.train.n_eval_samples = 5000)")
        sp.add_argument("--mesh", help="DxS or DxSxM mesh (data x sample x "
                        "model; M>1 = channel tensor parallelism), e.g. 4x2 "
                        "or 2x2x2; 'none' disables")
        sp.add_argument("--bf16", action="store_true",
                        help="bfloat16 conv/matmul body")
        sp.add_argument("--likelihood-io-dtype",
                        choices=["bfloat16", "float32"], default=None,
                        help="quantize the decoder-head -> likelihood "
                             "boundary tensor (mdl); likelihood math stays "
                             "float32. bfloat16 = +9%% model05 train "
                             "throughput (design.md §12n)")
        sp.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="fused Pallas likelihood kernels (default auto: "
                             "MoDL kernel on TPU, off elsewhere)")
        sp.add_argument("--no-resume", action="store_true")
        sp.add_argument("--snapshot-interval", type=int, metavar="STEPS",
                        help="also keep immutable step_<N> snapshot "
                             "checkpoints every STEPS (multiple of "
                             "--eval-interval)")
        sp.add_argument("--max-snapshots", type=int, metavar="N",
                        help="rotate snapshots, keeping the newest N "
                             "(default 3)")
        sp.add_argument("--grad-clip", type=float, metavar="NORM",
                        help="clip gradients to this global norm")
        sp.add_argument("--grad-skip", type=float, metavar="THRESHOLD",
                        help="skip updates whose global grad norm is "
                             "non-finite or exceeds this (VDVAE skip rule)")
        sp.add_argument("--objective", choices=["iwae", "elbo", "iwae_dreg"],
                        default=None,
                        help="training objective: the config's default "
                        "(usually iwae), elbo, or iwae_dreg (DReG "
                        "gradients for the IWAE bound; VAE family only)")
        sp.add_argument("--free-bits", type=float, metavar="NATS",
                        default=None,
                        help="floor each stochastic layer's expected KL at "
                        "this many nats in the objective (requires "
                        "--objective elbo)")
        sp.add_argument("--beta-warmup", type=int, metavar="STEPS",
                        help="KL annealing: ramp the bound's beta linearly "
                             "0 -> model beta over STEPS train steps")
        sp.add_argument("--ema", type=float, metavar="DECAY",
                        help="per-step EMA decay of the params (e.g. 0.999); "
                             "val/test/report then use the EMA weights")
        sp.add_argument("--profile", metavar="DIR",
                        help="capture a jax.profiler trace of ~20 steps")
        sp.add_argument("--steps-per-call", type=int,
                        help="scan N updates per dispatched program")
        sp.add_argument("--device-dataset", action="store_true",
                        help="keep the whole train split in HBM (small sets)")
        sp.add_argument("--bound-logstd", action="store_true",
                        help="tanh-bound the DL head's logstd (the "
                        "reference's commented-out stability remedy, "
                        "model04.py:86-89)")
        sp.add_argument("--from-reference", metavar="CKPT_PREFIX",
                        help="import weights from a reference (nbip/vae-mdl) "
                             "Keras save_weights checkpoint prefix, e.g. "
                             "saved_models/model05/best — eval/sample use "
                             "them directly; train warm-starts from them")
        sp.add_argument("--strict-data", action="store_true",
                        help="fail if dataset files are missing instead of "
                             "falling back to synthetic data (parity runs)")

    sp_train = sub.add_parser("train", help="train + final 5000-IS eval + assets")
    common(sp_train)
    sp_train.add_argument("--skip-final-eval", action="store_true")
    sp_train.add_argument("--khat", action="store_true",
                          help="final eval also reports the PSIS k-hat "
                               "reliability diagnostic (protocol runs "
                               "should pass this)")
    sp_train.add_argument("--k-curve", action="store_true",
                          help="final eval also reports the IS-convergence "
                               "curve")
    sp_train.set_defaults(fn=cmd_train)

    sp_eval = sub.add_parser("eval", help="5000-IS test evaluation")
    common(sp_eval)
    sp_eval.add_argument("--ckpt", default="best",
                         help="checkpoint tag: best, latest, or a "
                              "step_<N> snapshot")
    sp_eval.add_argument("--active-units", action="store_true",
                         help="also report per-layer active latent units "
                              "(posterior-mean variance > 0.01, Burda et "
                              "al. 2016)")
    sp_eval.add_argument("--khat", action="store_true",
                         help="also report the PSIS Pareto-shape "
                              "reliability diagnostic of the "
                              "importance-weighted bound (k-hat > 0.7 = "
                              "unreliable; Vehtari et al. 2024)")
    sp_eval.add_argument("--k-curve", action="store_true",
                         help="also report the IS-convergence curve: the "
                              "test-mean bound at every k-chunk of the "
                              "same weight stream (a curve still climbing "
                              "at the final k = quote a larger k)")
    sp_eval.set_defaults(fn=cmd_eval)

    sp_sample = sub.add_parser("sample", help="generate images from the prior")
    common(sp_sample)
    sp_sample.add_argument("--n", type=int, default=64)
    sp_sample.add_argument("--out", default=None, help="output PNG path")
    sp_sample.add_argument("--ckpt", default="best",
                           help="checkpoint tag: best, latest, or a "
                                "step_<N> snapshot")
    sp_sample.set_defaults(fn=cmd_sample)

    sp_export = sub.add_parser(
        "export", help="AOT-export for serving (StableHLO, weights baked in)")
    common(sp_export)
    sp_export.add_argument("--what", default="sampler",
                           choices=["sampler", "reconstructor", "encoder"])
    sp_export.add_argument("--n", type=int, default=64,
                           help="sample count (sampler) / batch size "
                                "(reconstructor, encoder)")
    sp_export.add_argument("--out", default=None,
                           help="output path (.stablehlo)")
    sp_export.add_argument("--ckpt", default="best",
                           help="checkpoint tag: best, latest, or a "
                                "step_<N> snapshot")
    sp_export.add_argument("--platforms", default=None,
                           help="comma-separated lowering targets, e.g. "
                                "'tpu,cpu' (default: this process's "
                                "backend)")
    sp_export.set_defaults(fn=cmd_export)

    sp_convert = sub.add_parser(
        "convert", help="reference Keras checkpoint -> native Orbax "
                        "checkpoint (one-shot; --from-reference required)")
    common(sp_convert)
    sp_convert.add_argument("--tag", default="best",
                            choices=["best", "latest"],
                            help="tag for the converted checkpoint")
    sp_convert.set_defaults(fn=cmd_convert)

    sp_par = sub.add_parser(
        "parity",
        help="one-command reference parity: verify data files, run the "
             "reference-length protocol (resumable), 5000-IS eval with "
             "k-hat/k-curve, compare vs BASELINE.md, write a report JSON")
    common(sp_par)
    sp_par.add_argument("--eval-only", action="store_true",
                        help="skip training; evaluate existing checkpoints")
    sp_par.add_argument("--allow-synthetic", action="store_true",
                        help="rehearse the full parity path on synthetic "
                             "fallback data (marked in the report; never a "
                             "parity claim)")
    sp_par.add_argument("--report", metavar="FILE",
                        help="report path (default "
                             "<checkpoint-dir>/<model>/parity.json)")
    sp_par.set_defaults(fn=cmd_parity)

    sp_list = sub.add_parser("list", help="list model configs")
    sp_list.set_defaults(fn=cmd_list)

    sp_desc = sub.add_parser(
        "describe", help="model card: config, params, memory, analytic "
                         "FLOPs, mesh plan (no device compute)")
    sp_desc.add_argument("model", nargs="?", choices=list(MODELS),
                         help="zoo entry (optional when --config is given)")
    sp_desc.add_argument("--config", metavar="FILE",
                         help="describe a config JSON (e.g. a run's "
                              "recorded config.json) instead of a zoo entry")
    sp_desc.add_argument("--batch-size", type=int)
    sp_desc.add_argument("--bf16", action="store_true")
    sp_desc.add_argument("--mesh", help="DxS or DxSxM plan to preview")
    sp_desc.add_argument("--json", action="store_true",
                         help="emit the card as one machine-readable JSON "
                              "object (includes the full config dict)")
    sp_desc.set_defaults(fn=cmd_describe)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if getattr(args, "fn", None) not in (cmd_list, cmd_describe):
        from vae_mdl_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
