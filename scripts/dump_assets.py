"""Regenerate the three protocol asset grids from an existing checkpoint.

The `train` command dumps assets after its final best-reload
(cli/run.py:_dump_assets); this standalone entry re-creates them for a run
whose training already finished (e.g. a re-pinned protocol checkpoint)
without retraining. Usage:

    python scripts/dump_assets.py MODEL CKPT_DIR [--ckpt best]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("model")
    p.add_argument("checkpoint_dir")
    p.add_argument("--ckpt", default="best")
    p.add_argument("--out-dir", default="./assets")
    args = p.parse_args()

    import dataclasses

    from vae_mdl_tpu.cli.run import _dump_assets
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.train.trainer import Trainer

    cfg = experiment(args.model)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, checkpoint_dir=args.checkpoint_dir, resume=False))
    trainer = Trainer(cfg)
    if not trainer.ckpt.has(args.ckpt):
        raise SystemExit(f"no '{args.ckpt}' checkpoint in "
                         f"{args.checkpoint_dir}")
    trainer.state = trainer.ckpt.restore_weights(trainer.state, args.ckpt)
    print(f"[assets] loaded '{args.ckpt}' at step {int(trainer.state.step)}")
    _dump_assets(trainer, cfg, out_dir=args.out_dir)


if __name__ == "__main__":
    main()
