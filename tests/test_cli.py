"""CLI tests: the end-to-end reference protocol on tiny synthetic runs."""
import os

import pytest

from vae_mdl_tpu.cli.run import build_parser, main


def test_parser_covers_protocol():
    p = build_parser()
    args = p.parse_args(
        ["train", "model05", "--n-updates", "3", "--bf16", "--pallas",
         "--mesh", "4x2", "--n-samples", "10"]
    )
    assert args.model == "model05" and args.bf16 and args.pallas
    assert args.mesh == "4x2"


def test_cli_list(capsys):
    main(["list"])
    out = capsys.readouterr().out
    assert "model01" in out and "model06" in out


def test_cli_train_end_to_end(tmp_path, monkeypatch):
    """train -> checkpoints -> assets -> final eval, all through the CLI."""
    monkeypatch.chdir(tmp_path)
    main([
        "train", "model01",
        "--dataset", "synthetic:mnist",
        "--n-updates", "4", "--eval-interval", "2",
        "--batch-size", "8", "--n-samples", "4",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"),
        "--mesh", "none",
        "--skip-final-eval",
    ])
    assert os.path.isdir(tmp_path / "ckpt" / "model01" / "latest")
    assert os.path.exists(tmp_path / "assets" / "model01_samples.png")


def test_cli_eval_without_checkpoint_warns(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    main([
        "eval", "model01",
        "--dataset", "synthetic:mnist",
        "--batch-size", "8", "--n-samples", "4",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"),
        "--mesh", "none",
    ])
    out = capsys.readouterr().out
    assert "WARNING" in out and "test LLH" in out
