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


def test_parser_wires_grad_stability_flags():
    from vae_mdl_tpu.cli.run import _apply_overrides
    from vae_mdl_tpu.models.zoo import experiment

    p = build_parser()
    args = p.parse_args(["train", "model01", "--grad-clip", "200",
                         "--grad-skip", "400"])
    cfg = _apply_overrides(experiment("model01"), args)
    assert cfg.train.grad_clip_norm == 200.0
    assert cfg.train.grad_skip_threshold == 400.0


def test_parser_accepts_registered_models():
    """Models added via zoo.register_model are runnable from the CLI —
    the choices list is read off the registry at parse time."""
    import dataclasses

    from vae_mdl_tpu.models.zoo import (
        MODELS, _DATASETS, _N_UPDATES, experiment, register_model)

    custom = dataclasses.replace(experiment("model01").model,
                                 name="custom_parse_check")
    register_model(custom, dataset="synthetic:mnist")
    try:
        args = build_parser().parse_args(["train", "custom_parse_check",
                                          "--n-updates", "1"])
        assert args.model == "custom_parse_check"
    finally:
        for reg in (MODELS, _DATASETS, _N_UPDATES):
            reg.pop("custom_parse_check", None)


def test_mesh_spec_errors():
    """Malformed --mesh specs fail with a clear message instead of a
    traceback (and extra components are rejected, not dropped)."""
    from vae_mdl_tpu.cli.run import _make_mesh_or_none

    with pytest.raises(SystemExit, match="at most|expected"):
        _make_mesh_or_none("2x2x2x1")
    with pytest.raises(SystemExit, match="integers"):
        _make_mesh_or_none("2xfoo")
    # zero or negative components are rejected, not divided by later
    with pytest.raises(SystemExit, match=">= 1"):
        _make_mesh_or_none("0")
    with pytest.raises(SystemExit, match=">= 1"):
        _make_mesh_or_none("0x2")
    with pytest.raises(SystemExit, match=">= 1"):
        _make_mesh_or_none("2x-1")
    # trailing 'x' keeps its historical meaning: "8x" == 8x1
    mesh = _make_mesh_or_none("8x")
    assert dict(mesh.shape) == {"data": 8, "sample": 1}


def test_describe_mesh_zero_rejected(capsys):
    """describe --mesh 0 must exit with the grammar error, not a
    ZeroDivisionError from the mesh-plan arithmetic (regression: the plan
    dict divides the batch by data*sample*model)."""
    with pytest.raises(SystemExit, match=">= 1"):
        main(["describe", "model01", "--mesh", "0"])


def test_objective_flags_rejected_for_ladder_families():
    """--objective / --free-bits name the config family in a clean error on
    the ladders (LadderConfig has no such fields; a raw TypeError from
    dataclasses.replace would make training_loss_fn's curated refusal
    unreachable from the CLI)."""
    with pytest.raises(SystemExit, match="LadderConfig"):
        main(["sample", "ladder_svhn", "--objective", "elbo"])
    with pytest.raises(SystemExit, match="LadderConfig"):
        main(["sample", "ladder_svhn", "--free-bits", "0.25"])


def test_cli_list(capsys):
    main(["list"])
    out = capsys.readouterr().out
    assert "model01" in out and "model06" in out


@pytest.mark.parametrize("name", ["model01", "model05", "biladder_svhn"])
def test_cli_describe(capsys, name):
    """`describe` prints the model card for every config family (ModelConfig,
    ladder dataclasses) without touching a device or a checkpoint."""
    main(["describe", name, "--mesh", "4x2"])
    out = capsys.readouterr().out
    assert "parameters" in out and "train step" in out
    assert "mesh plan" in out and "8 devices" in out
    # the param census is a real eval_shape count, not a placeholder
    import re

    n = int(re.search(r"parameters\s+([\d,]+)", out).group(1).replace(",", ""))
    assert n > 10_000


def test_cli_describe_mesh_plan_matches_train_semantics(capsys):
    """The plan's per-device batch reflects the default GSPMD path (batch
    sharded over 'data' only — parallel/mesh.batch_sharding), with the
    shard_map/ZeRO-1 flattened layout reported separately; and the spec
    grammar is the same one train/eval accept (a 4-component spec is
    rejected, not silently truncated)."""
    main(["describe", "model01", "--mesh", "4x2"])  # batch 128
    out = capsys.readouterr().out
    assert "128 -> 32 per data-axis device" in out
    assert "flatten all axes: 128 -> 16 per device" in out
    assert "does not divide" not in out

    with pytest.raises(SystemExit, match="DxSxM"):
        main(["describe", "model01", "--mesh", "2x2x2x2"])


def test_cli_describe_matches_flops_utils(capsys):
    """The card's TFLOP/step agrees with utils.flops.train_step_flops."""
    from vae_mdl_tpu.models.zoo import experiment
    from vae_mdl_tpu.utils.flops import train_step_flops

    main(["describe", "model05"])
    out = capsys.readouterr().out
    import re

    tf = float(re.search(r"([\d.]+) TFLOP/step", out).group(1))
    cfg = experiment("model05")
    assert abs(tf - train_step_flops(cfg.model, cfg.data.batch_size) / 1e12) \
        < 0.001


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


def test_cli_parity_rehearsal_synthetic(tmp_path, monkeypatch, capsys):
    """The turnkey parity command (VERDICT r3 item #4), rehearsed on the
    synthetic fallback: trains the (shortened) protocol, runs the eval
    with k-hat + k-curve, writes a report marked as a rehearsal, and never
    claims parity (no exit 1 even when the number misses the target)."""
    import json

    monkeypatch.chdir(tmp_path)
    main([
        "parity", "model01", "--dataset", "synthetic:mnist",
        "--allow-synthetic",
        "--n-updates", "4", "--eval-interval", "2",
        "--batch-size", "8", "--n-samples", "25",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"),
        "--mesh", "none",
    ])
    out = capsys.readouterr().out
    assert "SYNTHETIC REHEARSAL" in out
    with open(tmp_path / "ckpt" / "model01" / "parity.json") as f:
        rep = json.load(f)
    assert rep["synthetic_rehearsal"] is True
    assert rep["status"] in ("PASS", "FAIL")
    assert rep["target"]["value"] == -85.02
    assert rep["n_samples"] == 25
    for key in ("llh", "bpd", "khat_mean", "khat_frac_gt_07",
                "k_curve_second_half_climb"):
        assert key in rep, key


def test_parity_report_json_is_strict_rfc():
    """Non-finite floats (khat_mean is NaN when no tails are fittable)
    serialize as null, never as Python's bare `NaN` token that breaks
    jq/strict parsers gating on parity.json (ADVICE r4)."""
    import json
    import math

    from vae_mdl_tpu.cli.run import _json_finite

    report = {"llh": -85.0, "khat_mean": float("nan"),
              "nested": {"climb": float("inf"), "vals": [1.0, float("-inf")]},
              "status": "PASS"}
    text = json.dumps(_json_finite(report))
    assert "NaN" not in text and "Infinity" not in text
    back = json.loads(text)
    assert back["khat_mean"] is None
    assert back["nested"]["climb"] is None
    assert back["nested"]["vals"] == [1.0, None]
    assert back["llh"] == -85.0 and math.isfinite(back["llh"])


def test_cli_parity_refuses_synthetic_and_missing_data(tmp_path, monkeypatch):
    """Without --allow-synthetic the command refuses synthetic datasets,
    and with real datasets it verifies the files up front, naming the
    expected layout instead of silently falling back."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="allow-synthetic"):
        main(["parity", "model01", "--dataset", "synthetic:mnist",
              "--checkpoint-dir", str(tmp_path / "ckpt"), "--mesh", "none"])
    with pytest.raises(SystemExit, match="expected layout"):
        main(["parity", "model01", "--data-dir", str(tmp_path / "nodata"),
              "--checkpoint-dir", str(tmp_path / "ckpt"), "--mesh", "none"])


def test_cli_parity_digits_real_data(tmp_path, monkeypatch):
    """End-to-end on the REAL offline digits set: a deliberately short run
    misses the -71.3 target -> status FAIL, exit code 1, report written —
    the full command path exercised on non-synthetic data in-suite."""
    import json

    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit) as e:
        main([
            "parity", "digits",
            "--n-updates", "4", "--eval-interval", "2",
            "--batch-size", "8", "--n-samples", "25",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "tb"),
            "--mesh", "none",
        ])
    assert e.value.code == 1
    with open(tmp_path / "ckpt" / "digits" / "parity.json") as f:
        rep = json.load(f)
    assert rep["status"] == "FAIL"
    assert rep["synthetic_rehearsal"] is False
    assert rep["target"]["metric"] == "llh"
