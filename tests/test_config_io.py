"""Config serialization: JSON round-trip, provenance recording, CLI wiring."""
import dataclasses
import json
import os

import pytest

from vae_mdl_tpu.config_io import (
    config_from_dict,
    config_to_dict,
    diff_configs,
    load_config,
    save_config,
)
from vae_mdl_tpu.models.zoo import MODELS, experiment


@pytest.mark.parametrize("name", sorted(MODELS))
def test_roundtrip_every_zoo_entry(name):
    """Every family (ModelConfig, LadderConfig, BiLadderConfig) survives the
    dict round-trip exactly — tuples, nested encoder/decoder configs, all."""
    cfg = experiment(name)
    assert config_from_dict(config_to_dict(cfg)) == cfg


def test_json_file_roundtrip(tmp_path):
    cfg = experiment("model05")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.999,
                                       grad_clip_norm=200.0))
    path = str(tmp_path / "config.json")
    save_config(cfg, path)
    # the file is plain JSON (hand-editable), not a pickle
    with open(path) as f:
        d = json.load(f)
    assert d["format"] == "vae-mdl-tpu/config/v1"
    assert d["train"]["ema_decay"] == 0.999
    assert load_config(path) == cfg


def test_unknown_field_is_a_named_error(tmp_path):
    """A typo in a hand-edited file fails loudly with the section and field,
    never a silent no-op."""
    d = config_to_dict(experiment("model01"))
    d["train"]["learning_rtae"] = 1e-3
    with pytest.raises(ValueError, match=r"'train'.*learning_rtae"):
        config_from_dict(d)
    d2 = config_to_dict(experiment("model01"))
    d2["model"]["encoder"]["n_hiden"] = 5
    with pytest.raises(ValueError, match=r"model.encoder.*n_hiden"):
        config_from_dict(d2)


def test_unknown_model_class_and_format_rejected():
    d = config_to_dict(experiment("model01"))
    bad = dict(d, model_class="transformer")
    with pytest.raises(ValueError, match="model_class"):
        config_from_dict(bad)
    with pytest.raises(ValueError, match="format"):
        config_from_dict(dict(d, format="vae-mdl-tpu/config/v999"))


def test_diff_configs_dotted_paths():
    a = experiment("model01")
    b = dataclasses.replace(
        a,
        train=dataclasses.replace(a.train, learning_rate=5e-4),
        model=dataclasses.replace(
            a.model, encoder=dataclasses.replace(a.model.encoder,
                                                 n_hidden=123)),
    )
    drift = diff_configs(a, b)
    assert any(d.startswith("train.learning_rate: 0.001 -> 0.0005")
               for d in drift)
    assert any(d.startswith("model.encoder.n_hidden: 200 -> 123")
               for d in drift)
    assert diff_configs(a, a) == []


def test_trainer_records_config_and_warns_on_drift(tmp_path, capsys):
    """fit() writes config.json next to the checkpoints; a resumed run with
    drifted flags prints a field-by-field warning."""
    from vae_mdl_tpu.train.trainer import Trainer

    cfg = experiment("model01")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, dataset="synthetic:mnist",
                                 batch_size=8),
        train=dataclasses.replace(cfg.train, n_updates=2, eval_interval=2,
                                  checkpoint_dir=str(tmp_path / "ckpt"),
                                  log_dir=str(tmp_path / "tb")),
    )
    trainer = Trainer(cfg)
    trainer._record_config()
    path = tmp_path / "ckpt" / "model01" / "config.json"
    assert path.exists()
    assert load_config(str(path)) == cfg
    assert "WARNING" not in capsys.readouterr().out

    # same dir, drifted lr -> warning names the field and both values
    drifted = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, learning_rate=5e-4))
    trainer.cfg = drifted
    trainer._record_config()
    out = capsys.readouterr().out
    assert "live config differs" in out
    assert "train.learning_rate: 0.001 -> 0.0005" in out
    # the file now mirrors the live run
    assert load_config(str(path)) == drifted


def test_cli_train_writes_and_config_flag_reproduces(tmp_path, monkeypatch,
                                                     capsys):
    """End-to-end provenance: train records config.json; `describe --config`
    rebuilds the exact experiment from it; a model/config mismatch errors."""
    from vae_mdl_tpu.cli.run import main

    monkeypatch.chdir(tmp_path)
    main([
        "train", "model01",
        "--dataset", "synthetic:mnist",
        "--n-updates", "2", "--eval-interval", "2",
        "--batch-size", "8", "--beta-warmup", "7",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "tb"),
        "--mesh", "none", "--skip-final-eval",
    ])
    capsys.readouterr()
    path = str(tmp_path / "ckpt" / "model01" / "config.json")
    assert os.path.exists(path)
    recorded = load_config(path)
    assert recorded.train.beta_warmup_steps == 7  # the override was recorded

    main(["describe", "--config", path, "--json"])
    card = json.loads(capsys.readouterr().out)
    assert card["name"] == "model01"
    assert card["config"]["train"]["beta_warmup_steps"] == 7
    assert config_from_dict(card["config"]) == recorded

    with pytest.raises(SystemExit, match="model05"):
        main(["describe", "model05", "--config", path])
    with pytest.raises(SystemExit, match="model name or --config"):
        main(["describe"])


def test_cli_describe_json_matches_text_card(capsys):
    """--json carries the same census numbers the text card prints."""
    from vae_mdl_tpu.cli.run import main
    from vae_mdl_tpu.utils.flops import train_step_flops

    main(["describe", "model05", "--json", "--mesh", "4x2"])
    card = json.loads(capsys.readouterr().out)
    cfg = experiment("model05")
    assert card["train_step_flops"] == train_step_flops(cfg.model,
                                                        cfg.data.batch_size)
    assert card["n_params"] > 10_000
    assert card["mesh_plan"]["n_devices"] == 8
    assert card["mesh_plan"]["batch_per_data_device"] == 32
