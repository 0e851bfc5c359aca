"""End-to-end CLI verdict flow: train-verdict -> eval-verdict (gold and
retrieved evidence) on a tiny synthetic corpus."""

import json
import os

import pytest

from ircl_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("vws")
    cfgfile = ws / "cfg.yaml"
    cfgfile.write_text(
        f"""
data:
  data_dir: {ws}/data
  wiki_json: {ws}/data/small_wiki.json
  dev_jsonl: {ws}/data/shared_task_dev.jsonl
  synthetic: true
  synthetic_docs: 30
  synthetic_claims: 24
index:
  hash_size: 131072
verdict:
  epochs: 2
  batch_size: 8
  val_fraction: 0.1
  warmup_steps: 2
  max_length: 48
  learning_rate: 0.001
ckptdir: {ws}/ckpt
logdir: {ws}/log
"""
    )
    cli_main(["--config", str(cfgfile), "prepare"])
    return ws, str(cfgfile)


def test_train_and_eval_verdict_cli(workspace, capsys):
    ws, cfg = workspace
    cli_main(
        [
            "--config", cfg, "train-verdict",
            "--vocab-size", "512", "--hidden", "32", "--layers", "1",
            "--heads", "2",
        ]
    )
    capsys.readouterr()
    assert os.path.exists(f"{ws}/ckpt/verdict_vocab.txt")
    assert os.path.exists(f"{ws}/ckpt/verdict_config.json")

    # gold-evidence eval
    cli_main(["--config", cfg, "eval-verdict"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= rep["macro_f1"] <= 1.0
    assert rep["per_class"]

    # retrieval-output eval
    cli_main(["--config", cfg, "retrieve", "--out", f"{ws}/res.jsonl"])
    capsys.readouterr()
    cli_main(["--config", cfg, "eval-verdict", "--retrieved", f"{ws}/res.jsonl"])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= rep2["macro_f1"] <= 1.0


def test_train_verdict_cli_pp_dp_mesh(workspace, capsys):
    """--pp 2 --dp 2: the CLI builds the ("data","stage") mesh, trains
    through the GPipe schedule, and saves a standard-layout checkpoint
    that eval-verdict can reload."""
    ws, cfg = workspace
    cli_main(
        [
            "--config", cfg, "train-verdict",
            "--vocab-size", "512", "--hidden", "32", "--layers", "2",
            "--heads", "2", "--pp", "2", "--dp", "2", "--pp-micro", "4",
        ]
    )
    capsys.readouterr()
    assert os.path.exists(f"{ws}/ckpt/verdict_config.json")
    cli_main(["--config", cfg, "eval-verdict"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= rep["macro_f1"] <= 1.0


def test_train_verdict_cli_rejects_pp_with_tp(workspace):
    ws, cfg = workspace
    with pytest.raises(SystemExit):
        cli_main(
            ["--config", cfg, "train-verdict", "--pp", "2", "--tp", "2"]
        )
