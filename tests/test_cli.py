"""Config system + CLI end-to-end smoke tests (tiny synthetic corpus)."""

import json
import os

import pytest

from ircl_tpu.config import Config, apply_override, load_config
from ircl_tpu.cli import main as cli_main


def test_load_config_defaults_and_overrides(tmp_path):
    cfg = load_config(None)
    assert cfg.index.hash_size == 1 << 24
    cfg2 = apply_override(cfg, "train.loss", "ProtoNCE")
    assert cfg2.train.loss == "ProtoNCE"
    cfg3 = apply_override(cfg, "index.hash_size", "65536")
    assert cfg3.index.hash_size == 65536
    with pytest.raises(ValueError):
        apply_override(cfg, "index.nonexistent", 1)

    yml = tmp_path / "c.yaml"
    yml.write_text(
        "index:\n  hash_size: 1024\n  ngram: 1\n"
        "data:\n  synthetic_docs: 12\n"
    )
    cfg4 = load_config(str(yml))
    assert cfg4.index.hash_size == 1024 and cfg4.index.ngram == 1
    assert cfg4.data.synthetic_docs == 12

    bad = tmp_path / "bad.yaml"
    bad.write_text("index:\n  hash_sizee: 1024\n")
    with pytest.raises(ValueError):
        load_config(str(bad))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    cfgfile = ws / "cfg.yaml"
    cfgfile.write_text(
        f"""
data:
  data_dir: {ws}/data
  wiki_json: {ws}/data/small_wiki.json
  dev_jsonl: {ws}/data/shared_task_dev.jsonl
  synthetic: true
  synthetic_docs: 40
  synthetic_claims: 20
index:
  hash_size: 262144
ckptdir: {ws}/ckpt
logdir: {ws}/log
"""
    )
    return ws, str(cfgfile)


def test_cli_prepare_and_index(workspace, capsys):
    ws, cfg = workspace
    cli_main(["--config", cfg, "prepare"])
    assert os.path.exists(f"{ws}/data/small_wiki.json")
    assert os.path.exists(f"{ws}/data/shared_task_dev.jsonl")
    assert os.path.exists(f"{ws}/data/docs_sentence.pkl")

    cli_main(["--config", cfg, "build-index"])
    assert os.path.exists(f"{ws}/data/index/count_matrix.npz")


def test_cli_train_tiny(workspace):
    ws, cfg = workspace
    cli_main(
        [
            "--config", cfg,
            "--set", "train.micro_batch=8",
            "--set", "train.accum_steps=1",
            "--set", "train.queue_size=16",
            "--set", "featurizer.dim=16",
            "--set", "featurizer.max_len=8",
            "--set", "train.encoder.input_size=16",
            "--set", "train.encoder.hidden_size=8",
            "--set", "train.encoder.output_size=8",
            "--set", "train.encoder.num_layers=1",
            "train", "--steps", "3", "--log-step", "3", "--seed", "7",
        ]
    )
    assert os.path.isdir(f"{ws}/ckpt")


def test_cli_retrieve(workspace, capsys):
    ws, cfg = workspace
    cli_main(
        ["--config", cfg, "retrieve", "--out", f"{ws}/results.jsonl"]
    )
    out = capsys.readouterr().out.strip().splitlines()[-1]
    metrics = json.loads(out)
    assert metrics["doc_recall@k"] >= 0.8
    assert os.path.exists(f"{ws}/results.jsonl")


def test_cli_serve_two_stage_stdin(workspace, monkeypatch, capsys):
    """`cli serve --stdin --dense-ckpt ...` answers a two-stage sentence
    request over the JSONL transport, builds + caches the sentence table
    at --sent-table, and reuses the cache on a second boot."""
    import glob
    import io

    ws, cfg = workspace
    ckpts = sorted(glob.glob(f"{ws}/ckpt/*.ckpt")) or sorted(
        glob.glob(f"{ws}/ckpt/*")
    )
    assert ckpts, "train test must run first (module-scoped workspace)"
    table = f"{ws}/sent_table.npy"
    overrides = [
        "--set", "featurizer.dim=16",
        "--set", "featurizer.max_len=8",
        "--set", "train.encoder.input_size=16",
        "--set", "train.encoder.hidden_size=8",
        "--set", "train.encoder.output_size=8",
        "--set", "train.encoder.num_layers=1",
    ]
    serve_args = [
        "--config", cfg, *overrides,
        "serve", "--stdin", "--batch-size", "8", "--k", "3",
        "--k-sents", "2", "--dense-ckpt", ckpts[-1], "--sent-table", table,
    ]
    req = json.dumps(
        {"queries": ["vamu pufo heno"], "sentences": True}
    )

    def boot():
        monkeypatch.setattr(
            "sys.stdin", io.StringIO(req + "\n" + '{"bad json\n')
        )
        cli_main(serve_args)
        lines = [
            ln for ln in capsys.readouterr().out.strip().splitlines()
            if ln.startswith("{")
        ]
        ok = json.loads(lines[-2])
        err = json.loads(lines[-1])
        assert "error" in err  # malformed line answered, loop survived
        return ok

    first = boot()
    assert os.path.exists(table)
    per_q = first["results"][0]
    assert len(per_q) == 2 and {"doc_id", "sent_id", "sentence", "score"} <= set(
        per_q[0]
    )
    second = boot()  # warm boot: loads the cached table
    assert second == first


def test_cli_train_dp(workspace, capsys):
    """`cli train --dp` runs the trainer over the virtual 8-device mesh."""
    ws, cfg = workspace
    cli_main(
        [
            "--config", cfg,
            "--set", "train.micro_batch=8",
            "--set", "train.accum_steps=1",
            "--set", "train.queue_size=16",
            "--set", "featurizer.dim=16",
            "--set", "featurizer.max_len=8",
            "--set", "train.encoder.input_size=16",
            "--set", "train.encoder.hidden_size=8",
            "--set", "train.encoder.output_size=8",
            "--set", "train.encoder.num_layers=1",
            "train", "--steps", "2", "--log-step", "2", "--seed", "11",
            "--dp",
        ]
    )
    out = capsys.readouterr().out
    assert "data-parallel training over 8 devices" in out
    assert "finished at step 2" in out
