"""Guard for the end-to-end trainer bench path (``bench_train.py --e2e``).

The e2e mode drives the REAL ``ContrastiveTrainer`` loop (host pair
sampling + encode_host + async dispatch) — the measured counterpart of the
reference's DataLoader-fed inner loop (``src/train.py:86-199``). This test
runs it at smoke shapes so argument plumbing, the warmup/measure split, and
the host/device step-count sync assertions stay wired.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_train_e2e_tiny(capsys):
    import bench_train

    args = argparse.Namespace(
        e2e=True, steps=4, warmup_steps=2, docs=50, tiny=True,
        cpu=False,  # conftest already forces the CPU backend
    )
    bench_train.main_e2e(args)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["metric"] == "contrastive_train_e2e_steps_per_sec_effbatch256"
    assert rec["value"] > 0
    assert rec["unit"] == "steps/s"
