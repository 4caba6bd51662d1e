"""CLI smoke tests: the three entry points mirroring the reference's
scripts (main.py / evaluate.py / augment_grids.py) run end-to-end."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=240):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, "-m"] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_augment_cli(tmp_path):
    r = run_cli([
        "gns_tpu.utils", "--case", "9", "--num", "5", "--seed", "1",
        "--data-dir", str(tmp_path),
    ])
    assert r.returncode == 0, r.stderr[-800:]
    assert (tmp_path / "case9" / "augmented_case9_0.pkl").exists()
    assert (tmp_path / "case9" / "prepared_case9.npz").exists()


def test_train_cli(tmp_path):
    data_dir = str(tmp_path / "data")
    run_cli(["gns_tpu.utils", "--case", "9", "--num", "8", "--seed", "1",
             "--data-dir", data_dir, "--no-pickles"])
    r = run_cli([
        "gns_tpu.train", "--cpu", "--case", "9", "--K", "2", "--latent", "4",
        "--hidden", "4", "--epochs", "2", "--batch-size", "4",
        "--nr-samples", "8", "--data-dir", data_dir,
        "--out-dir", str(tmp_path / "models"),
        "--runs-dir", str(tmp_path / "runs"), "--export-torch",
    ])
    assert r.returncode == 0, r.stderr[-800:]
    assert "done; best checkpoint" in r.stdout
    name = "best_model_c9_K2_L4_H4_True_optimAdam"
    assert (tmp_path / "models" / name).exists()  # Orbax dir
    assert (tmp_path / "models" / (name + ".pth")).exists()
    # CSV metrics written
    assert (tmp_path / "runs" / (name + ".csv")).exists()


def test_eval_cli(tmp_path):
    r = run_cli([
        "gns_tpu.eval", "--cpu", "--case", "9", "--K", "2", "--latent", "4",
        "--hidden", "4", "--samples", "3", "--from-base-case",
        "--plot", str(tmp_path / "p.png"),
        "--json-out", str(tmp_path / "m.json"),
    ])
    assert r.returncode == 0, r.stderr[-800:]
    m = json.loads((tmp_path / "m.json").read_text())
    assert "v_mse" in m and "theta_centered_mse" in m
    assert (tmp_path / "p.png").exists()


def test_eval_cli_fallback_without_pickles(tmp_path):
    """Out-of-box: with no datasets on disk, `python -m gns_tpu.eval` warns
    and falls back to in-memory grids instead of dying (the reference ships
    data/case14 so its eval runs on a fresh clone; we ship a generator)."""
    r = run_cli([
        "gns_tpu.eval", "--cpu", "--case", "9", "--K", "2", "--latent", "4",
        "--hidden", "4", "--samples", "3",
        "--data-dir", str(tmp_path / "nonexistent"),
        "--plot", str(tmp_path / "p.png"),
        "--json-out", str(tmp_path / "m.json"),
    ])
    assert r.returncode == 0, r.stderr[-800:]
    assert "falling back to --from-base-case" in r.stdout
    m = json.loads((tmp_path / "m.json").read_text())
    assert "v_mse" in m
    # the JSON records that these numbers came from generated grids
    assert m["fallback_from_base_case"] is True


def test_eval_cli_partial_dataset_errors(tmp_path):
    """A PARTIALLY present dataset (case dir exists, requested pickle
    missing — e.g. wrong --total-grids) is a real error, not a silent
    fallback onto different grids."""
    data_dir = str(tmp_path / "data")
    r0 = run_cli(["gns_tpu.utils", "--case", "9", "--num", "4", "--seed", "1",
                  "--data-dir", data_dir])
    assert r0.returncode == 0, r0.stderr[-800:]
    r = run_cli([
        "gns_tpu.eval", "--cpu", "--case", "9", "--K", "2", "--latent", "4",
        "--hidden", "4", "--samples", "3", "--data-dir", data_dir,
        "--total-grids", "100",
    ])
    assert r.returncode != 0
    assert "FileNotFoundError" in r.stderr


def test_train_cli_megabatch(tmp_path):
    """Mixed-case mega-batch training (BASELINE config #5) from the CLI."""
    r = run_cli([
        "gns_tpu.train", "--cpu", "--cases", "9", "14", "--K", "2",
        "--latent", "4", "--hidden", "4", "--epochs", "2",
        "--batch-size", "4", "--nr-samples", "8", "--paper-physics",
        "--out-dir", str(tmp_path / "models"),
        "--runs-dir", str(tmp_path / "runs"),
    ])
    assert r.returncode == 0, r.stderr[-800:]
    assert "mega-batch: " in r.stdout
    assert "done; best checkpoint" in r.stdout


def test_train_cli_resume(tmp_path):
    """--resume continues from an Orbax checkpoint (params+opt+step)."""
    data_dir = str(tmp_path / "data")
    run_cli(["gns_tpu.utils", "--case", "9", "--num", "8", "--seed", "1",
             "--data-dir", data_dir, "--no-pickles"])
    common = [
        "gns_tpu.train", "--cpu", "--case", "9", "--K", "2", "--latent", "4",
        "--hidden", "4", "--batch-size", "4", "--nr-samples", "8",
        "--data-dir", data_dir, "--out-dir", str(tmp_path / "models"),
        "--runs-dir", str(tmp_path / "runs"),
    ]
    r1 = run_cli(common + ["--epochs", "2"])
    assert r1.returncode == 0, r1.stderr[-800:]
    name = "best_model_c9_K2_L4_H4_True_optimAdam"
    ckpt = str(tmp_path / "models" / name)
    r2 = run_cli(common + ["--epochs", "2", "--resume", ckpt])
    assert r2.returncode == 0, r2.stderr[-800:]
    assert "resumed from" in r2.stdout and "at step 4" in r2.stdout
