"""tools/freeze_guard.py — the audit-chain guard added after the r14 blemish
(a committed gate artifact recorded a failure while the same commit claimed
144/144). Pure-filesystem tests against a scratch repo layout."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import freeze_guard  # noqa: E402


def _setup(tmp_path, monkeypatch):
    monkeypatch.setattr(freeze_guard, "REPO", tmp_path)
    pkg = tmp_path / "zarr_climate_etl_ipfs_spark"
    pkg.mkdir()
    (pkg / "mod.py").write_text("x = 1\n")
    return tmp_path


def _gate(tmp_path, name: str, n_fail: int, n_ok: int = 144, n_q: int = 144):
    (tmp_path / name).write_text(
        json.dumps({"n_fail": n_fail, "n_ok": n_ok, "n_queries": n_q})
    )


def test_green_artifacts_pass(tmp_path, monkeypatch):
    _setup(tmp_path, monkeypatch)
    _gate(tmp_path, "ADVERSARIAL_r15.json", 0)
    _gate(tmp_path, "ADVERSARIAL_r15_empty.json", 0)
    (tmp_path / "CORRECTNESS_local_r15_sf001.json").write_text(
        json.dumps({"queries": {"q1": {"ok": True}}})
    )
    assert freeze_guard.check(15, check_staleness=False) == 0


def test_failing_gate_blocks_commit(tmp_path, monkeypatch):
    """The r14 blemish scenario: a gate JSON with n_fail=1 next to a
    would-be 144/144 claim must refuse the freeze."""
    _setup(tmp_path, monkeypatch)
    _gate(tmp_path, "ADVERSARIAL_r15.json", 1, n_ok=143)
    assert freeze_guard.check(15, check_staleness=False) == 1


def test_nok_mismatch_blocks(tmp_path, monkeypatch):
    _setup(tmp_path, monkeypatch)
    _gate(tmp_path, "ADVERSARIAL_r15.json", 0, n_ok=143, n_q=144)
    assert freeze_guard.check(15, check_staleness=False) == 1


def test_missing_artifacts_block(tmp_path, monkeypatch):
    _setup(tmp_path, monkeypatch)
    assert freeze_guard.check(15, check_staleness=False) == 1


def test_failing_local_row_blocks(tmp_path, monkeypatch):
    _setup(tmp_path, monkeypatch)
    _gate(tmp_path, "ADVERSARIAL_r15.json", 0)
    (tmp_path / "CORRECTNESS_local_r15_sf001.json").write_text(
        json.dumps({"queries": {"q1": {"ok": True}, "q2": {"ok": False}}})
    )
    assert freeze_guard.check(15, check_staleness=False) == 1


def test_stale_artifact_blocks(tmp_path, monkeypatch):
    """An artifact older than the newest tracked source attests code the
    commit does not ship — must refuse (this is exactly how the r14 stale
    ADVERSARIAL_r14.json rode into the snapshot commit)."""
    import subprocess

    _setup(tmp_path, monkeypatch)
    subprocess.run(["git", "init", "-q"], cwd=tmp_path, check=True)
    subprocess.run(
        ["git", "add", "zarr_climate_etl_ipfs_spark/mod.py"], cwd=tmp_path, check=True
    )
    _gate(tmp_path, "ADVERSARIAL_r15.json", 0)
    old = time.time() - 100
    os.utime(tmp_path / "ADVERSARIAL_r15.json", (old, old))
    # source newer than artifact → stale → block
    (tmp_path / "zarr_climate_etl_ipfs_spark" / "mod.py").write_text("x = 2\n")
    assert freeze_guard.check(15) == 1
    # regenerate the artifact after the edit → pass
    _gate(tmp_path, "ADVERSARIAL_r15.json", 0)
    assert freeze_guard.check(15) == 0
