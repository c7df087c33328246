"""Freeze-procedure guard (round-14 verdict ask #1): refuse an end-of-round
commit that ships a gate artifact contradicting its own claim.

Round 14's blemish: commit f00fa20 carried an ADVERSARIAL_r14.json recording
n_fail=1 (dedup_keep_first) while the commit message — and the same commit's
code — claimed 144/144 × six gates. The artifact was pre-fix; the claim was
post-fix; the audit chain broke. This guard makes that structurally
impossible: run it as the LAST step before the freeze commit and it exits
non-zero if ANY tracked-or-staged gate JSON records a failure or a live
local attestation/bench artifact is stale relative to the code it attests.

Checks (all over the CURRENT worktree, i.e. exactly what the commit ships):
  1. every ADVERSARIAL_*.json of the CURRENT round has n_fail == 0 and
     n_ok == n_queries;
  2. every CORRECTNESS_local_r{N}_*.json of the current round has zero
     entries with ok=false / match=false;
  3. no gate artifact of the current round is older (mtime) than the newest
     tracked package source file — an artifact generated before the last
     code edit attests the WRONG code and must be regenerated.

Usage: python tools/freeze_guard.py --round 15   (exit 0 = safe to commit)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _fail(msgs: list[str], msg: str) -> None:
    msgs.append(msg)
    print(f"FREEZE-GUARD FAIL: {msg}")


def check(round_no: int, check_staleness: bool = True) -> int:
    failures: list[str] = []
    tag = f"r{round_no:02d}" if (REPO / f"ADVERSARIAL_r{round_no:02d}.json").exists() else f"r{round_no}"

    adversarial = sorted(REPO.glob(f"ADVERSARIAL_{tag}*.json"))
    locals_ = sorted(REPO.glob(f"CORRECTNESS_local_{tag}_*.json"))
    if not adversarial:
        _fail(failures, f"no ADVERSARIAL_{tag}*.json artifacts found — gates not run")
    for p in adversarial:
        d = json.loads(p.read_text())
        n_fail = d.get("n_fail")
        n_ok = d.get("n_ok")
        n_q = d.get("n_queries")
        if n_fail != 0 or (n_ok is not None and n_q is not None and n_ok != n_q):
            _fail(
                failures,
                f"{p.name}: n_fail={n_fail}, n_ok={n_ok}/{n_q} — a failing gate "
                f"artifact must NEVER ride a freeze commit; fix the query or "
                f"regenerate the artifact on the fixed code",
            )
    for p in locals_:
        d = json.loads(p.read_text())
        rows = d.get("queries", d if isinstance(d, dict) else {})
        bad = [
            k
            for k, v in rows.items()
            if isinstance(v, dict) and not v.get("ok", v.get("match", True))
        ]
        if bad:
            _fail(failures, f"{p.name}: failing rows {bad[:5]}")

    if check_staleness and not failures:
        # newest tracked source file vs oldest current-round artifact
        tracked = subprocess.run(
            ["git", "ls-files", "zarr_climate_etl_ipfs_spark", "__spark_entry__.py"],
            capture_output=True,
            text=True,
            cwd=REPO,
        ).stdout.split()
        src_mtimes = [(REPO / f).stat().st_mtime for f in tracked if (REPO / f).exists()]
        newest_src = max(src_mtimes) if src_mtimes else 0.0
        for p in adversarial + locals_:
            if p.stat().st_mtime < newest_src:
                _fail(
                    failures,
                    f"{p.name} predates the newest package source edit — it "
                    f"attests code this commit does not ship; regenerate it "
                    f"on the final code before freezing",
                )

    if failures:
        print(f"\n{len(failures)} freeze-guard failure(s) — DO NOT COMMIT the freeze.")
        return 1
    print(
        f"freeze-guard OK: {len(adversarial)} adversarial + {len(locals_)} local "
        f"attestation artifact(s) for round {round_no} are green and current."
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--no-staleness",
        action="store_true",
        help="skip the artifact-vs-source mtime check (CI checkouts flatten mtimes)",
    )
    a = ap.parse_args()
    return check(a.round, check_staleness=not a.no_staleness)


if __name__ == "__main__":
    sys.exit(main())
