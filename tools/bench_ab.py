#!/usr/bin/env python
"""Bench ambient-noise discriminator (promoted to a tool in r14,
VERDICT r13 item 7).

The r13 question this settles: when the whole bench band inflates
uniformly (every query +10-25%, plans audited clean, no commit touched
them), is it a regression or ambient load? The decisive instrument —
used ad hoc in r13, codified here — is an A/B against a PRIOR round's
code under TODAY's conditions: check the reference commit out into a
temporary `git worktree`, run the same bench.py protocol there and at
HEAD back-to-back (interleaved, so slow ambient drift hits both arms),
and compare pairwise. If ref-code-today reads like HEAD-today but
above its own recorded round number, the inflation is ambient; if
HEAD-today reads above ref-code-today, it is real.

Usage:
    python tools/bench_ab.py <ref-commit> [--runs N] [--sf DIR]
    # e.g.  python tools/bench_ab.py 22810b8 --runs 2

Emits ONE JSON line:
    {"ref": ..., "head": ..., "sf": ..., "runs": N,
     "head_totals": [...], "ref_totals": [...],
     "head_queries": {q: [secs...]}, "ref_queries": {q: [secs...]},
     "verdict_hint": "ambient|regression|mixed"}

Each arm runs in its own fresh subprocess JVM (the solo fresh-JVM
probe discipline); arms alternate HEAD, ref, HEAD, ref, ... The
worktree is removed on exit. Internal evidence only.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_bench(tree: Path, sf_dir: str | None) -> dict:
    env = dict(os.environ)
    if sf_dir:
        env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, str(tree / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tree),
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        return json.loads(line)
    except Exception as exc:  # noqa: BLE001
        raise RuntimeError(
            f"bench at {tree} produced no JSON line: {exc}\n"
            f"stdout tail: {out.stdout[-500:]}\nstderr tail: {out.stderr[-500:]}"
        ) from exc


def main() -> int:
    argv = sys.argv[1:]
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    ref = argv[0]
    runs = 1
    sf_dir = None
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]

    ref_sha = subprocess.run(
        ["git", "rev-parse", "--short", ref],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        check=True,
    ).stdout.strip()
    head_sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=str(REPO),
        check=True,
    ).stdout.strip()

    wt = Path(tempfile.mkdtemp(prefix=f"bench_ab_{ref_sha}_"))
    shutil.rmtree(wt, ignore_errors=True)  # worktree add wants a fresh path
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), ref_sha],
        cwd=str(REPO),
        check=True,
        capture_output=True,
    )
    try:
        head_totals, ref_totals = [], []
        head_queries: dict[str, list] = {}
        ref_queries: dict[str, list] = {}
        for i in range(runs):
            # interleave the arms so ambient drift hits both equally
            for arm, tree, totals, queries in (
                ("head", REPO, head_totals, head_queries),
                ("ref", wt, ref_totals, ref_queries),
            ):
                art = run_bench(tree, sf_dir)
                totals.append(art.get("value"))
                for q, s in (art.get("queries") or {}).items():
                    queries.setdefault(q, []).append(s)
                print(
                    f"  run {i + 1}/{runs} {arm}: total={art.get('value')}",
                    file=sys.stderr,
                )

        hint = "mixed"
        hv = [v for v in head_totals if v is not None]
        rv = [v for v in ref_totals if v is not None]
        if hv and rv:
            hmin, rmin = min(hv), min(rv)
            if hmin <= rmin * 1.05:
                hint = "ambient"  # HEAD is not slower than ref-code-today
            elif hmin > rmin * 1.15:
                hint = "regression"
        print(
            json.dumps(
                {
                    "ref": ref_sha,
                    "head": head_sha,
                    "sf": sf_dir or os.environ.get(
                        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                    ),
                    "runs": runs,
                    "head_totals": head_totals,
                    "ref_totals": ref_totals,
                    "head_queries": head_queries,
                    "ref_queries": ref_queries,
                    "verdict_hint": hint,
                }
            )
        )
        return 0
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=str(REPO),
            capture_output=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
