#!/usr/bin/env python3
"""Gate-sensitivity (mutation) audit.

Runs graft.MutantVerify — deliberately-broken variants of ~20 representative
SparkEntry.queries keys (MutantQueries.scala: boundary off-by-ones, window
frame off-by-ones, dropped tie-breaks, swapped NULL ordering, truncated dim
loops, wrong denominators, dropped dedup keys) — against the fixture that
makes each defect observable (clean sf0.001, or an EdgeFixtures hostile
variant), then runs the UNCHANGED scripts/check.py compare and requires it
to FAIL every mutant. A mutant the gate passes ("survived") is a proven
blind spot: the oracle mirrors the bug or the fixture lacks the triggering
shape. Writes MUTCHECK.json.

Usage: python3 scripts/mutcheck.py [--skip-gen]
  --skip-gen  reuse target/edgedata variants (else regenerates them)
"""
import json
import os
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from check import run_check  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
# sf0.01, not sf0.001: boundary mutants need the boundary INSTANT occupied
# (at sf0.001's ~2.6 rows/day, the flagship's exact cutoff day is empty
# even on the day-gridded ties variant; at sf0.01's ~26/day it never is)
CLEAN = "/root/testdata/sf0.01"
EDGE = REPO / "target" / "edgedata01"
OUT = REPO / "target" / "mutout"

# fixture -> mutant keys, kept in sync with MutantQueries.scala by the
# harness itself: MutantVerify prints nothing structured, so the grouping
# is re-parsed from the Scala source (single source of truth).
def mutant_fixtures():
    src = (REPO / "src/main/scala/graft/MutantQueries.scala").read_text()
    import re
    groups = {}
    # Mutant("key", "class", "desc", "fixture", ...) — desc may span lines
    for m in re.finditer(
            r'Mutant\("([^"]+)",\s*"([^"]+)",\s*"[^"]*",\s*"(\w+)"', src):
        key, clazz, fixture = m.group(1), m.group(2), m.group(3)
        groups.setdefault(fixture, []).append((key, clazz))
    return groups


def sh(args):
    e = dict(os.environ)
    e.setdefault("SPARK_GRAFT_CPUS", "8")
    return subprocess.run(args, cwd=REPO, env=e,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True)


def main():
    skip_gen = "--skip-gen" in sys.argv
    groups = mutant_fixtures()
    need_edge = [f for f in groups if f != "clean"]
    if need_edge and not skip_gen:
        missing = [f for f in need_edge if not (EDGE / f).is_dir()]
        if missing:
            print(f"[mutcheck] generating edge variants ({missing}) ...",
                  flush=True)
            r = sh(["scripts/run.sh", "graft.EdgeFixtures", CLEAN, str(EDGE)])
            if r.returncode != 0:
                print(r.stderr[-3000:])
                sys.exit(2)

    report = {"mutants": {}, "survived": []}
    for fixture, keys in sorted(groups.items()):
        fdir = CLEAN if fixture == "clean" else str(EDGE / fixture)
        odir = OUT / fixture
        knames = [k for k, _ in keys]
        print(f"[mutcheck] {fixture}: {knames}", flush=True)
        r = sh(["scripts/run.sh", "graft.MutantVerify", fdir, str(odir)]
               + knames)
        if r.returncode != 0:
            print(r.stdout[-2000:])
            print(r.stderr[-2000:])
            sys.exit(2)
        # results are keyed (key, class): a key may carry several planted
        # defects, and key-only output dirs would overwrite (round 10)
        mnames = [f"{k}__{c}" for k, c in keys]
        res = run_check(fdir, str(odir), mnames)
        for key, clazz in keys:
            info = res.get(f"{key}__{clazz}",
                           {"status": "missing", "msg": "no result"})
            # 'missing' means the mutant crashed before writing output
            # (MutantVerify swallows the exception) — that is an infra
            # failure, NOT gate sensitivity: a kill requires the mutant to
            # have produced output the unchanged compare REJECTED
            # (round-9 ADVICE; 'missing' used to be credited as killed)
            status = "did-not-run" if info["status"] == "missing" \
                else info["status"]
            killed = status in ("fail", "error")
            report["mutants"][f"{key}:{clazz}"] = {
                "class": clazz, "fixture": fixture,
                "gate": status,
                "killed": killed,
                "msg": (info.get("msg") or "")[:200],
            }
            if status == "did-not-run":
                report.setdefault("did_not_run", []).append(f"{key}:{clazz}")
            elif not killed:
                report["survived"].append(f"{key}:{clazz}")
            print(f"[mutcheck]   {key:22s} {clazz:22s} "
                  f"{'KILLED' if killed else status.upper()} ({status})",
                  flush=True)

    report["ok"] = not report["survived"] and not report.get("did_not_run")
    Path(REPO, "MUTCHECK.json").write_text(json.dumps(report, indent=1))
    n = len(report["mutants"])
    n_killed = sum(1 for v in report["mutants"].values() if v["killed"])
    print(f"[mutcheck] {n_killed}/{n} mutants killed; "
          f"survivors: {report['survived'] or 'none'}; "
          f"did-not-run: {report.get('did_not_run') or 'none'}")
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
