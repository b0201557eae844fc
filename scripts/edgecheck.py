#!/usr/bin/env python3
"""Adversarial edge-fixture differential harness.

Derives hostile variants of the driver fixtures (graft.EdgeFixtures), runs
the UNCHANGED Verify + DuckDB compare against each, and writes EDGECHECK.json
— per-variant, per-key pass/fail. This attacks the clean-fixture blind spot
of the driver's gate: NULL ordering/arithmetic, empty inputs, single-row
inputs, duplicate keys.

Usage: python3 scripts/edgecheck.py [--skip-gen] [--variants v1,v2] [key ...]

Variants live in target/edgedata/<v>/, Verify output in target/edgeout/<v>/.
Exit 1 if any key on any variant is fail/error/missing.
"""
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from check import run_check  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
SRC_SF = "/root/testdata/sf0.001"
DATA = REPO / "target" / "edgedata"
OUT = REPO / "target" / "edgeout"
VARIANTS = ["nulls", "empty", "onerow", "dupkeys"]


def sh(args, env=None):
    e = dict(**__import__("os").environ)
    e.setdefault("SPARK_GRAFT_CPUS", "8")
    if env:
        e.update(env)
    r = subprocess.run(args, cwd=REPO, env=e,
                       stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    return r


def main():
    argv = sys.argv[1:]
    skip_gen = "--skip-gen" in argv
    argv = [a for a in argv if a != "--skip-gen"]
    variants = VARIANTS
    if argv and argv[0].startswith("--variants"):
        variants = argv[0].split("=", 1)[1].split(",")
        argv = argv[1:]
    keys = argv

    if not skip_gen:
        print(f"[edgecheck] generating variants from {SRC_SF} ...", flush=True)
        r = sh(["scripts/run.sh", "graft.EdgeFixtures", SRC_SF, str(DATA)])
        if r.returncode != 0:
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            sys.exit(2)

    report = {"src_sf": SRC_SF, "variants": {}}
    any_bad = False
    for v in variants:
        vdir, vout = DATA / v, OUT / v
        print(f"[edgecheck] Verify on variant '{v}' ...", flush=True)
        r = sh(["scripts/run.sh", "graft.Verify", str(vdir), str(vout)] + keys)
        verify_errs = [ln for ln in r.stderr.splitlines()
                       if ln.startswith("[verify]")]
        res = run_check(str(vdir), str(vout), keys)
        counts = {}
        for k, info in res.items():
            counts[info["status"]] = counts.get(info["status"], 0) + 1
        bad = {k: info for k, info in res.items()
               if info["status"] in ("fail", "error", "missing")}
        any_bad = any_bad or bool(bad)
        report["variants"][v] = {
            "counts": counts,
            "verify_stderr": verify_errs[:50],
            "bad": {k: {"status": i["status"], "msg": i["msg"]}
                    for k, i in sorted(bad.items())},
        }
        print(f"[edgecheck]   {v}: {counts}" +
              (f"  BAD={sorted(bad)[:12]}{'...' if len(bad) > 12 else ''}"
               if bad else ""), flush=True)

    report["ok"] = not any_bad
    Path(REPO, "EDGECHECK.json").write_text(json.dumps(report, indent=1))
    print(f"[edgecheck] wrote EDGECHECK.json ok={report['ok']}")
    sys.exit(1 if any_bad else 0)


if __name__ == "__main__":
    main()
