#!/usr/bin/env python3
"""GraphQL composition-matrix parity gate (round-12; verdict item 6 — the
GraphQL twin of nlfuzz.py).

graft.GqlFuzz generates the full production × modifier matrix, asserts the
claim table (claimed ⇒ plans, unclaimed ⇒ loud rejection), runs every
claimed case through the GraphQL front-end on Spark and parquets the
results. This script replays each case's GENERATED DuckDB SQL over the same
fixtures — the SQL is generated from the same case spec as the GraphQL
string, so the two are independent paths to the same answer — and
hash-compares via check.py's canonical compare. Writes GQLFUZZ.json; exit 1
on any parity failure, unproducible claimed composition, or stale
(unclaimed-but-planning) claim row.

Usage: python3 scripts/gqlfuzz.py [sfDir] [outDir]
"""
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from check import compare_key, connect  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "target" / "gqlfuzz"
    print(f"[gqlfuzz] generating + planning + Spark leg ({sf_dir}) ...",
          flush=True)
    r = subprocess.run(
        ["scripts/run.sh", "graft.GqlFuzz", sf_dir, str(out_dir)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    sys.stderr.write("\n".join(
        ln for ln in r.stderr.splitlines() if ln.startswith("[gqlfuzz]")) + "\n")
    manifest_path = out_dir / "fuzz_manifest.json"
    if not manifest_path.is_file():
        print(r.stderr[-2000:])
        sys.exit(2)
    manifest = json.loads(manifest_path.read_text())

    con = connect(sf_dir)
    report, counts = {}, {}
    for name, info in sorted(manifest["questions"].items()):
        status = info["status"]
        if status == "translated":
            st, rows, msg = compare_key(
                con, name, str(out_dir / f"{name}.parquet"), info["sql"])
            report[name] = {"status": st, "rows": rows, "gql": info["gql"],
                            **({"msg": msg} if msg and st != "pass" else {})}
        else:
            report[name] = {"status": status, "gql": info["gql"]}
        counts[report[name]["status"]] = counts.get(report[name]["status"], 0) + 1

    bad = {k: v for k, v in report.items()
           if v["status"] in ("fail", "error", "unproducible",
                              "unclaimed_translated")}
    ok = not bad and r.returncode == 0
    Path(REPO, "GQLFUZZ.json").write_text(json.dumps(
        {"sf": sf_dir, "counts": counts, "ok": ok,
         "bad": {k: v for k, v in sorted(bad.items())},
         "questions": report}, indent=1))
    print(f"[gqlfuzz] {counts} ok={ok}")
    if bad:
        for k, v in sorted(bad.items())[:10]:
            print(f"[gqlfuzz]   BAD {k}: {v['status']}"
                  + (f" :: {v.get('msg', '')[:200]}" if v.get("msg") else ""))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
