#!/usr/bin/env python3
"""NL composition-matrix parity gate (round-11; verdict item 8).

graft.NlFuzz generates the full production × modifier matrix, asserts the
claim table (claimed ⇒ translates, unclaimed ⇒ loud rejection), runs every
claimed question's SQL on Spark and parquets the results. This script
replays each translated SQL string in DuckDB over the same fixtures — the
translated SQL IS the oracle, the same discipline as the nl_* correctness
keys — and hash-compares via check.py's canonical compare. Writes
NLFUZZ.json; exit 1 on any parity failure, unproducible claimed
composition, or stale (unclaimed-but-translating) claim row.

Usage: python3 scripts/nlfuzz.py [sfDir] [outDir]
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
    out_dir = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "target" / "nlfuzz"
    print(f"[nlfuzz] generating + translating + Spark leg ({sf_dir}) ...",
          flush=True)
    r = subprocess.run(
        ["scripts/run.sh", "graft.NlFuzz", sf_dir, str(out_dir)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    sys.stderr.write("\n".join(
        ln for ln in r.stderr.splitlines() if ln.startswith("[nlfuzz]")) + "\n")
    manifest_path = out_dir / "fuzz_manifest.json"
    if not manifest_path.is_file():
        print(r.stderr[-2000:])
        sys.exit(2)
    manifest = json.loads(manifest_path.read_text())

    con = connect(sf_dir)
    # round 15: the registered-dataset productions translate over the
    # dynamic name reg_nations (NlFuzz.main registers nation.parquet
    # under it); mirror the registration as a DuckDB view
    con.execute("CREATE VIEW reg_nations AS SELECT * FROM nation")
    report, counts = {}, {}
    for name, info in sorted(manifest["questions"].items()):
        status = info["status"]
        if status == "translated":
            st, rows, msg = compare_key(
                con, name, str(out_dir / f"{name}.parquet"), info["sql"])
            report[name] = {"status": st, "rows": rows,
                            "question": info["question"],
                            **({"msg": msg} if msg and st != "pass" else {})}
        else:
            report[name] = {"status": status, "question": info["question"]}
        counts[report[name]["status"]] = counts.get(report[name]["status"], 0) + 1

    bad = {k: v for k, v in report.items()
           if v["status"] in ("fail", "error", "unproducible",
                              "unclaimed_translated")}
    ok = not bad and r.returncode == 0
    Path(REPO, "NLFUZZ.json").write_text(json.dumps(
        {"sf": sf_dir, "counts": counts, "ok": ok,
         "bad": {k: v for k, v in sorted(bad.items())},
         "questions": report}, indent=1))
    print(f"[nlfuzz] {counts} ok={ok}")
    if bad:
        for k, v in sorted(bad.items())[:10]:
            print(f"[nlfuzz]   BAD {k}: {v['status']} — {v['question']}"
                  + (f" :: {v.get('msg', '')[:200]}" if v.get("msg") else ""))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
