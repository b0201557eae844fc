#!/usr/bin/env python3
"""Local differential checker mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [key ...]

For each result dir under <verifyOutDir>: load the Spark-written parquet,
run the matching oracle SQL (oracle_sql.json) in DuckDB against views over
the fixture tables, and compare schema + values exactly (columns sorted by
name, rows in emitted order — the strictest plausible driver behavior).
"""
import json
import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb


def canon(v):
    # Type-tagged canonical form. Round 1 taught us (ADVICE.md) that the
    # driver's hash distinguishes Python Decimal (Spark parquet DECIMAL /
    # DuckDB HUGEINT) from float/int renderings, so a repr-only compare
    # passed locally while the driver failed. Tag the type class so any
    # decimal-vs-double or hugeint-vs-bigint divergence fails HERE first.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return f"Decimal({v})"
    if isinstance(v, bool):
        return f"bool({v})"
    if isinstance(v, int):
        return f"int({v})"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = sorted(p for p in Path(out_dir).iterdir() if p.is_dir())
    n_pass = n_fail = 0
    present = {p.name for p in results}
    for key in sorted(set(oracle) - present):
        if not only or key in only:
            print(f"[MISSING  ] {key:24s} no result dir (query failed in Verify?)")
            n_fail += 1
    for rd in results:
        key = rd.name
        if only and key not in only:
            continue
        if key not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{rd}/*.parquet')").fetchone()[0]
            print(f"[no-oracle] {key:24s} rows={n}")
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{rd}/*.parquet')")
            s_cols = spark_rel.description
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(oracle[key])
            d_cols = duck_rel.description
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"[ERROR    ] {key:24s} {e}")
            n_fail += 1
            continue
        s_names = [c[0] for c in s_cols]
        d_names = [c[0] for c in d_cols]
        ok = True
        msgs = []
        if sorted(s_names) != sorted(d_names):
            ok = False
            msgs.append(f"cols spark={s_names} duck={d_names}")
        elif len(s_rows) != len(d_rows):
            ok = False
            msgs.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        else:
            s_ix = sorted(range(len(s_names)), key=lambda i: s_names[i])
            d_ix = sorted(range(len(d_names)), key=lambda i: d_names[i])
            for rn, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                sv = [canon(sr[i]) for i in s_ix]
                dv = [canon(dr[i]) for i in d_ix]
                if sv != dv:
                    ok = False
                    msgs.append(f"row {rn}: spark={sv} duck={dv}")
                    if len(msgs) > 3:
                        break
        # dtype report (warn only — driver may or may not check)
        s_types = {c[0]: str(c[1]) for c in s_cols}
        d_types = {c[0]: str(c[1]) for c in d_cols}
        tmism = {k: (s_types[k], d_types.get(k)) for k in s_types
                 if s_types[k] != d_types.get(k)}
        if ok:
            n_pass += 1
            extra = f"  TYPE-WARN {tmism}" if tmism else ""
            print(f"[PASS     ] {key:24s} rows={len(s_rows)}{extra}")
        else:
            n_fail += 1
            print(f"[FAIL     ] {key:24s} " + " | ".join(msgs[:4]))
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
