#!/usr/bin/env python3
"""Local differential checker mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [key ...]

For each result dir under <verifyOutDir>: load the Spark-written parquet,
run the matching oracle SQL (oracle_sql.json) in DuckDB against views over
the fixture tables, and compare schema + values exactly (columns sorted by
name, rows in emitted order — the strictest plausible driver behavior).

Also importable: `run_check(sf_dir, out_dir, only)` returns a per-key dict
of {"status": pass|fail|error|missing|no-oracle, "rows": n, "msg": ...} so
the edge-fixture harness (edgecheck.py) reuses the exact same compare.
"""
import json
import math
import re
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


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


# DuckDB OUTPUT types whose driver-side rendering diverges from the parquet
# write-back Spark produces: a HUGEINT sum renders as Decimal(...) where the
# Spark column is BIGINT. One uncast HUGEINT reached the round-7 driver
# before review caught it, and the type-tagged value compare below is blind
# to it on EMPTY results — so lint the oracle's declared result schema.
# Interior HUGEINT arithmetic (inside CTEs, cast down in the projection) is
# intentional overflow-safety and does not trip this.
_WIDE_TYPE = re.compile(r"^(U?HUGEINT|INT128|DECIMAL\b.*)$", re.IGNORECASE)


def lint_oracle(con, sql):
    """DESCRIBE the oracle and flag output columns whose DuckDB type is
    HUGEINT/DECIMAL — the repo convention is DOUBLE or BIGINT outputs
    (verify skill gotcha list), anything wider renders differently at the
    driver than in Spark's parquet write-back."""
    try:
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        return [f"describe failed: {str(e).splitlines()[0][:200]}"]
    return [f"output column {name} has wide type {ctype}"
            for name, ctype, *_ in cols if _WIDE_TYPE.match(ctype)]


def compare_key(con, key, result_dir, sql):
    """Compare one Spark result dir against its oracle SQL. Returns
    (status, rows, msg)."""
    try:
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{result_dir}/*.parquet')")
        s_cols = spark_rel.description
        s_rows = spark_rel.fetchall()
        duck_rel = con.execute(sql)
        d_cols = duck_rel.description
        d_rows = duck_rel.fetchall()
    except Exception as e:
        return "error", None, str(e).split("\n")[0][:300]
    s_names = [c[0] for c in s_cols]
    d_names = [c[0] for c in d_cols]
    msgs = []
    if sorted(s_names) != sorted(d_names):
        msgs.append(f"cols spark={s_names} duck={d_names}")
    elif len(s_rows) != len(d_rows):
        msgs.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
    else:
        s_ix = sorted(range(len(s_names)), key=lambda i: s_names[i])
        d_ix = sorted(range(len(d_names)), key=lambda i: d_names[i])
        for rn, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            sv = [canon(sr[i]) for i in s_ix]
            dv = [canon(dr[i]) for i in d_ix]
            if sv != dv:
                msgs.append(f"row {rn}: spark={sv} duck={dv}")
                if len(msgs) > 3:
                    break
    if msgs:
        return "fail", len(s_rows), " | ".join(msgs[:4])
    # dtype report (warn only — driver may or may not check)
    s_types = {c[0]: str(c[1]) for c in s_cols}
    d_types = {c[0]: str(c[1]) for c in d_cols}
    tmism = {k: (s_types[k], d_types.get(k)) for k in s_types
             if s_types[k] != d_types.get(k)}
    return "pass", len(s_rows), (f"TYPE-WARN {tmism}" if tmism else "")


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def run_check(sf_dir, out_dir, only=()):
    """Full differential pass. Returns {key: {status, rows, msg}}."""
    only = set(only)
    con = connect(sf_dir)
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = sorted(p for p in Path(out_dir).iterdir() if p.is_dir())
    present = {p.name for p in results}
    out = {}
    for key in sorted(set(oracle) - present):
        if not only or key in only:
            out[key] = {"status": "missing", "rows": None,
                        "msg": "no result dir (query failed in Verify?)"}
    for rd in results:
        key = rd.name
        if only and key not in only:
            continue
        if key not in oracle:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{rd}/*.parquet')"
                ).fetchone()[0]
                out[key] = {"status": "no-oracle", "rows": n, "msg": ""}
            except Exception as e:
                out[key] = {"status": "error", "rows": None,
                            "msg": str(e).split("\n")[0][:300]}
            continue
        status, rows, msg = compare_key(con, key, rd, oracle[key])
        out[key] = {"status": status, "rows": rows, "msg": msg}
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    res = run_check(sf_dir, out_dir, only)
    # oracle lint: wide-type rendering is a driver-only failure mode —
    # surface it here even when values compare equal
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    lint_con = connect(sf_dir)
    n_lint = 0
    for key in sorted(oracle):
        if only and key not in only:
            continue
        for m in lint_oracle(lint_con, oracle[key]):
            print(f"[LINT-FAIL] {key:24s} {m}")
            n_lint += 1
    n_pass = n_fail = 0
    label = {"pass": "PASS     ", "fail": "FAIL     ", "error": "ERROR    ",
             "missing": "MISSING  ", "no-oracle": "no-oracle"}
    for key in sorted(res):
        r = res[key]
        st = r["status"]
        if st == "pass":
            n_pass += 1
            extra = f"  {r['msg']}" if r["msg"] else ""
            print(f"[{label[st]}] {key:24s} rows={r['rows']}{extra}")
        elif st == "no-oracle":
            print(f"[{label[st]}] {key:24s} rows={r['rows']}")
        else:
            n_fail += 1
            print(f"[{label[st]}] {key:24s} {r['msg']}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_lint} lint")
    sys.exit(1 if (n_fail or n_lint) else 0)


if __name__ == "__main__":
    main()
