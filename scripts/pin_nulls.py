#!/usr/bin/env python3
"""One-shot source rewriter: pin NULL ordering in every ORDER BY found
INSIDE a Scala string literal (the embedded oracle / shared SQL).

Spark defaults: ASC => NULLS FIRST, DESC => NULLS LAST. DuckDB defaults are
the opposite, so any ORDER BY on a nullable expression silently diverges the
moment a NULL appears (proven by the nulls edge-fixture variant). Appending
the explicit modifiers is a no-op on clean data in BOTH engines and in BOTH
dialects (shared syntax), so the rewrite is safe for shared-text SQL too.

The rewriter first extracts Scala string-literal regions (triple-quoted and
single-line, with or without the s-interpolator) and rewrites each literal's
content INDEPENDENTLY — an ORDER BY column list can never leak past the end
of its own literal (the failure mode of the naive first cut), and comments /
code are never touched.

Usage: python3 scripts/pin_nulls.py file.scala [...]   (in-place)
"""
import re
import sys

_TERM = re.compile(
    r"(\bROWS\b|\bRANGE\b|\bGROUPS\b|\bLIMIT\b|\bOFFSET\b|\bWINDOW\b|\bUNION\b|"
    r"\bEXCEPT\b|\bINTERSECT\b|\bFILTER\b|\bSEPARATOR\b|\bHAVING\b|\bQUALIFY\b)",
    re.IGNORECASE)

ORDER_BY = re.compile(r"\bORDER\s+BY\s+", re.IGNORECASE)


def string_regions(src):
    """Yield (start, end) of the CONTENT of each Scala string literal.
    Handles triple-quoted first (they may contain lone quotes), then
    single-line literals with escape handling. Comments are skipped."""
    regions = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        elif src.startswith('"""', i):
            j = src.find('"""', i + 3)
            if j < 0:
                break
            # Scala allows """ ... "" + closing: greedily absorb extra quotes
            while j + 3 < n and src[j + 3] == '"':
                j += 1
            regions.append((i + 3, j))
            i = j + 3
        elif c == '"':
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == '"' or src[j] == "\n":
                    break
                j += 1
            regions.append((i + 1, min(j, n)))
            i = min(j, n) + 1
        else:
            i += 1
    return regions


def split_top_level(s):
    parts, depth, cur, i, q = [], 0, [], 0, None
    while i < len(s):
        c = s[i]
        if q:
            cur.append(c)
            if c == q:
                q = None
        elif c == "'":
            q = c
            cur.append(c)
        elif c in "({[":
            depth += 1
            cur.append(c)
        elif c in ")}]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def pin_item(item):
    body = item.rstrip()
    trail = item[len(body):]
    if not body.strip():
        return item
    if re.search(r"\bNULLS\s+(FIRST|LAST)\b", body, re.IGNORECASE):
        return item
    if re.search(r"\bDESC\s*$", body, re.IGNORECASE):
        return body + " NULLS LAST" + trail
    if re.search(r"\bASC\s*$", body, re.IGNORECASE):
        return body + " NULLS FIRST" + trail
    return body + " NULLS FIRST" + trail


def find_list_end(s, start):
    """End of the ORDER BY column list within ONE string literal: stop at an
    unbalanced ')', a terminator keyword at depth 0, or end of literal."""
    depth, i, q = 0, start, None
    while i < len(s):
        c = s[i]
        if q:
            if c == q:
                q = None
            i += 1
            continue
        if c == "'":
            q = c
            i += 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                return i
            depth -= 1
        elif depth == 0:
            m = _TERM.match(s, i)
            if m and (i == 0 or not s[i - 1].isalnum()):
                return i
        i += 1
    return len(s)


def rewrite_literal(lit):
    out, pos, n = [], 0, 0
    while True:
        m = ORDER_BY.search(lit, pos)
        if not m:
            out.append(lit[pos:])
            break
        out.append(lit[pos:m.end()])
        end = find_list_end(lit, m.end())
        cols = lit[m.end():end]
        pinned = ",".join(pin_item(p) for p in split_top_level(cols))
        if pinned != cols:
            n += 1
        out.append(pinned)
        pos = end
    return "".join(out), n


def rewrite(src):
    pieces, last, total = [], 0, 0
    for a, b in string_regions(src):
        pieces.append(src[last:a])
        lit, n = rewrite_literal(src[a:b])
        total += n
        pieces.append(lit)
        last = b
    pieces.append(src[last:])
    return "".join(pieces), total


def main():
    for path in sys.argv[1:]:
        src = open(path).read()
        new, n = rewrite(src)
        if new != src:
            open(path, "w").write(new)
        print(f"{path}: {n} ORDER BY lists pinned")


if __name__ == "__main__":
    main()
