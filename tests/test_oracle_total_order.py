"""Mechanical total-order audit of every LIMIT-bearing oracle
(VERDICT r13 task 3).

The driver's correctness gate hashes result values order-insensitively,
so a non-total ORDER BY under a LIMIT passes *until* the limit boundary
cuts a tie group — then the two engines can select different row
MULTISETS and the hash goes flaky (found live by the r13 judge
co-execution: f3_math's ``ORDER BY 1,2 LIMIT 500`` over fixtures with
duplicate ``(l_orderkey, l_linenumber)`` pairs).

For each registered oracle whose top-level query ends in LIMIT, this
audit enforces (via DuckDB on the sf0.001 fixtures — no Spark needed):

1. a top-level ORDER BY exists before the LIMIT;
2. every sort key is a positional reference or a bare identifier
   (expressions would evade the coverage check);
3. determinism at the boundary: the output-column subset of the sort
   keys either COVERS every output column (ties are then whole-row
   identical — interchangeable under any cut) or is UNIQUE over the
   un-limited result (the LIMIT then selects one well-defined set).
   Keys naming non-output columns (e.g. a pre-rounding raw sort helper
   like x13's ``sim_raw``) are fine as extra tiebreakers but count for
   nothing here — determinism must not rest on cross-engine float
   identity of a column the hash never sees.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tests.conftest import SF_TEST

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _top_level_positions(sql: str) -> dict[int, int]:
    """Map char offset -> paren depth, skipping string literals."""
    depth, out, i = 0, {}, 0
    while i < len(sql):
        c = sql[i]
        if c == "'":
            j = sql.find("'", i + 1)
            i = (j if j != -1 else len(sql) - 1) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        out[i] = depth
        i += 1
    return out


def _last_top_level(sql: str, pattern: str, before: int | None = None):
    pos = _top_level_positions(sql)
    last = None
    for m in re.finditer(pattern, sql.upper()):
        if pos.get(m.start(), 1) == 0 and (before is None or m.start() < before):
            last = m
    return last


def _split_top_commas(s: str) -> list[str]:
    parts, depth, cur, i = [], 0, [], 0
    while i < len(s):
        c = s[i]
        if c == "'":
            j = s.find("'", i + 1)
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        if c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def _clean_key(k: str) -> str:
    k = re.sub(r"\s+(ASC|DESC)\b", "", k, flags=re.I)
    return re.sub(r"\s+NULLS\s+(FIRST|LAST)\b", "", k, flags=re.I).strip()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for n in TABLES:
        c.execute(f"CREATE VIEW {n} AS SELECT * FROM '{SF_TEST}/{n}.parquet'")
    return c


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as mod

    return mod.oracle_sql()


def test_every_limit_oracle_has_deterministic_boundary(con, oracles):
    failures = []
    audited = 0
    for name, sql in sorted(oracles.items()):
        lim = _last_top_level(sql, r"\bLIMIT\b")
        if lim is None:
            continue
        audited += 1
        ob = _last_top_level(sql, r"\bORDER\s+BY\b", before=lim.start())
        if ob is None:
            failures.append(f"{name}: top-level LIMIT without ORDER BY")
            continue
        keys = [_clean_key(k) for k in _split_top_commas(sql[ob.end() : lim.start()])]
        cols = [d[0] for d in con.execute("DESCRIBE " + sql).fetchall()]
        covered: set[str] = set()
        bad_keys = []
        for k in keys:
            if re.fullmatch(r"\d+", k):
                idx = int(k) - 1
                if 0 <= idx < len(cols):
                    covered.add(cols[idx])
                else:
                    bad_keys.append(k)
            elif re.fullmatch(r"[A-Za-z_][A-Za-z_0-9]*", k):
                match = [c for c in cols if c.lower() == k.lower()]
                if match:
                    covered.add(match[0])
                # a bare identifier binding only in the inner scope
                # (raw sort helper) is allowed but counts for nothing
            else:
                bad_keys.append(k)
        if bad_keys:
            failures.append(f"{name}: non-identifier sort keys {bad_keys}")
            continue
        if set(cols) <= covered:
            continue  # full output coverage: any tie is whole-row equal
        # otherwise the covered keys must be UNIQUE over the
        # un-limited result — the LIMIT then cuts nothing ambiguous
        inner = sql[: ob.start()]
        key_list = ", ".join(f'"{c}"' for c in sorted(covered)) or "1"
        dup = con.execute(
            f"SELECT count(*) FROM (SELECT {key_list} FROM ({inner}) sub "
            f"GROUP BY {key_list} HAVING count(*) > 1)"
        ).fetchone()[0]
        if dup:
            failures.append(
                f"{name}: sort keys {sorted(covered)} have {dup} duplicate "
                f"groups and do not cover outputs {sorted(set(cols) - covered)}"
            )
    assert audited > 0  # the audit must actually bite
    assert not failures, "\n".join(failures)
