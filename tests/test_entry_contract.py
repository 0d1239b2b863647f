"""Driver-contract invariants for __spark_entry__.py (no Spark jobs).

The correctness harness evaluates AT MOST the first 50 queries() keys
(round-4: entries 51-52 — the two relational probes — were silently
dropped from CORRECTNESS_r04.json). Pin the cap, the key alignment,
and the oracle column-alias rule's precondition (every oracle is
plain text the driver can hand to DuckDB).
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entry

HARNESS_QUERY_CAP = 50


def test_queries_fit_harness_cap():
    qs = entry.queries()
    assert len(qs) <= HARNESS_QUERY_CAP, (
        f"{len(qs)} queries() entries > {HARNESS_QUERY_CAP}: the driver "
        "evaluates only the first 50, silently dropping the rest "
        "(round-4 VERDICT Missing #1) — merge near-duplicate probes "
        "instead of exceeding the cap"
    )


def test_every_query_has_an_oracle():
    qs, oq = entry.queries(), entry.oracle_sql()
    missing = [k for k in qs if k not in oq]
    extra = [k for k in oq if k not in qs]
    assert not missing, f"queries without oracle_sql twins: {missing}"
    assert not extra, f"oracle_sql keys without queries() entries: {extra}"


def test_oracles_are_nonempty_sql_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "select" in sql.lower(), name
