"""Oracle type hygiene: every ``oracle_sql()`` entry must produce an
Arrow schema free of DECIMAL / HUGEINT / float16 columns.

Why: DuckDB ``sum()`` over integer columns returns HUGEINT (int128),
which Arrow renders as ``decimal128(38, 0)`` and the driver's
normalizer then hashes differently from Spark's int64 — this exact
class of bug kept ``o22_truth_space`` red for three rounds (VERDICT.md
r3 "What's wrong" #1). Running the full query through ``.arrow()``
(not ``fetchall()``, which collapses HUGEINT to Python int) turns it
into a build-time failure.

Reference anchor: n/a (driver-harness hygiene, no splink counterpart).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _bad_fields(schema: pa.Schema) -> list[str]:
    bad = []
    for field in schema:
        t = field.type
        if (
            pa.types.is_decimal(t)
            or pa.types.is_float16(t)
            or str(t).startswith("decimal")
        ):
            bad.append(f"{field.name}: {t}")
    return bad


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_surface_has_no_decimal_columns(con, name):
    sql = entrymod.oracle_sql()[name]
    tbl = con.execute(sql).arrow()
    bad = _bad_fields(tbl.schema)
    assert not bad, (
        f"oracle {name!r} exposes non-hashable column types {bad}; "
        f"wrap integer sums in CAST(... AS BIGINT) — DuckDB sum() "
        f"returns HUGEINT which Arrow renders as decimal128 and the "
        f"driver hashes differently from Spark's int64"
    )


def test_all_queries_have_oracle_or_are_documented():
    """Every queries() entry should have an oracle; the known
    rows-only exceptions are listed explicitly so a silently dropped
    oracle shows up as a failure here."""
    qs = set(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())
    rows_only = qs - oracles
    # Non-SQL-expressible ops (documented in COVERAGE.md) may be
    # rows-only; keep this list tight.
    allowed = set()
    assert rows_only <= allowed, (
        f"queries without an oracle_sql entry: {sorted(rows_only)}"
    )
