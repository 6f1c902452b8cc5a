"""Oracle result-type meta-test (VERDICT r4 item 1).

The driver's value hash is TYPE-sensitive: a DuckDB aggregate that widens
past int64 (SUM(BIGINT) -> HUGEINT, integer AVG paths -> DECIMAL) lands in
pandas as float64/object and hash-mismatches Spark's int64 even when every
value is bit-identical — exactly the rel_json_extract red row in
CORRECTNESS_r04.json.  This test runs EVERY oracle_sql() entry on DuckDB
at sf0.001 and asserts no result column carries a pandas-lossy DuckDB type
(HUGEINT / UHUGEINT / DECIMAL), catching the whole class statically —
no Spark session needed.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# DuckDB logical types whose pandas materialization diverges from the
# int64/float64/str lattice the Spark side produces.
_LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _oracles():
    import __spark_entry__ as E
    return sorted(E.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_result_types_hashable(oracle_con, name, sql):
    rel = oracle_con.sql(sql)
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if any(str(t).upper().startswith(p) for p in _LOSSY)]
    assert not bad, (
        f"oracle {name} produces pandas-lossy DuckDB types {bad}; wrap the "
        f"aggregate in CAST(... AS BIGINT/DOUBLE) so the driver hash can "
        f"match Spark (see rel_json_extract, CORRECTNESS_r04)")
