"""Driver-contract simulation: every queries() entry vs its oracle_sql()
via DuckDB at sf0.01 -- row count, schema (column names), and value match
(exact for ints/strings/bools, 1e-9 for floats after both sides' rounding).
"""
import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(int)
        else:
            try:
                df[c] = df[c].astype("int64")
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ALL = sorted(E.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, duck, name):
    qs = E.queries()
    oracles = E.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        # rows-only contract (driver's weaker check for ops whose outputs
        # are not hash-stable, e.g. ill-conditioned local regressions)
        assert len(got) > 0, f"{name}: empty result"
        return
    exp = duck.sql(oracles[name]).df()
    assert sorted(c.lower() for c in got.columns) == \
        sorted(c.lower() for c in exp.columns), \
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        if np.issubdtype(g[c].dtype, np.floating):
            ok = np.isclose(g[c].to_numpy(), e[c].to_numpy(),
                            atol=1e-9, rtol=0, equal_nan=True)
        else:
            ok = (g[c].to_numpy() == e[c].to_numpy())
        if not ok.all():
            bad = np.where(~ok)[0][:5]
            raise AssertionError(
                f"{name}.{c}: {len(bad)} mismatches, e.g. "
                f"{g[c].iloc[bad].tolist()} vs {e[c].iloc[bad].tolist()}")


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"image_id", "band", "method", "n_valid", "mean_px"} <= \
        set(df.columns)


def test_registry_priority_ordering():
    """Every observed driver correctness sample is a prefix of the
    registry, so the head must be (in order): queries with NO verdict in
    any committed report (streaming block + this round's additions),
    then the historical red row, then previously-green queries
    oldest-verdict-first; every query must have an oracle entry or be a
    documented rows-only op; and the oracle keys must be a subset of
    the registry."""
    q = E.queries()
    names = list(q)
    front = [n for n in E.NEVER_VERDICTED if n in q]
    assert names[:len(front)] == front
    import json
    hash_green = set()
    any_row = set()
    for r in (1, 2, 3, 4):
        p = os.path.join(os.path.dirname(E.__file__),
                         f"CORRECTNESS_r0{r}.json")
        if not os.path.exists(p):
            continue
        rep = json.load(open(p))
        for k, v in rep.items():
            if not isinstance(v, dict):
                continue
            any_row.add(k)
            if v.get("rows_match") and v.get("schema_match") \
                    and v.get("hash_match", True) and v.get("err") is None:
                hash_green.add(k)
    # the strictly-never-verdicted block (streaming + new registrations)
    # must have NO row of any kind in the committed reports
    strict = [n for n in (E._NEVER_VERDICTED + E._NEW_R5) if n in q]
    assert not (set(strict) & any_row), sorted(set(strict) & any_row)
    # the red block has rows but never a hash-green one
    assert not (set(E._ONLY_RED) & hash_green), \
        sorted(set(E._ONLY_RED) & hash_green)
    assert set(E._ONLY_RED) <= any_row
    # everything behind the priority list has a green verdict already
    assert set(names[len(front):]) <= hash_green, \
        sorted(set(names[len(front):]) - hash_green)
    # and the re-verification tail is ordered oldest-first: every
    # r2-era name precedes every r3-era name in the registry
    pos = {n: i for i, n in enumerate(names)}
    r2max = max(pos[n] for n in E._GREEN_R2 if n in pos)
    r3min = min(pos[n] for n in E._GREEN_R3 if n in pos)
    assert r2max < r3min
    o = E.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    # rows-only ops (no closed-form SQL) are the documented exceptions
    rows_only = {n for n in q if n not in o}
    assert rows_only <= {"img_stream_correct"}, sorted(rows_only)
