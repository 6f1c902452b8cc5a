"""Fuzzy trigram join: python-set replication, one-to-one matching on
corrupted variants, frequency-cap behavior, short-string guard."""
import pytest

from terraspark.datapipe import fuzzy


def _df(spark, rows, idc):
    return spark.createDataFrame(rows, f"{idc} bigint, s string")


def _jac(x, y, k=3):
    gx = {x[i:i + k] for i in range(len(x) - k + 1)}
    gy = {y[i:i + k] for i in range(len(y) - k + 1)}
    return round(len(gx & gy) / len(gx | gy), 6)


def test_matches_python_sets(spark):
    a = [(0, "alpha mill 0"), (1, "bravo works 11"), (2, "echo corp 2")]
    b = [(10, "pha mill 0"), (11, "bravo works 11"), (12, "zzz qqq 9")]
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           fuzzy.trigram_join(_df(spark, a, "id_a"), _df(spark, b, "id_b"),
                              threshold=0.0).collect()}
    exp = {(ia, ib): _jac(sa, sb) for ia, sa in a for ib, sb in b
           if {sa[i:i + 3] for i in range(len(sa) - 2)}
           & {sb[i:i + 3] for i in range(len(sb) - 2)}}
    assert got == exp
    assert got[(1, 11)] == 1.0           # exact copy
    assert got[(0, 10)] > 0.7            # corrupted variant
    assert (2, 12) not in got            # no shared gram at all


def test_threshold_keeps_only_true_pairs(spark):
    a = [(i, f"entity number {i} of the registry") for i in range(8)]
    b = [(i, f"ntity number {i} of the registry") for i in range(8)]
    got = fuzzy.trigram_join(_df(spark, a, "id_a"), _df(spark, b, "id_b"),
                             threshold=0.85).collect()
    assert sorted((r["id_a"], r["id_b"]) for r in got) \
        == [(i, i) for i in range(8)]


def test_frequency_cap_and_audit(spark):
    a = [(i, f"shared prefix {i}") for i in range(4)]
    b = [(i, f"shared prefix {i}") for i in range(4)]
    # cap 1: every gram lives in >= 2 rows -> no blocking grams survive
    assert fuzzy.trigram_join(_df(spark, a, "id_a"), _df(spark, b, "id_b"),
                              max_gram_freq=1).count() == 0
    audit = fuzzy.gram_freq_audit(_df(spark, a, "id_a"),
                                  _df(spark, b, "id_b"), max_gram_freq=1)
    assert audit.count() > 0


def test_short_strings_emit_nothing(spark):
    a = [(0, "ab"), (1, "abcdef")]
    b = [(0, "ab"), (1, "abcdef")]
    got = fuzzy.trigram_join(_df(spark, a, "id_a"), _df(spark, b, "id_b"),
                             threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 1)]
