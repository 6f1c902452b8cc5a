"""Fuzzy (approximate) string join -- entity resolution across tables.

Joins two tables on NOISY string keys (misspelled vendor names, OCR'd
titles, scraped entity mentions): character k-gram blocking generates
candidates, exact k-gram Jaccard verifies them.  The same
block-then-verify discipline as the dedup family, but as a JOIN between
two different tables rather than a self-join:

* each side explodes to distinct character k-grams -- one narrow
  (id, gram) stream per side, text never duplicated;
* candidates = pairs sharing ANY k-gram, via one equi-join on gram.
  Grams shared by more than ``max_gram_freq`` rows (the 'Customer#00'
  problem: a common prefix gram matches everything) are excluded from
  blocking and surfaced by :func:`gram_freq_audit` -- blocking recall
  then rests on the RARE grams, which is exactly where the signal is;
* verify: k-gram Jaccard over the FULL gram sets (the cap only prunes
  candidate generation, never the similarity value), kept at
  ``>= threshold``.

At corpus scale the shuffle carries (id, gram) int/short-string rows
and the verify join is candidate-driven -- never |A| x |B|.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .util import spread_input

DEFAULT_MAX_GRAM_FREQ = 1_000


def _grams(df: DataFrame, id_col: str, k: int) -> DataFrame:
    return (spread_input(df)
            .where(F.length("s") >= k)
            .select(id_col, F.explode(F.array_distinct(F.expr(
                f"transform(sequence(1, length(s) - {k - 1}), "
                f"i -> substring(s, i, {k}))"))).alias("gram")))


def gram_freq_audit(a: DataFrame, b: DataFrame, k: int = 3,
                    max_gram_freq: int = DEFAULT_MAX_GRAM_FREQ) -> DataFrame:
    """(gram, n) for blocking grams excluded by the frequency cap."""
    ga = _grams(a.select(F.col("id_a").alias("id"), "s"), "id", k)
    gb = _grams(b.select(F.col("id_b").alias("id"), "s"), "id", k)
    return (ga.unionByName(gb).groupBy("gram")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > max_gram_freq))


def trigram_join(a: DataFrame, b: DataFrame, threshold: float = 0.7,
                 k: int = 3,
                 max_gram_freq: int = DEFAULT_MAX_GRAM_FREQ) -> DataFrame:
    """(id_a, id_b, jaccard): pairs whose k-gram Jaccard >= threshold.

    ``a`` carries (id_a, s), ``b`` carries (id_b, s).  Exact w.r.t. the
    blocking cap: a true pair is missed only if EVERY shared gram is
    more frequent than ``max_gram_freq`` (enumerable via
    :func:`gram_freq_audit`).
    """
    ga = _grams(a, "id_a", k)
    gb = _grams(b, "id_b", k)
    na = ga.groupBy("id_a").agg(F.count("*").alias("n_a"))
    nb = gb.groupBy("id_b").agg(F.count("*").alias("n_b"))
    freq = (ga.unionByName(gb.select(F.col("id_b").alias("id_a"), "gram"))
            .groupBy("gram").agg(F.count("*").alias("_n")))
    ok = freq.where(F.col("_n") <= max_gram_freq).select("gram")
    cand = (ga.join(ok, "gram").join(gb.join(ok, "gram"), "gram")
            .select("id_a", "id_b").distinct())
    inter = (cand.join(ga, "id_a").join(gb, ["id_b", "gram"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("n_i")))
    return (inter.join(na, "id_a").join(nb, "id_b")
            .select("id_a", "id_b",
                    F.round(F.col("n_i")
                            / (F.col("n_a") + F.col("n_b") - F.col("n_i")),
                            6).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))
