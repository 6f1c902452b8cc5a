"""Token-budget sequence packing for LLM pre-training corpora.

Pre-training consumes fixed-length token sequences; feeding one short
document per sequence wastes most of the context window, so corpus prep
packs documents into bins of at most ``budget`` tokens (GPT-3 / T5
"example packing").  The distributed shape here:

* one narrow projection computes whitespace token counts JVM-side
  (same tokenizer proxy as textstats.token_count);
* documents are salted into ``n_groups`` deterministic groups by
  ``doc_id % n_groups`` -- ONE hash shuffle of (grp, doc_id, n_tokens),
  the text column never moves;
* each group is packed independently with next-fit-decreasing (sort by
  tokens desc, open a new bin when the current one cannot take the next
  doc).  NFD is the standard streaming-friendly packing heuristic: it
  is O(g log g) per group, deterministic, and within 2x of optimal bin
  count (in practice ~1.1x for heavy-tailed doc lengths).

Scale: at corpus scale ``n_groups`` grows with the corpus so each group
stays a bounded ~10^5-doc task; packing quality is unaffected because
bins never help across groups anyway (a bin is a single training
sequence).  Global bin identity is the pair (grp, bin).  The in-group
loop runs over a pandas batch of 3 int64 columns -- no text, no Arrow
amplification.

Reference scope note: the reference engine has no packing operator;
this is part of the LLM-data-pipeline surface the brief adds on top of
SURVEY.md section 2.
"""
from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def pack_sequences(docs: DataFrame, budget: int = 256,
                   n_groups: int = 8) -> DataFrame:
    """Assign every document to a training-sequence bin.

    Returns (grp, doc_id, n_tokens, truncated, bin) -- one row per doc.
    ``n_tokens`` is capped at ``budget`` (a doc longer than one sequence
    is truncated, the standard corpus-prep behaviour) and ``truncated``
    flags the cap.  Deterministic: group = doc_id % n_groups, in-group
    order = (capped tokens DESC, doc_id ASC).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1: {budget}")
    raw = F.size(F.split(F.col("text"), " "))
    toks = docs.select(
        (F.col("doc_id") % n_groups).cast("int").alias("grp"),
        "doc_id",
        F.least(raw, F.lit(budget)).alias("n_tokens"),
        (raw > budget).alias("truncated"),
    )

    schema = ("grp int, doc_id bigint, n_tokens int, "
              "truncated boolean, bin int")

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True],
            kind="mergesort").reset_index(drop=True)
        bins, cur_bin, fill = [], 0, 0
        for nt in pdf["n_tokens"].to_numpy():
            if fill and fill + nt > budget:
                cur_bin += 1
                fill = 0
            fill += int(nt)
            bins.append(cur_bin)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        return pdf

    return toks.groupBy("grp").applyInPandas(_pack, schema)


def packing_stats(packed: DataFrame, budget: int = 256) -> DataFrame:
    """Fill-ratio audit per group: bins used, mean fill, waste fraction.

    One map-side-combined agg over the packed assignment (4 narrow
    columns); the audit a pipeline owner watches to tune ``budget``.
    """
    per_bin = packed.groupBy("grp", "bin").agg(
        F.sum("n_tokens").alias("fill"),
        F.count("*").alias("n_docs"))
    return (per_bin.groupBy("grp")
            .agg(F.count("*").alias("n_bins"),
                 F.sum("n_docs").alias("n_docs"),
                 F.round(F.avg(F.col("fill") / budget), 6)
                  .alias("mean_fill"),
                 F.round(1.0 - F.sum("fill") / (F.count("*") * budget), 6)
                  .alias("waste"))
            .orderBy("grp"))
