"""k-means determinism + improvement; corpus filter composition."""
import pytest


def test_kmeans_deterministic_and_improving(spark):
    from terraspark.datapipe.clustering import kmeans
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a1 = kmeans(emb, k=4, iters=3).toPandas().sort_values("vec_id") \
        .reset_index(drop=True)
    a2 = kmeans(emb, k=4, iters=3).toPandas().sort_values("vec_id") \
        .reset_index(drop=True)
    assert a1.equals(a2)
    a0 = kmeans(emb, k=4, iters=1).toPandas()
    assert a1["cos"].mean() >= a0["cos"].mean()   # Lloyd monotonicity
    assert set(a1["cluster"].unique()) <= set(range(4))


def test_hll_accuracy_high_cardinality(spark):
    """Raw-HLL branch (cardinality >> 2.5m): estimate within 3 sigma
    (sigma = 1.04/sqrt(256) ~ 6.5%) of the true distinct count; exact
    count rides the same shuffle and must be exact."""
    import pandas as pd
    from pyspark.sql import functions as F
    from terraspark.datapipe import sketches

    n = 20000
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * n + ["b"] * n,
                      "v": [f"tok_{i}" for i in range(n)]
                           + [f"tok_{i % 500}" for i in range(n)]}),
        "g string, v string")
    out = sketches.hll_distinct(df, ["g"], "v").toPandas().set_index("g")
    assert out.loc["a", "exact_distinct"] == n
    assert out.loc["b", "exact_distinct"] == 500
    assert abs(out.loc["a", "hll_est"] - n) / n < 0.20          # 3 sigma
    assert abs(out.loc["b", "hll_est"] - 500) / 500 < 0.20


def test_hist_quantile_close_to_exact(spark):
    """256-bin interpolated median within one bin width of np.percentile,
    and exact when values are uniform on the bin grid."""
    import numpy as np
    import pandas as pd
    from terraspark.datapipe import sketches

    rng = np.random.default_rng(42)
    vals = rng.gamma(3.0, 20.0, 5000)
    df = spark.createDataFrame(
        pd.DataFrame({"g": "a", "v": vals}), "g string, v double")
    out = sketches.hist_quantile(df, ["g"], "v", q=0.5).toPandas().iloc[0]
    exact = np.percentile(vals, 50)
    binw = (vals.max() - vals.min()) / 256
    assert out["n"] == 5000
    assert abs(out["est_q"] - exact) <= binw

    # constant column: est_q == the constant (degenerate-range branch)
    dfc = spark.createDataFrame(
        pd.DataFrame({"g": "c", "v": [7.5] * 10}), "g string, v double")
    outc = sketches.hist_quantile(dfc, ["g"], "v").toPandas().iloc[0]
    assert outc["est_q"] == 7.5


def test_pq_encode_matches_numpy(spark):
    """PQ assignment equals the numpy model of the same codebook rule,
    rounded-distance argmin, and lowest-code tie-break."""
    import numpy as np
    import pandas as pd
    from terraspark.datapipe.quantize import pq_encode

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    vecs[7] = vecs[1]                      # duplicate -> exercises ties
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(20),
                      "embedding": [v.tolist() for v in vecs]}),
        "vec_id long, embedding array<float>")
    m, k, sub = 2, 4, 4
    got = pq_encode(emb, m=m, k=k).toPandas() \
        .set_index(["vec_id", "subspace"]).sort_index()

    cb = vecs[:k].astype(np.float64)       # k lowest vec_ids
    for vid in range(20):
        x = vecs[vid].astype(np.float64)
        for s in range(m):
            xs = x[s * sub:(s + 1) * sub]
            d2 = np.round(((cb[:, s * sub:(s + 1) * sub] - xs) ** 2)
                          .sum(axis=1), 6)
            code = int(np.argmin(d2))      # argmin takes lowest index
            row = got.loc[(vid, s)]
            assert row["code"] == code, (vid, s)
            assert abs(row["err"] - d2[code]) < 1e-9


def test_unigram_logprob_matches_python(spark):
    import math

    import pandas as pd
    from terraspark.datapipe.textstats import unigram_logprob

    rows = [{"doc_id": 0, "text": "a a b"},
            {"doc_id": 1, "text": "b c"},
            {"doc_id": 2, "text": "a"}]
    docs = spark.createDataFrame(pd.DataFrame(rows),
                                 "doc_id long, text string")
    got = unigram_logprob(docs).toPandas().set_index("doc_id")

    freq = {"a": 3, "b": 2, "c": 1}
    total = 6
    for r in rows:
        toks = r["text"].split(" ")
        exp = round(sum(math.log10(freq[t] / total) for t in toks)
                    / len(toks), 6)
        assert got.loc[r["doc_id"], "n_toks"] == len(toks)
        assert abs(got.loc[r["doc_id"], "avg_logp"] - exp) < 1e-9


def test_pq_topk_matches_numpy_adc(spark):
    """pq_topk equals the numpy model of ADC: per-subspace LUT of
    rounded squared distances, summed over the corpus codes, ranked
    (adist, neighbor_id)."""
    import numpy as np
    import pandas as pd
    from terraspark.datapipe.quantize import pq_topk

    rng = np.random.default_rng(11)
    n, dim, m, kc, k = 40, 8, 2, 4, 5
    sub = dim // m
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n),
                      "embedding": [v.tolist() for v in vecs]}),
        "vec_id long, embedding array<float>")
    queries = [0, 5]
    got = pq_topk(emb, queries, m=m, k_codes=kc, k=k).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)

    cb = vecs[:kc].astype(np.float64)
    v64 = vecs.astype(np.float64)
    # codes: rounded-distance argmin per subspace (lowest code on ties)
    codes = np.zeros((n, m), dtype=int)
    for s in range(m):
        d2 = np.round(
            ((v64[:, None, s * sub:(s + 1) * sub]
              - cb[None, :, s * sub:(s + 1) * sub]) ** 2).sum(axis=2), 6)
        codes[:, s] = d2.argmin(axis=1)
    for qid in queries:
        lut = np.zeros((m, kc))
        for s in range(m):
            lut[s] = np.round(
                ((cb[:, s * sub:(s + 1) * sub]
                  - v64[qid, s * sub:(s + 1) * sub]) ** 2).sum(axis=1), 6)
        adist = {v: round(sum(lut[s, codes[v, s]] for s in range(m)), 6)
                 for v in range(n) if v != qid}
        exp = sorted(adist.items(), key=lambda t: (t[1], t[0]))[:k]
        sel = got[got["query_id"] == qid]
        assert sel["neighbor_id"].tolist() == [v for v, _ in exp]
        for (v, d), gd in zip(exp, sel["adist"]):
            assert abs(gd - d) < 1e-9, (qid, v)


def test_hard_negatives_hand_case(spark):
    from terraspark.datapipe import similarity
    # query 0 (label A): same-label 1 is closer than 2; different-label
    # 3 is nearly parallel (the hard negative), 4 is orthogonal.
    rows = [
        (0, [1.0, 0.0, 0.0], "A"),
        (1, [0.9, 0.1, 0.0], "A"),       # positive (cos ~ .9938)
        (2, [0.0, 1.0, 0.0], "A"),       # far same-label
        (3, [0.98, 0.0, 0.2], "B"),      # hard negative (cos ~ .98)
        (4, [0.0, 0.0, 1.0], "B"),       # easy negative
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")
    out = {r["query_id"]: r
           for r in similarity.hard_negatives(df, [0]).collect()}
    r = out[0]
    assert r["pos_id"] == 1 and r["neg_id"] == 3
    assert r["pos_cos"] > 0.99 and 0.97 < r["neg_cos"] < 0.99
    assert abs(r["margin"] - (r["pos_cos"] - r["neg_cos"])) < 1e-9


def test_hard_negatives_tie_breaks_to_lowest_id(spark):
    from terraspark.datapipe import similarity
    rows = [
        (0, [1.0, 0.0], "A"),
        (7, [2.0, 0.0], "A"),            # identical direction, cos 1.0
        (3, [3.0, 0.0], "A"),            # identical direction, cos 1.0
        (9, [0.0, 1.0], "B"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")
    r = similarity.hard_negatives(df, [0]).collect()[0]
    assert r["pos_id"] == 3              # rounded-cos tie -> lowest id
    assert r["neg_id"] == 9


def test_bigram_logprob_hand_case(spark):
    import math
    from terraspark.datapipe import textstats
    # corpus: "a b a b" (bigrams ab, ba, ab) and "a b" (ab)
    docs = spark.createDataFrame([(1, "a b a b"), (2, "a b")],
                                 "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textstats.bigram_logprob(docs).collect()}
    # counts: c(ab)=3, c(ba)=1; c(a.)=3, c(b.)=1; second-position
    # unigrams: b x3, a x1, N=4
    p_ab = 0.75 * 3 / 3 + 0.25 * 3 / 4.0
    p_ba = 0.75 * 1 / 1 + 0.25 * 1 / 4.0
    exp1 = (2 * math.log10(p_ab) + math.log10(p_ba)) / 3
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_logp"] - round(exp1, 6)) <= 1e-6
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_logp"] == round(math.log10(p_ab), 6)


def test_bigram_logprob_skips_short_docs(spark):
    from terraspark.datapipe import textstats
    docs = spark.createDataFrame([(1, "solo"), (2, "two words")],
                                 "doc_id long, text string")
    out = textstats.bigram_logprob(docs).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_semdedup_chain_rule_and_keep_lowest(spark):
    import math
    from terraspark.datapipe import similarity
    # one cluster (k=1): a--b and b--c are near-dups (20 deg apart,
    # threshold ~cos 25 deg) but a--c (40 deg) is NOT.  Rule under test:
    # keep iff NO lower-id duplicate exists -- so c is dropped via its
    # witness b even though b is itself dropped (non-greedy semantics).
    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]
    rows = [(0, v(0.0)), (1, v(20.0)), (2, v(40.0)), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           similarity.semdedup(df, threshold=0.91, n_centroids=1,
                               iters=1).collect()}
    assert len(out) == 4
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False       # dup of 0
    assert out[2]["keep"] is False       # dup of (dropped) 1: still dropped
    assert out[3]["keep"] is True        # isolated
    assert all(r["cluster"] == 0 for r in out.values())


def test_bm25_hand_case(spark):
    import math
    from terraspark.datapipe import textstats
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "a x x x")],
        "doc_id long, text string")
    out = textstats.bm25_topk(docs, ["a"], k=10).collect()
    # N=3, avgdl=3, df(a)=2 -> idf = ln((3-2+0.5)/(2+0.5)+1) = ln(1.6)
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    s1 = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0))
    s3 = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 4 / 3.0))
    assert [r["doc_id"] for r in out] == [1, 3]       # doc2 never scores
    assert abs(out[0]["score"] - round(s1, 6)) <= 1e-6
    assert abs(out[1]["score"] - round(s3, 6)) <= 1e-6


def test_substring_dup_coverage_interval_union(spark):
    from terraspark.datapipe import dedup
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h x y"),      # shares gram at s=0 -> 8/10
         (2, "z a b c d e f g h"),        # shares gram at s=1 -> 8/9
         (3, "q r s t u v w"),            # 7 tokens: no grams at all
         (4, "a b c d e f g h i"),        # exact pair with doc 5:
         (5, "a b c d e f g h i")],       # overlapping grams s=0,1 -> 9/9
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup.substring_dup_coverage(docs).collect()}
    assert len(out) == 5
    assert (out[1]["n_dup_grams"], out[1]["covered_tokens"]) == (1, 8)
    assert out[1]["coverage"] == 0.8
    assert (out[2]["covered_tokens"], out[2]["n_toks"]) == (8, 9)
    assert out[3]["n_dup_grams"] == 0 and out[3]["coverage"] == 0.0
    # overlap union: two dup grams 1 apart cover 9 tokens, not 16
    for d in (4, 5):
        assert (out[d]["n_dup_grams"], out[d]["covered_tokens"]) == (2, 9)
        assert out[d]["coverage"] == 1.0


def test_cms_heavy_hitters_one_sided_and_exact_on_singletons(spark):
    from terraspark.datapipe import sketches
    from pyspark.sql import functions as F
    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"rare{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "tok string")
    got = {r["v"]: (r["exact"], r["cms_est"]) for r in
           sketches.cms_heavy_hitters(df, "tok", k=5).collect()}
    assert len(got) == 5
    # one-sided error: estimate never undercounts
    assert all(est >= ex for ex, est in got.values())
    assert got["a"][0] == 50 and got["b"][0] == 20
    # merge-across-datasets equivalence: sketch of the union == cellwise
    # sum, so estimates over df+df double exactly
    got2 = {r["v"]: r["cms_est"] for r in sketches.cms_heavy_hitters(
        df.unionAll(df), "tok", k=5).collect()}
    assert all(got2[v] == 2 * got[v][1] for v in got)


def test_gopher_rules_hand_cases(spark):
    """Each rule trips independently; keep is the AND of all four
    computed from the rounded signal columns."""
    import pandas as pd
    from terraspark.datapipe.textstats import gopher_rules

    good = " ".join(["word"] * 60)                      # passes all
    short = "too few words"                             # n_words < 50
    symbols = " ".join(["ok#"] * 30 + ["fine"] * 30)    # symbol_ratio 0.5
    nonalpha = " ".join(["123"] * 60)                   # alpha_frac 0
    longw = " ".join(["w" * 20] * 60)                   # mean_word_len 20
    rows = [{"doc_id": 0, "text": good},
            {"doc_id": 1, "text": short},
            {"doc_id": 2, "text": symbols},
            {"doc_id": 3, "text": nonalpha},
            {"doc_id": 4, "text": longw}]
    docs = spark.createDataFrame(pd.DataFrame(rows),
                                 "doc_id long, text string")
    got = gopher_rules(docs).toPandas().set_index("doc_id")

    assert bool(got.loc[0, "keep"])
    assert got.loc[0, "n_words"] == 60
    assert abs(got.loc[0, "mean_word_len"] - 4.0) < 1e-9
    assert not bool(got.loc[1, "keep"]) and got.loc[1, "n_words"] == 3
    assert not bool(got.loc[2, "keep"])
    assert abs(got.loc[2, "symbol_ratio"] - 0.5) < 1e-9
    assert not bool(got.loc[3, "keep"])
    assert abs(got.loc[3, "alpha_frac"] - 0.0) < 1e-9
    assert not bool(got.loc[4, "keep"])
    assert abs(got.loc[4, "mean_word_len"] - 20.0) < 1e-9


def test_token_entropy_hand_case(spark):
    import math
    from terraspark.datapipe import textstats
    docs = spark.createDataFrame(
        [("d1", "a a b"), ("d2", "x x x")],
        "doc_id string, text string")
    out = {r["doc_id"]: r for r in textstats.token_entropy(docs).collect()}
    d1 = out["d1"]
    assert d1["n_tokens"] == 3 and d1["n_types"] == 2
    h = math.log(3) - (2 * math.log(2)) / 3
    assert d1["entropy"] == round(h, 6)
    assert d1["norm_entropy"] == round(h / math.log(2), 6)
    assert d1["ttr"] == round(2 / 3, 6)
    d2 = out["d2"]                       # single type: zero entropy
    assert d2["entropy"] == 0.0 and d2["norm_entropy"] == 0.0


def test_chunk_documents_offsets_and_overlap(spark):
    from terraspark.datapipe.textstats import chunk_documents
    docs = spark.createDataFrame(
        [(1, "a" * 500), (2, "b" * 150), (3, "c" * 151), (4, "")],
        "doc_id long, text string")
    out = chunk_documents(docs, size=200, stride=150).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 500 chars -> offsets 0,150,300,450; lengths 200,200,200,50
    c1 = sorted(by_doc[1], key=lambda r: r["off"])
    assert [r["off"] for r in c1] == [0, 150, 300, 450]
    assert [r["chunk_len"] for r in c1] == [200, 200, 200, 50]
    assert [r["chunk_id"] for r in c1] == [0, 1, 2, 3]
    # exactly one stride: single chunk (off 150 == len is excluded)
    assert [r["off"] for r in by_doc[2]] == [0]
    # one char past the stride boundary: second chunk of length 1
    c3 = sorted(by_doc[3], key=lambda r: r["off"])
    assert [(r["off"], r["chunk_len"]) for r in c3] == [(0, 151), (150, 1)]
    # empty text: no rows
    assert 4 not in by_doc
    # overlap: adjacent chunks share size - stride = 50 chars
    import hashlib
    assert c1[0]["chunk_md5"] == hashlib.md5(b"a" * 200).hexdigest()


def test_profile_table_hand_case(spark):
    from terraspark.datapipe.profiling import profile_table
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, None, 4.0), (3, "x", None)],
        "id long, s string, v double")
    out = {r["col"]: r for r in
           profile_table(df, string_cols=["s"],
                         numeric_cols=["id", "v"]).collect()}
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 1
    assert out["s"]["vavg"] is None
    assert out["id"]["n_distinct"] == 3 and out["id"]["vavg"] == 2.0
    assert out["v"]["n_null"] == 1 and out["v"]["vmin"] == 2.0 \
        and out["v"]["vmax"] == 4.0 and out["v"]["vavg"] == 3.0


def test_embed_dim_stats_hand_case(spark):
    from terraspark.datapipe.profiling import embed_dim_stats
    df = spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [3.0, 10.0])],
        "vec_id long, embedding array<float>")
    out = {r["dim"]: r for r in embed_dim_stats(df).collect()}
    assert out[0]["n"] == 2 and out[0]["dmean"] == 2.0
    assert out[0]["dstd"] == 1.0  # sqrt(mean(x^2) - mean^2) = sqrt(5-4)
    assert out[1]["dstd"] == 0.0 and out[1]["dmin"] == 10.0


def test_topp_vocab_hand_case(spark):
    from terraspark.datapipe.textstats import topp_vocab
    # corpus: 'a' x6, 'b' x3, 'c' x1  (total 10, vocab 3)
    docs = spark.createDataFrame(
        [(1, "a a a a a a"), (2, "b b b"), (3, "c")],
        "doc_id long, text string")
    out = {round(r["p"], 2): r for r in
           topp_vocab(docs, ps=(0.5, 0.9, 0.99)).collect()}
    # p=0.5: 'a' alone covers 6/10 >= 5 -> 1 token, mass 0.6
    assert out[0.5]["n_tokens_needed"] == 1
    assert out[0.5]["mass_frac"] == 0.6
    # p=0.9: a+b = 9/10 >= 9 -> 2 tokens
    assert out[0.9]["n_tokens_needed"] == 2
    assert out[0.9]["mass_frac"] == 0.9
    # p=0.99: needs all 3 (9 < 9.9)
    assert out[0.99]["n_tokens_needed"] == 3
    assert out[0.99]["vocab_frac"] == 1.0


def test_topp_vocab_tie_class_partial_take(spark):
    from terraspark.datapipe.textstats import topp_vocab
    # four tokens each f=1: p=0.5 of total 4 -> ceil(2/1)=2 tokens
    docs = spark.createDataFrame([(1, "w x y z")],
                                 "doc_id long, text string")
    out = {round(r["p"], 2): r for r in
           topp_vocab(docs, ps=(0.5,)).collect()}
    assert out[0.5]["n_tokens_needed"] == 2
    assert out[0.5]["vocab_frac"] == 0.5
    assert out[0.5]["mass_frac"] == 0.5


def test_source_lang_shift_hand_case(spark):
    import math
    from terraspark.datapipe.textstats import source_lang_shift
    # corpus: 4 en, 2 fr.  src_a matches the corpus mix -> KL 0;
    # src_b is all-fr -> KL = ln(1 / (2/6)) = ln(3)
    rows = [(1, "t", "en", "src_a"), (2, "t", "en", "src_a"),
            (3, "t", "fr", "src_a"),
            (4, "t", "en", "src_b"), (5, "t", "en", "src_b"),
            (6, "t", "fr", "src_b")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r for r in source_lang_shift(docs).collect()}
    # both sources have the SAME mix as the corpus -> KL 0
    assert out["src_a"]["kl"] == 0.0 and out["src_b"]["kl"] == 0.0
    rows2 = rows[:3] + [(4, "t", "fr", "src_b"), (5, "t", "fr", "src_b"),
                        (6, "t", "fr", "src_b")]
    docs2 = spark.createDataFrame(
        rows2, "doc_id long, text string, lang string, source string")
    out2 = {r["source"]: r for r in source_lang_shift(docs2).collect()}
    # corpus now 2 en / 4 fr; src_b all-fr: KL = ln(1/(4/6)) = ln(1.5)
    assert abs(out2["src_b"]["kl"] - round(math.log(1.5), 6)) < 1e-12
    assert out2["src_b"]["n_langs"] == 1


def test_vocab_overlap_hand_case(spark):
    from terraspark.datapipe.textstats import vocab_overlap
    docs = spark.createDataFrame(
        [(1, "x y z", "en", "s"), (2, "x y w", "fr", "s"),
         (3, "q r s t", "de", "s")],
        "doc_id long, text string, lang string, source string")
    out = {(r["lang_a"], r["lang_b"]): r
           for r in vocab_overlap(docs, k=10).collect()}
    # en={x,y,z}, fr={x,y,w}: common 2, union 4 -> jaccard 0.5
    assert out[("en", "fr")]["n_common"] == 2
    assert out[("en", "fr")]["jaccard"] == 0.5
    # de shares nothing with en: pair present with zero overlap
    assert out[("de", "en")]["n_common"] == 0
    assert out[("de", "en")]["jaccard"] == 0.0


def test_pii_scan_counts_and_redaction(spark):
    import hashlib
    import __spark_entry__ as E
    out = {r["doc_id"]: r for r in
           E.queries()["dp_pii_scan"](spark, "").collect()}
    # doc 0: divisible by 3, 4, 5 -> one of each PII kind
    r0 = out[0]
    assert (r0["n_email"], r0["n_phone"], r0["n_ip"]) == (1, 1, 1)
    assert r0["has_pii"]
    exp0 = ("user 0 writes lorem data mail <EMAIL> call <PHONE>"
            " host <IP>")
    assert r0["redacted_md5"] == hashlib.md5(exp0.encode()).hexdigest()
    # doc 1: no PII; redaction is the identity
    r1 = out[1]
    assert (r1["n_email"], r1["n_phone"], r1["n_ip"]) == (0, 0, 0)
    assert not r1["has_pii"]
    exp1 = "user 1 writes lorem data"
    assert r1["redacted_md5"] == hashlib.md5(exp1.encode()).hexdigest()


def test_weighted_sample_keys_and_determinism(spark):
    """The Efraimidis-Spirakis key matches a python replica of the
    instr-arithmetic uniform, heavier docs get systematically larger
    (less negative) keys in expectation, and the cut is reproducible."""
    import hashlib
    import math
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.queries()["dp_weighted_sample"](spark, sf).toPandas()
    # per-lang k <= 10, ranks dense from 1
    for lang, g in out.groupby("lang"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 10
    # replicate the key for each sampled row
    hexd = "0123456789abcdef"
    for r in out.itertuples():
        hh = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        v = 0
        for i in range(6):
            v = v * 16 + hexd.index(hh[i])
        exp = round(math.log((v + 1) / 16777216.0) / r.n_chars, 12)
        assert abs(r.es_key - exp) < 1e-15, r
    # determinism: a second run returns the identical frame
    out2 = E.queries()["dp_weighted_sample"](spark, sf).toPandas()
    assert out.sort_values(["lang", "rank"]).reset_index(drop=True) \
        .equals(out2.sort_values(["lang", "rank"]).reset_index(drop=True))


def test_dup_by_source_hand_case(spark, tmp_path):
    """Drive the REAL registry query against a hand corpus written as
    a temporary sf_dir."""
    import __spark_entry__ as E
    docs = spark.createDataFrame(
        [(1, "same text", "en", "a", 9), (2, "same text", "en", "b", 9),
         (3, "unique one", "en", "a", 10),
         (4, "unique two", "en", "b", 10),
         (5, "same text", "en", "a", 9)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in
           E.queries()["dp_dup_by_source"](spark, str(tmp_path))
           .collect()}
    # source a: 3 docs, 2 copies of the shared text; source b: 2 docs,
    # 1 copy -- cross-source duplication counts on both sides
    assert out["a"]["n_docs"] == 3 and out["a"]["n_dup"] == 2
    assert out["b"]["n_docs"] == 2 and out["b"]["n_dup"] == 1
    assert abs(out["b"]["dup_frac"] - 0.5) < 1e-12


def test_langid_confusion_rows_sum_to_one(spark):
    import __spark_entry__ as E
    out = E.queries()["dp_langid_confusion"](
        spark, "/root/testdata/sf0.001").toPandas()
    # row fractions per labeled lang sum to 1 (within rounding)
    for lang, g in out.groupby("lang"):
        assert abs(g["row_frac"].sum() - 1.0) < 1e-4, lang
    assert (out["n"] > 0).all()
