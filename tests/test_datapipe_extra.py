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
