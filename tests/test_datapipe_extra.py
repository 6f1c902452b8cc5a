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
