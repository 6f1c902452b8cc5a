"""SRP-banded near-dup join + video/audio multimodal operators.

The SRP near-dup engine path is cross-checked against a direct in-test
quadratic baseline (signatures -> band agreement -> exact cosine), and
the multimodal decoders against their closed-form synth expectations.
"""
import numpy as np
import pytest


def _quadratic_srp_pairs(emb_pdf, dim, threshold=0.8, bits=16, bands=2):
    """Direct O(n^2) reference: same hyperplanes, band agreement on >= 1
    band, exact float64 cosine filter."""
    from terraspark.datapipe.similarity import srp_hyperplanes
    planes = np.array(srp_hyperplanes(dim, bits), dtype=np.float64)
    ids = emb_pdf["vec_id"].to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64)
                  for v in emb_pdf["embedding"]])
    sigs = []
    for v in V:
        s = 0
        for j in range(bits):
            if planes[j] @ v > 0:
                s |= 1 << (bits - 1 - j)
        sigs.append(s)
    width = bits // bands
    mask = (1 << width) - 1
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if not any(((sigs[i] >> (bits - width * (b + 1))) & mask)
                       == ((sigs[j] >> (bits - width * (b + 1))) & mask)
                       for b in range(bands)):
                continue
            cos = (V[i] @ V[j]) / (np.linalg.norm(V[i])
                                   * np.linalg.norm(V[j]))
            if cos >= threshold:
                a, b = sorted((int(ids[i]), int(ids[j])))
                out.add((a, b))
    return out


def test_srp_neardup_matches_quadratic_baseline(spark):
    from pyspark.sql import functions as F
    from terraspark.datapipe import similarity
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select("vec_id", "embedding"))
    planted = emb.where(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 2000000).alias("vec_id"), "embedding")
    both = emb.unionByName(planted)
    got = similarity.srp_neardup_pairs(both, dim=64).toPandas()
    want = _quadratic_srp_pairs(both.toPandas(), dim=64)
    assert set(zip(got["vec_a"], got["vec_b"])) == want
    # planted exact copies must be found (cos == 1.0)
    planted_pairs = got[got["vec_b"] >= 2000000]
    assert len(planted_pairs) >= 4
    assert (planted_pairs["cos"] == 1.0).all()


def test_srp_bucket_cap_excludes_oversize(spark):
    from terraspark.datapipe import similarity
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select("vec_id", "embedding"))
    sig = similarity.srp_signature(emb, dim=64)
    rows = similarity.srp_band_rows(sig)
    # cap of 1: every bucket with >1 member is excluded -> no pairs at all
    assert similarity.srp_neardup_pairs(emb, dim=64, max_bucket=1) \
        .count() == 0
    audit = similarity.srp_bucket_audit(rows, max_bucket=1).toPandas()
    assert audit["n"].gt(1).all() and len(audit) > 0


def test_frame_sample_closed_form(spark):
    from terraspark.datapipe import multimodal
    vids = multimodal.synth_video_table(spark, n_videos=3, n_frames=10,
                                        h=16, w=16)
    got = (multimodal.frame_sample(vids, stride=3).toPandas()
           .sort_values(["video_id", "frame_idx"]).reset_index(drop=True))
    n = 16 * 16
    assert len(got) == 3 * 4          # frames 0,3,6,9 per video
    for r in got.itertuples(index=False):
        v = int(r.video_id.split("_")[1])
        base = (v * 131 + r.frame_idx * 17) % 251
        assert r.mean_px == base + 0.25 * (n - 1)
        assert r.min_px == base
        assert r.max_px == base + 0.5 * (n - 1)


def test_frame_sample_foreign_format_raises(spark):
    from pyspark.sql import functions as F
    from terraspark.datapipe import multimodal
    vids = multimodal.synth_video_table(spark, n_videos=1) \
        .withColumn("fmt", F.lit("mp4"))
    with pytest.raises(Exception, match="NotImplementedError|mp4"):
        multimodal.frame_sample(vids).collect()


def test_audio_features_closed_form(spark):
    from terraspark.datapipe import multimodal
    clips = multimodal.synth_audio_table(spark, n_clips=4, sr=8000,
                                         period=4)
    got = (multimodal.audio_features(clips).toPandas()
           .sort_values("audio_id").reset_index(drop=True))
    assert len(got) == 4
    for v, r in enumerate(got.itertuples(index=False)):
        a = (v * 37) % 1000 + 100
        assert r.n_samples == 8000
        assert r.mean_amp == 0.0
        assert r.rms == a
        assert r.peak == a
