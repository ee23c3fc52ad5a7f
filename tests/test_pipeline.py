"""End-to-end acceptance tests: the BASELINE.json contract.

  * pairwise F1 ≥ 0.99 on labeled pairs at matching blocking keys
  * per-row sha256(content) equality vs source
  * resumability from stage checkpoints
"""

import pyspark.sql.functions as F

from jmdfane_spark.operators.evaluate import pairwise_f1, pairwise_f1_on_labeled_pairs
from jmdfane_spark.plans.pipeline import normalize_files, run_pipeline


def test_flagship_f1(spark, fixture_dfs):
    files, labels, lpairs = fixture_dfs
    res = run_pipeline(spark, files, use_bands=False, use_tfidf=True)
    m = pairwise_f1_on_labeled_pairs(res.labels, lpairs)
    assert m["f1"] >= 0.99, m
    m2 = pairwise_f1(res.labels.select("id", "component"), labels)
    assert m2["macro_f1"] >= 0.99, m2


def test_flagship_f1_with_banding(spark, fixture_dfs):
    files, labels, lpairs = fixture_dfs
    res = run_pipeline(spark, files, use_bands=True, bands=8, rows_per_band=2, use_tfidf=False)
    m = pairwise_f1_on_labeled_pairs(res.labels, lpairs)
    assert m["f1"] >= 0.99, m


def test_flagship_f1_with_embedding_channel(spark, fixture_dfs):
    """5-channel fusion with the network-embedding cosine (the reference's
    HIN channel, local_embedding.py:74-79 + model.py:34-58) keeps the
    F1 ≥ 0.99 contract and emits the emb_cosine channel."""
    files, labels, lpairs = fixture_dfs
    res = run_pipeline(spark, files, use_bands=False, use_tfidf=True, use_embedding=True)
    m = pairwise_f1_on_labeled_pairs(res.labels, lpairs)
    assert m["f1"] >= 0.99, m


def test_flagship_f1_with_ghac_clusterer(spark, fixture_dfs):
    """Stage-3 alternative: per-block GHAC (reference G7/G8) reproduces the
    planted clusters on the fixture just like threshold-CC."""
    files, labels, lpairs = fixture_dfs
    res = run_pipeline(spark, files, use_bands=False, use_tfidf=True, clusterer="ghac")
    m = pairwise_f1_on_labeled_pairs(res.labels, lpairs)
    assert m["f1"] >= 0.99, m


def test_sha_invariant(spark, fixture_dfs):
    files, _, _ = fixture_dfs
    res = run_pipeline(spark, files, use_bands=False, use_tfidf=False)
    src = files.select(
        F.concat_ws(":", "repo", "path", "commit").alias("id"),
        F.sha2("content", 256).alias("src_sha"),
    )
    bad = res.labels.join(src, "id").where(F.col("content_sha") != F.col("src_sha")).count()
    missing = files.count() - res.labels.count()
    assert bad == 0 and missing == 0


def test_resume_from_checkpoint(spark, fixture_dfs, tmp_path):
    files, _, lpairs = fixture_dfs
    ckdir = str(tmp_path / "ck")
    r1 = run_pipeline(spark, files, use_bands=False, use_tfidf=False, checkpoint_dir=ckdir)
    # second run must reuse the committed snapshots (simulates restart)
    r2 = run_pipeline(spark, files, use_bands=False, use_tfidf=False, checkpoint_dir=ckdir)
    a = {(r["id"], r["component"]) for r in r1.labels.collect()}
    b = {(r["id"], r["component"]) for r in r2.labels.collect()}
    assert a == b
    m = pairwise_f1_on_labeled_pairs(r2.labels, lpairs)
    assert m["f1"] >= 0.99


def test_normalize_schema(spark, fixture_dfs):
    files, _, _ = fixture_dfs
    norm = normalize_files(files)
    expect = {"id", "repo", "path", "commit", "lang", "content_sha", "norm_path", "stem", "tokens", "shingles"}
    assert expect <= set(norm.columns)
    row = norm.where(F.size("tokens") > 0).first()
    assert row.tokens == sorted(set(row.tokens))
