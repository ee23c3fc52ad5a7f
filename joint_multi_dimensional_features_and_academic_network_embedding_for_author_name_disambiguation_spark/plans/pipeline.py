"""The flagship 3-stage entity-resolution pipeline (north_rule).

    files(repo, path, commit, lang, content)
      0. normalize: id, content_sha, tokens, shingles, norm_path, stem
      1. BLOCKING: composite keys (lang|stem) + MinHash band keys,
         skew-split candidate-pair generation
      2. SCORING: per-channel similarities + fused score
         (JVM math + Arrow-batched TF-IDF cosine UDF)
      3. CLUSTERING: threshold → hash-min connected components
      4. labels(id, component) + per-stage metrics; every stage is a
         resumable checkpoint snapshot.

This is the Spark re-expression of the reference's end-to-end flow
(pre_data → … → local_embedding, 详细实验流程以及代码说明.docx; flagship
entry src/local_embedding/local_embedding.py:611-649) — the per-name
Python loop becomes partition-parallel DataFrame stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import scoring
from ..operators.connected_components import connected_components
from ..operators.minhash import banded_keys
from ..operators.pairs import blocked_pairs, pairs_from_keys
from .checkpoint import CheckpointManager


@dataclass
class PipelineResult:
    labels: DataFrame                      # (block_key, id, component, content_sha)
    metrics: dict = field(default_factory=dict)


def normalize_files(files: DataFrame) -> DataFrame:
    """Stage 0: ids, invariants, token features — pure column math."""
    return files.select(
        F.concat_ws(":", "repo", "path", "commit").alias("id"),
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content"), 256).alias("content_sha"),
        F.lower(F.regexp_replace(F.col("path"), "[^A-Za-z0-9/.]+", "")).alias("norm_path"),
        T.path_stem(F.col("path")).alias("stem"),
        T.token_set(F.col("content")).alias("tokens"),
        T.word_ngrams(T.tokenize(F.col("content")), 3).alias("shingles"),
    )


def run_pipeline(
    spark: SparkSession,
    files: DataFrame,
    threshold: float = 0.40,
    use_bands: bool = True,
    bands: int = 8,
    rows_per_band: int = 4,
    use_tfidf: bool = True,
    max_rows_per_task: int = 2000,
    checkpoint_dir: str | None = None,
    adaptive: bool = False,
) -> PipelineResult:
    ck = CheckpointManager(spark, checkpoint_dir) if checkpoint_dir else None
    metrics: dict = {}

    # ---- stage 0+1: normalize + blocking + candidate pairs -----------------
    def build_pairs() -> DataFrame:
        norm = normalize_files(files)
        if use_tfidf:
            feats = scoring.tfidf_features(norm.select("id", "tokens"), "id", "tokens")
            norm = norm.join(feats, "id", "left")
        members = norm.withColumn("block_key", F.concat_ws("|", "lang", "stem"))
        payload_cols = [c for c in members.columns if c not in ("repo", "path", "commit")]
        # barrier: tokenization/shingling must materialize once — Catalyst
        # projection collapse would otherwise re-evaluate it per signature
        # hash / per join side
        members = members.select(*payload_cols).persist()
        if use_bands:
            # composite blocking: stem key + MinHash band keys in one
            # skinny key table (band keys prefixed by lang so banding
            # never crosses a language boundary)
            band_k = banded_keys(
                members, "id", "tokens", bands=bands, rows=rows_per_band, prefix_col="lang"
            )
            stem_k = members.select("id", "block_key")
            keys = stem_k.unionByName(band_k)
            pairs = pairs_from_keys(
                keys, members.drop("block_key"), id_col="id", max_rows_per_task=max_rows_per_task
            )
        else:
            pairs = blocked_pairs(members, "block_key", "id", max_rows_per_task)
        return pairs

    pairs = ck.stage("pairs", build_pairs) if ck else build_pairs()
    # one action; AQE sizes downstream shuffles from the real pair count
    n_pairs = pairs.count()
    metrics["pairs_generated"] = n_pairs
    if ck:
        ck.log_metric(stage="blocking", pairs_generated=n_pairs)

    # ---- stage 2: scoring ----------------------------------------------------
    def build_scored() -> DataFrame:
        scored = scoring.score_pairs(pairs)
        keep = ["block_key", "id_a", "id_b", "content_sha_a", "content_sha_b",
                "token_jaccard", "shingle_jaccard", "path_sim", "tfidf_cosine", "score"]
        return scored.select(*[c for c in keep if c in scored.columns])

    scored = ck.stage("scored", build_scored) if ck else build_scored()
    if adaptive:
        edges = scoring.adaptive_threshold(scored, base=threshold)
    else:
        edges = scored.where(F.col("score") >= threshold)
    n_scored = scored.count()
    metrics["pairs_scored"] = n_scored
    if ck:
        ck.log_metric(stage="scoring", pairs_scored=n_scored)

    # ---- stage 3: connected components --------------------------------------
    base = normalize_files(files).withColumn("block_key", F.concat_ws("|", "lang", "stem"))
    vertices = base.select("id", "block_key", "content_sha")

    cc = connected_components(
        vertices.select("id"), edges.select("id_a", "id_b"), checkpointer=ck
    )
    metrics["cc_iterations"] = cc.iterations
    metrics["cc_metrics"] = cc.metrics
    if ck:
        for row in cc.metrics:
            ck.log_metric(stage="cc", **row)
        ck.flush_metrics()

    labels = vertices.join(cc.labels, "id").select("block_key", "id", "component", "content_sha")
    return PipelineResult(labels=labels, metrics=metrics)
