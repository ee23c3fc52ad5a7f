"""Incremental entity resolution — micro-batch ingest of new files.

The reference is strictly batch (SURVEY §2.10: no streaming operators
exist; 详细实验流程以及代码说明.docx describes a 5-stage file-to-file flow),
so this module does NOT invent streaming semantics the reference lacks.
What a 100 TB deployment does need is *incremental* operation: new file
batches arrive, and re-running the O(n²) pipeline over the full corpus
per batch is not viable. The equivalent we provide:

  delta_pairs     — candidate pairs touching a new batch: (new × new)
                    within blocks PLUS (new × existing) against the
                    persisted members table — never (existing × existing),
                    which is already scored.
  merge_components — labels-table union with hash-min re-convergence
                    seeded from existing components (warm start: old
                    labels keep their component ids, so downstream
                    references stay stable unless a merge occurs).

Structured Streaming wiring: ``stream_files`` shows the readStream →
foreachBatch shape where each micro-batch calls delta_pairs/merge; the
state between batches is the checkpointed members/labels tables
(Iceberg-snapshot semantics via plans.checkpoint), not executor state —
so a restart resumes from the last committed snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.connected_components import connected_components
from ..operators.pairs import blocked_pairs


def delta_pairs(
    new_members: DataFrame,
    existing_members: DataFrame,
    block_col: str = "block_key",
    id_col: str = "id",
    max_rows_per_task: int = 2000,
) -> DataFrame:
    """Candidate pairs involving at least one new row.

    new×new via the standard blocked self-join; new×existing via a plain
    equi-join on the blocking key (no self-join semantics needed — the
    sides are disjoint). Output schema matches blocked_pairs.
    """
    nn = blocked_pairs(new_members, block_col, id_col, max_rows_per_task)

    payload = [c for c in new_members.columns if c not in (block_col, id_col)]
    a = new_members.select(
        F.col(block_col),
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload],
    )
    b = existing_members.select(
        F.col(block_col),
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    ne = a.join(b, block_col)
    # normalize order (id_a < id_b) without losing payload sides
    ne_ok = ne.where(F.col("id_a") < F.col("id_b"))
    ne_swap = ne.where(F.col("id_a") > F.col("id_b")).select(
        F.col(block_col),
        F.col("id_b").alias("id_a"),
        F.col("id_a").alias("id_b"),
        *[c for cc in payload for c in (F.col(f"{cc}_b").alias(f"{cc}_a"), F.col(f"{cc}_a").alias(f"{cc}_b"))],
    )
    return nn.unionByName(ne_ok.select(*nn.columns)).unionByName(ne_swap.select(*nn.columns))


def merge_components(
    existing_labels: DataFrame,
    new_vertices: DataFrame,
    new_edges: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Fold a delta into the labels table.

    Warm start: existing rows are seeded with their current component id
    (not their own id), so unaffected components converge in iteration 1
    and keep stable ids; new edges can merge old components (min id wins,
    exactly as a full recompute would).
    """
    seeded = existing_labels.select(id_col, "component").unionByName(
        new_vertices.select(F.col(id_col), F.col(id_col).alias("component"))
    )
    # hash-min over the union; edges only need the delta because existing
    # intra-component edges are already reflected in the seeds — BUT old
    # component ids must be linked to their seed: treat (id, component)
    # as edges so merges propagate through existing clusters.
    seed_edges = existing_labels.select(
        F.col(id_col).alias("id_a"), F.col("component").alias("id_b")
    ).where(F.col("id_a") != F.col("id_b"))
    edges = new_edges.select("id_a", "id_b").unionByName(seed_edges)
    vertices = seeded.select(id_col).distinct()
    res = connected_components(vertices, edges, id_col=id_col)
    return res.labels


def stream_files(
    spark,
    source_dir: str,
    schema: str,
    process_batch,
    checkpoint_dir: str,
    fmt: str = "parquet",
):
    """readStream → foreachBatch(process_batch) wiring.

    process_batch(batch_df, batch_id) is the user's incremental step
    (normalize → delta_pairs → score → merge_components → write snapshot).
    Offsets/commit log live under checkpoint_dir — exactly-once per
    micro-batch against idempotent snapshot writes.
    """
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 16)
        .load(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
