"""Blocked candidate-pair generation (J4) with explicit skew splitting.

The reference generates pairs with a nested Python loop inside one
ambiguous-name block (src/pre_data/generate_adj.py:86-116,
src/utils/utils.py:219-252). Here the same semantics are a blocked
self-join `a ⋈ b ON block_key WHERE a.id < b.id` — but a naive self-join
melts down on hot blocks (the reference's worst block is 3228 mentions ≈
5.2M pairs; a 10⁶-row block at 100 TB scale would be 5·10¹¹ pairs *in one
shuffle partition*). AQE skew-join splits shuffle partitions but cannot
split the O(n²) pair explosion itself, so we do it algorithmically:

  1. pre-pass `groupBy(block).count()` estimates pair counts (SURVEY §4
     "custom work" item 2);
  2. blocks over ``max_rows_per_task`` are divided into s deterministic
     buckets (xxhash64(id) mod s, no RNG);
  3. a broadcast combo table of the s·(s+1)/2 bucket pairs replicates the
     join so every bucket pair is its own shuffle key → a hot block's
     pairs are produced by many independent tasks.

All pairs are produced exactly once: cross-bucket combos (i<j) are unique
by construction, intra-bucket combos are guarded by id_a<id_b, and output
order is normalized so id_a < id_b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Forced-broadcast byte budget for the payload join-back. Spark's hard
# broadcast cap is 8 GB; this leaves headroom for BOTH sides (a-payload +
# b-payload are separate broadcast variables) plus driver copies.
BROADCAST_BYTE_CAP = 2_000_000_000


def _scalar_width(t) -> int:
    """JVM-ish serialized width of a fixed-width element (8 B payload cap
    + boxing/offset overhead for the wider types)."""
    if isinstance(t, (T.DoubleType, T.LongType, T.TimestampType)):
        return 12
    if isinstance(t, (T.BooleanType, T.ByteType, T.ShortType)):
        return 6
    return 8  # int/float/date/decimal-ish default


def _var_len_sum(c, overhead: int):
    """Σ element lengths + per-element overhead for an array of strings."""
    return F.coalesce(
        F.aggregate(
            c,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.coalesce(F.length(x), F.lit(0)) + overhead,
        ),
        F.lit(0).cast("long"),
    )


def _row_bytes_expr(df: DataFrame):
    """Per-row serialized-size estimate as a column expression: element
    counts × type widths for arrays/maps (variable-width string elements
    measured by Σ length — a flat per-element constant under-counted
    token/shingle payloads 2-4× and let the gate force broadcasts past its
    own budget), lengths for strings, fixed widths for scalars.
    Deliberately coarse — it only gates a broadcast-vs-shuffle decision,
    and Catalyst's own stats are exactly what overshoots here."""
    parts = []
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType
        if isinstance(t, T.ArrayType):
            et = t.elementType
            if isinstance(et, (T.StringType, T.BinaryType)):
                parts.append(_var_len_sum(c, 8) + 16)
            else:
                parts.append(F.coalesce(F.size(c), F.lit(0)) * _scalar_width(et) + 16)
        elif isinstance(t, T.MapType):
            n = F.coalesce(F.size(c), F.lit(0))
            if isinstance(t.keyType, (T.StringType, T.BinaryType)):
                ksz = _var_len_sum(F.map_keys(c), 8)
            else:
                ksz = n * _scalar_width(t.keyType)
            if isinstance(t.valueType, (T.StringType, T.BinaryType)):
                vsz = _var_len_sum(F.map_values(c), 8)
            else:
                vsz = n * _scalar_width(t.valueType)
            parts.append(ksz + vsz + 16)
        elif isinstance(t, (T.StringType, T.BinaryType)):
            parts.append(F.coalesce(F.length(c), F.lit(0)) + 20)
        else:
            parts.append(F.lit(16))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("double")


def estimated_broadcast_bytes(df: DataFrame, n_rows: int, sample_rows: int = 2000) -> float:
    """rows × mean serialized row size, mean from one bounded sample job.

    The r3 forced broadcast was gated on a ROW count (≤ 2M) — but member
    rows carry token/shingle/tfidf arrays measured in KBs, so 2M such rows
    are multiple GB, past Spark's 8 GB broadcast cap. Byte-gating keeps
    the forced-broadcast fix for Catalyst's overshooting size estimate
    while failing over to the shuffled join before the broadcast can OOM.
    """
    if n_rows <= 0:
        return 0.0
    row = (
        df.limit(sample_rows)
        .select(F.avg(_row_bytes_expr(df)).alias("b"))
        .collect()[0]["b"]
    )
    return float(n_rows) * float(row or 0.0)


def blocked_pairs(
    members: DataFrame,
    block_col: str = "block_key",
    id_col: str = "id",
    max_rows_per_task: int = 2000,
    counts: DataFrame | None = None,
) -> DataFrame:
    """All unordered within-block pairs: (block_key, id_a, id_b, + payload).

    ``members`` must have one row per (block_key, id); every other column
    is carried as ``<col>_a`` / ``<col>_b`` payload for the scorer.

    ``counts``: optional precomputed ``(block_col, _n)`` block-size table
    (e.g. the pipeline's pair-count pre-pass) so the same skinny groupBy
    is not re-aggregated here.
    """
    payload = [c for c in members.columns if c not in (block_col, id_col)]

    if counts is None:
        counts = members.groupBy(block_col).agg(F.count("*").alias("_n"))
    counts = counts.withColumn(
        "_splits",
        F.ceil(F.col("_n").cast("double") / F.lit(max_rows_per_task)).cast("int"),
    )
    # combo table: for each block, only UNORDERED (i ≤ j) bucket pairs —
    # s·(s+1)/2 combos, not s². Enumerating all ordered combos and then
    # filtering `id_a < id_b` materializes ~2× the join output on the
    # hottest operator in the engine; instead each unordered pair is
    # produced exactly once (i<j cross-bucket, i==j intra-bucket with an
    # id_a<id_b guard) and pair order is normalized by a conditional swap.
    combos = counts.select(
        block_col,
        "_splits",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.col("_splits") - 1),
                    lambda i: F.transform(
                        F.sequence(i, F.col("_splits") - 1),
                        lambda j: F.struct(i.alias("bi"), j.alias("bj")),
                    ),
                )
            )
        ).alias("_c"),
    ).select(block_col, "_splits", F.col("_c.bi").alias("_bi"), F.col("_c.bj").alias("_bj"))

    bucketed = members.join(F.broadcast(counts.select(block_col, "_splits")), block_col).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.col("_splits")).cast("int")
    )

    a = bucketed.select(
        F.col(block_col),
        F.col("_bucket").alias("_bi"),
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload],
    )
    b = bucketed.select(
        F.col(block_col),
        F.col("_bucket").alias("_bj"),
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    tasks = F.broadcast(combos.select(block_col, "_bi", "_bj"))
    joined = (
        a.join(tasks, [block_col, "_bi"])
        .join(b, [block_col, "_bj"])
        # intra-bucket combos need the strict-order guard; cross-bucket
        # (bi<bj) pairs are already unique (bucket is a function of id)
        .where((F.col("_bi") < F.col("_bj")) | (F.col("id_a") < F.col("id_b")))
    )
    # normalize so id_a < id_b always (a cross-bucket pair can arrive
    # reversed), swapping the payload alongside — pure column math
    swap = F.col("id_a") > F.col("id_b")
    out = [
        F.col(block_col),
        F.when(swap, F.col("id_b")).otherwise(F.col("id_a")).alias("id_a"),
        F.when(swap, F.col("id_a")).otherwise(F.col("id_b")).alias("id_b"),
    ]
    for c in payload:
        out.append(F.when(swap, F.col(f"{c}_b")).otherwise(F.col(f"{c}_a")).alias(f"{c}_a"))
        out.append(F.when(swap, F.col(f"{c}_a")).otherwise(F.col(f"{c}_b")).alias(f"{c}_b"))
    return joined.select(*out)


def pairs_from_keys(
    keys: DataFrame,
    members: DataFrame,
    id_col: str = "id",
    max_rows_per_task: int = 2000,
    broadcast_byte_cap: int = BROADCAST_BYTE_CAP,
    n_members: int | None = None,
) -> DataFrame:
    """Candidate pairs from a skinny (id, block_key) key table.

    The scale-shape core: `keys` carries NO payload (one row per
    (id, blocking key) — composite stem keys and MinHash band keys
    alike), so the O(n²)-bounded self-join shuffles only ids; pairs are
    deduped on (id_a, id_b) keeping the least key; `members`' payload
    columns are joined back exactly once per surviving pair.

    ``n_members``: pass the member row count if the caller already knows
    it, to skip the gate's count job. The persisted key table is
    registered with :mod:`..persist` — call ``persist.release()`` after
    materializing the result (the persist only exists to keep the
    block-size pre-pass and the pair self-join from re-deriving the keys).
    """
    from .. import persist as _persist

    keys = _persist.register(keys.persist())
    pairs = blocked_pairs(keys, "block_key", id_col, max_rows_per_task)
    pairs = pairs.groupBy("id_a", "id_b").agg(F.min("block_key").alias("block_key"))
    payload = [c for c in members.columns if c != id_col]
    if payload:
        pa = members.select(
            F.col(id_col).alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in payload]
        )
        pb = members.select(
            F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in payload]
        )
        # Force broadcast when the payload genuinely fits: Catalyst's size
        # estimate of array payload (shingle/vector columns) overshoots
        # the autoBroadcast threshold and falls back to SortMergeJoin,
        # sorting the whole pair stream twice. Gate on ESTIMATED BYTES
        # (count × sampled mean row size, ×2 for the two broadcast
        # copies), not rows; above the cap the shuffled join is the right
        # plan anyway.
        if n_members is None:
            n_members = members.count()
        if estimated_broadcast_bytes(members, n_members) * 2 <= broadcast_byte_cap:
            pa, pb = F.broadcast(pa), F.broadcast(pb)
        pairs = pairs.join(pa, "id_a").join(pb, "id_b")
    return pairs


def multi_key_pairs(
    members: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
    max_rows_per_task: int = 2000,
    n_members: int | None = None,
) -> DataFrame:
    """Pairs under several blocking-key columns, deduplicated.

    Used for MinHash banding: each band key is its own blocking key
    (north_rule stage 1 — banding keys are part of the composite key).
    Scale shape: key columns are EXPLODED into skinny (block_key, id)
    rows so candidate generation is ONE shuffle regardless of band count,
    pairs are deduped on (id_a, id_b), and the (wide) payload is joined
    back exactly once per surviving pair — payload bytes never fan out
    through the band replication.
    """
    keys = members.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(k) for k in key_cols])).alias("block_key"),
    ).where(F.col("block_key").isNotNull())
    payload = members.select(
        id_col, *[c for c in members.columns if c not in key_cols and c != id_col]
    )
    return pairs_from_keys(keys, payload, id_col, max_rows_per_task, n_members=n_members)
