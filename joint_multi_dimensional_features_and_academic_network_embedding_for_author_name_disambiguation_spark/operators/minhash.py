"""MinHash / LSH banding and SimHash — deterministic, JVM-side column math.

The reference brute-forces O(n²) text Jaccard inside each block
(src/pre_data/generate_adj.py:106-126); at 10¹²-file scale the blocking
key alone cannot bound pair counts, so MinHash band keys become part of
the composite blocking key (north_rule stage 1, SURVEY §4 item 3).

Everything is xxhash64-based: per-permutation hash h_i(t) =
xxhash64(seed_i, t); signature[i] = min over tokens. No RNG state — the
same row always produces the same signature regardless of partitioning
(SURVEY §7.4 determinism risk).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seeded_hash(seed: int):
    # single-arg lambda — a two-arg lambda would make PySpark bind the
    # second parameter to the ARRAY INDEX, not the closure value
    return lambda t: F.xxhash64(F.lit(seed), t)


def minhash_signature(tokens: Column, num_hashes: int = 64) -> Column:
    """array<bigint> of length num_hashes; null-safe (empty → nulls)."""
    return F.array(
        *[F.array_min(F.transform(tokens, _seeded_hash(i))) for i in range(num_hashes)]
    )


def band_key_array(
    tokens: Column, bands: int, rows: int, prefix: Column | None = None
) -> Column:
    """All band keys as ONE array<string> expression.

    Critical at plan level: the (large) signature subtree appears exactly
    once — deriving per-band columns instead lets projection collapse
    clone the 64-hash tree into every band column, exploding codegen.
    Pair generation explodes this array into skinny (id, block_key) rows.
    """
    sig = minhash_signature(tokens, bands * rows)

    def mk(i: Column) -> Column:
        h = F.xxhash64(
            F.concat_ws(",", F.transform(F.slice(sig, i * rows + 1, rows), lambda x: x.cast("string")))
        )
        parts = [i.cast("string"), h.cast("string")]
        if prefix is not None:
            parts = [prefix] + parts
        return F.concat_ws("|", *parts)

    return F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), mk)


def banded_keys(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    bands: int = 16,
    rows: int = 4,
    prefix_col: str | None = None,
) -> DataFrame:
    """Skinny (id, block_key) band-key table — the production path.

    Plan shape matters here: ``posexplode(signature)`` evaluates the
    64-hash signature expression exactly ONCE per input row (an explode is
    an evaluation barrier Catalyst cannot inline through), then band keys
    are a groupBy over (id, pos/rows) — all relational, no re-evaluation.
    Deriving band columns from the signature with slice() instead makes
    Catalyst's projection collapse re-inline (and re-evaluate) the
    signature subtree once per band — 32× the work. Measured 34s → <2s on
    the sf0.01 documents table.
    """
    sig = minhash_signature(F.col(tokens_col), bands * rows)
    cols = [F.col(id_col)] + ([F.col(prefix_col)] if prefix_col else [])
    exploded = df.select(*cols, F.posexplode(sig).alias("_pos", "_h"))
    grp = [F.col(id_col), (F.col("_pos") / rows).cast("int").alias("_band")] + (
        [F.col(prefix_col)] if prefix_col else []
    )
    agg = (
        exploded.groupBy(*grp)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_h"))).alias("_ph"))
        .withColumn(
            "_bh",
            F.xxhash64(F.concat_ws(",", F.transform(F.col("_ph"), lambda x: x["_h"].cast("string")))),
        )
    )
    parts = ([F.col(prefix_col)] if prefix_col else []) + [
        F.col("_band").cast("string"),
        F.col("_bh").cast("string"),
    ]
    return agg.select(F.col(id_col), F.concat_ws("|", *parts).alias("block_key"))


def band_keys(sig: Column, bands: int, rows: int, prefix: Column | None = None) -> list[Column]:
    """One hashed key per band; pairs agreeing on ≥1 band are candidates.

    With b bands of r rows, P(candidate) = 1-(1-s^r)^b for Jaccard s —
    b=16,r=4 puts the S-curve threshold near s≈0.5.
    """
    keys = []
    for i in range(bands):
        chunk = F.slice(sig, i * rows + 1, rows)
        k = F.xxhash64(F.lit(i), F.concat_ws(",", F.transform(chunk, lambda x: x.cast("string"))))
        if prefix is not None:
            k = F.concat_ws("|", prefix, F.lit(str(i)), k.cast("string"))
        else:
            k = F.concat_ws("|", F.lit(str(i)), k.cast("string"))
        keys.append(k)
    return keys


def with_band_columns(
    df: DataFrame,
    tokens_col: str,
    bands: int = 16,
    rows: int = 4,
    prefix_col: str | None = None,
    out_prefix: str = "band_",
) -> DataFrame:
    """Attach band_0..band_{b-1} string key columns (composite with prefix,
    e.g. lang, so banding never crosses a language boundary)."""
    sig = minhash_signature(F.col(tokens_col), bands * rows)
    df = df.withColumn("_sig", sig)
    prefix = F.col(prefix_col) if prefix_col else None
    for i, k in enumerate(band_keys(F.col("_sig"), bands, rows, prefix)):
        df = df.withColumn(f"{out_prefix}{i}", k)
    return df.drop("_sig")


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array as bigint.

    Bit b of the result = sign of Σ_tokens (2·bit_b(xxhash64(t)) − 1).
    Pure aggregate/zip_with — no Python, no RNG.
    """
    # shiftright takes a Python-int bit count, so the 64 bit positions are
    # unrolled at expression-build time (still a single JVM expression).
    bitvotes = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    (F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                    for b in range(64)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    # Horner fold from bit 63 down via shiftleft|bitwiseOR: shifts wrap the
    # top bit silently under BOTH ANSI and non-ANSI sessions (an `acc * 2`
    # multiply throws ARITHMETIC_OVERFLOW under spark.sql.ansi.enabled=true
    # — operators must be correct independent of session conf). Same bit
    # layout as before, so hamming64 is unchanged.
    return F.aggregate(
        F.reverse(bitvotes),
        F.lit(0).cast("long"),
        lambda acc, v: F.shiftleft(acc, 1).bitwiseOR(
            F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        ),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two bigint SimHashes (popcount of xor)."""
    x = a.bitwiseXOR(b)
    return sum(
        (F.shiftright(x, i).bitwiseAND(F.lit(1)).cast("long") for i in range(64)),
        F.lit(0).cast("long"),
    )


def simhash_chunks(sim: Column, chunks: int = 4) -> list[Column]:
    """Split a 64-bit SimHash into equal chunks for candidate generation:
    two docs within hamming distance < chunks must agree on ≥1 chunk
    (pigeonhole), so each chunk value is a blocking key."""
    width = 64 // chunks
    mask = (1 << width) - 1
    return [
        F.shiftright(sim, i * width).bitwiseAND(F.lit(mask)).alias(f"chunk_{i}")
        for i in range(chunks)
    ]
