"""Dedup operators vs brute-force ground truth on small corpora."""

import itertools

import pyspark.sql.functions as F

from jmdfane_spark.operators import dedup as D


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",       # 0
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",       # 1 exact dup of 0
    "alpha beta gamma delta epsilon zeta eta theta iota lambda",      # 2 near dup of 0
    "completely different words here about spark and distributed",    # 3
    "totally other content with unique vocabulary terms everywhere",  # 4
    "alpha beta gamma delta epsilon zeta eta theta iota kappa mu",    # 5 near dup of 0
]


def test_dedup_exact(spark):
    out = {r.doc_id: r.group_size for r in D.dedup_exact(_docs(spark, TEXTS), "doc_id", "text").collect()}
    assert out[0] == 2       # 0 and 1 collapse, min id survives
    assert 1 not in out
    assert out[3] == 1


def _brute_ngram_jaccard(texts, n=3):
    def grams(t):
        toks = [w for w in t.lower().split() if len(w) >= 2]
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    out = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        a, b = grams(texts[i]), grams(texts[j])
        out[(i, j)] = len(a & b) / len(a | b) if a | b else 0.0
    return out


def test_minhash_lsh_recall_and_precision(spark):
    want = {p for p, jac in _brute_ngram_jaccard(TEXTS).items() if jac >= 0.5}
    got = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            _docs(spark, TEXTS), "doc_id", "text", bands=32, rows=2, threshold=0.5
        ).collect()
    }
    # exact-verify step makes precision 1.0; 32x2 banding makes recall ~1 here
    assert got == want and len(want) >= 3


def test_ngram_jaccard_pairs(spark):
    brute = _brute_ngram_jaccard(TEXTS)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(_docs(spark, TEXTS), "doc_id", "text", threshold=0.5).collect()
    }
    want = {p: jac for p, jac in brute.items() if jac >= 0.5}
    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-6


def test_ngram_jaccard_default_blocking_is_not_quadratic(spark):
    """Scale note: a uniform-length corpus must NOT collapse into one
    quadratic candidate bucket. Default (MinHash banding) keeps bucket
    populations tracking true near-dup density; the legacy length-bucket
    scheme is an explicit opt-in."""
    # 120 same-length docs: 117 mutually-dissimilar + one planted trio
    texts = [f"tok{i}a tok{i}b tok{i}c tok{i}d tok{i}e tok{i}f tok{i}g tok{i}h" for i in range(117)]
    texts += [
        "same words repeated here exactly like this one okay",
        "same words repeated here exactly like this one okay",
        "same words repeated here exactly like this two okay",
    ]
    docs = _docs(spark, texts)
    got = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, bands=32, rows=2).collect()
    }
    assert (117, 118) in got and (117, 119) in got and (118, 119) in got
    assert len(got) == 3
    # the banded key table itself must have no mega-bucket: the legacy
    # length scheme puts all 120 docs in ONE bucket (7140 pairs); banding
    # must keep every bucket tiny on this corpus
    from jmdfane_spark.functions import text as T
    from jmdfane_spark.operators.minhash import banded_keys

    base = docs.select(
        F.col("doc_id").alias("id"), T.word_ngrams(T.tokenize(F.col("text")), 3).alias("grams")
    )
    biggest = (
        banded_keys(base, "id", "grams", bands=32, rows=2)
        .groupBy("block_key").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest <= 5, biggest


def test_simhash_pairs_exact_dups_and_brute_force(spark):
    from jmdfane_spark.functions import text as T
    from jmdfane_spark.operators.minhash import hamming64, simhash64

    docs = _docs(spark, TEXTS)
    got = {(r.id_a, r.id_b): r.hamming for r in D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
    # brute force: all-pairs hamming via the same simhash column
    sims = docs.select("doc_id", simhash64(T.tokenize(F.col("text"))).alias("s"))
    a = sims.selectExpr("doc_id as id_a", "s as sa")
    b = sims.selectExpr("doc_id as id_b", "s as sb")
    allp = (
        a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
        .withColumn("h", hamming64(F.col("sa"), F.col("sb")))
        .where(F.col("h") <= 3)
    )
    want = {(r.id_a, r.id_b): r.h for r in allp.collect()}
    assert got == want
    assert got[(0, 1)] == 0  # exact dups → identical simhash


def test_embedding_near_dup(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [1.0, 0.001, 0.0, 0.0]),    # near dup of 0 and 1
    ]
    df = spark.createDataFrame(vecs, "vec_id long, vec array<double>")
    got = {(r.id_a, r.id_b) for r in D.embedding_near_dup_pairs(df, "vec_id", "vec", threshold=0.999).collect()}
    assert (0, 1) in got and (0, 4) in got and (1, 4) in got
    assert not any(2 in p or 3 in p for p in got)


def test_banded_keys_fast_path_matches_expression(spark):
    """The Arrow numpy minhash signature (r6 fast path for array<long>
    tokens) must produce byte-identical (id, block_key) rows to the r5
    posexplode+groupBy expression path — same xxhash64 values (pinning
    the numpy XXH64 re-implementation against Spark's), same signed-min,
    same band-key string format — on random arrays, empty arrays and a
    prefix column."""
    import random

    from pyspark.sql import functions as SF

    from jmdfane_spark.operators import minhash as M

    random.seed(6)
    rows = []
    for i in range(40):
        n = random.choice([0, 1, 2, 5, 37])
        toks = [random.randint(-(2**63), 2**63 - 1) for _ in range(n)]
        rows.append((f"id{i}", "px" if i % 3 else "qx", toks))
    df = spark.createDataFrame(rows, "id string, lang string, toks array<long>")

    def legacy(df, id_col, tokens_col, bands, rs, prefix_col):
        sig = M.minhash_signature(SF.col(tokens_col), bands * rs)
        cols = [SF.col(id_col)] + ([SF.col(prefix_col)] if prefix_col else [])
        exploded = df.select(*cols, SF.posexplode(sig).alias("_pos", "_h"))
        grp = [SF.col(id_col), (SF.col("_pos") / rs).cast("int").alias("_band")] + (
            [SF.col(prefix_col)] if prefix_col else []
        )
        agg = (
            exploded.groupBy(*grp)
            .agg(SF.array_sort(SF.collect_list(SF.struct("_pos", "_h"))).alias("_ph"))
            .withColumn(
                "_bh",
                SF.xxhash64(
                    SF.concat_ws(
                        ",", SF.transform(SF.col("_ph"), lambda x: x["_h"].cast("string"))
                    )
                ),
            )
        )
        parts = ([SF.col(prefix_col)] if prefix_col else []) + [
            SF.col("_band").cast("string"),
            SF.col("_bh").cast("string"),
        ]
        return agg.select(SF.col(id_col), SF.concat_ws("|", *parts).alias("block_key"))

    for prefix in (None, "lang"):
        fast = sorted(
            map(tuple, M.banded_keys(df, "id", "toks", bands=8, rows=3, prefix_col=prefix).collect())
        )
        ref = sorted(map(tuple, legacy(df, "id", "toks", 8, 3, prefix).collect()))
        assert fast == ref, (prefix, fast[:3], ref[:3])
    # and the fast path must actually BE the Arrow plan (no silent fallback)
    plan = M.banded_keys(df, "id", "toks", bands=8, rows=3)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_embedding_near_dup_uses_arrow_kernel(spark):
    """The LSH-gated verify must run the Arrow/numpy batch cosine, not
    the interpreted HOF fold (r5 VERDICT item 2: a high-collision corpus
    re-creates the 214s bulk regime on the HOF path). Assert the plan
    contains the ArrowEvalPython stage."""
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0, float(i % 2)]) for i in range(8)], "id long, vec array<double>"
    )
    out = D.embedding_near_dup_pairs(emb, "id", "vec", threshold=0.99)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
