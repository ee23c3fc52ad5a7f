"""Deterministic synthesizer for the `files` fixture + ground-truth labels.

Reproduces the *shape* of the reference's evaluation corpus
(datasets/OAG-WhoisWh0-na-v1/test/sna_test_author_ground_truth.json: 50
ambiguous-name blocks, 33–3228 mentions per block, 3–157 true clusters per
block — loaded at src/pre_data/pickle_data.py:20-21) over the BASELINE.json
input_hint schema ``files(repo, path, commit, lang, content)``:

  * one block  = one (lang, path-stem) pair — the "ambiguous author name";
  * one cluster = one real code artifact; members are edited clones
    (token renames, line inserts/deletes, path-variant suffixes);
  * block sizes are Zipf-skewed with one planted hot block so salting and
    AQE skew handling are exercised;
  * seed 42 everywhere, matching the reference convention
    (src/pre_data/generate_data.py:30-31).

Returns plain lists of rows; Spark/pandas conversion happens at the edge so
tests, the DuckDB oracle, and bench all consume identical bytes.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

LANGS = ("py", "java", "js", "go", "c")
EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "c": "c"}
DIRS = ("src", "lib", "app", "core", "pkg", "internal", "utils", "common")
VARIANTS = ("", "_copy", "_v2", "_old", "_new", "2")


def _vocab(n: int = 4000) -> list[str]:
    rng = random.Random(1042)
    roots = (
        "parse config render html json http client server token stream "
        "buffer cache index query plan join scan hash sort merge batch "
        "block shard node edge graph tree list map set queue stack lock "
        "thread pool task job run exec eval emit read write open close "
        "init free alloc copy move swap find get put del add sub mul div"
    ).split()
    out = []
    while len(out) < n:
        a, b = rng.choice(roots), rng.choice(roots)
        out.append(f"{a}_{b}{rng.randrange(100)}")
    return sorted(set(out))[:n]


@dataclass
class Fixture:
    files: list[tuple] = field(default_factory=list)         # (repo, path, commit, lang, content)
    labels: list[tuple] = field(default_factory=list)        # (block_key, id, cluster_id)
    labeled_pairs: list[tuple] = field(default_factory=list)  # (block_key, id_a, id_b, is_match)

    FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"
    LABELS_SCHEMA = "block_key string, id string, cluster_id string"
    PAIRS_SCHEMA = "block_key string, id_a string, id_b string, is_match boolean"


def synthesize(
    n_blocks: int = 12,
    min_rows: int = 8,
    max_rows: int = 60,
    hot_block_rows: int = 300,
    clusters_per_block: tuple[int, int] = (2, 8),
    edit_rate: float = 0.10,
    template_len: tuple[int, int] = (60, 160),
    seed: int = 42,
    max_pairs_per_block: int = 200_000,
    emit_pairs: bool = True,
) -> Fixture:
    """Build the fixture. Block 0 is the hot (skew) block."""
    rng = random.Random(seed)
    vocab = _vocab()
    fx = Fixture()

    for b in range(n_blocks):
        lang = LANGS[b % len(LANGS)]
        # block id encoded as LETTERS: path_stem strips trailing digits and
        # version-ish suffixes, so a digit suffix would merge distinct
        # blocks after normalization (huge accidental mega-blocks)
        alpha = "".join("abcdefghijklmnopqrstuvwxyz"[int(d)] for d in str(b))
        word = "".join(c for c in rng.choice(vocab) if c.isalpha())
        stem = f"{word}x{alpha}"
        block_key = f"{lang}|{stem}"
        n_rows = hot_block_rows if b == 0 else rng.randint(min_rows, max_rows)
        n_clusters = max(2, min(rng.randint(*clusters_per_block), n_rows // 2))

        # templates: disjoint-ish token lists per cluster
        templates = []
        for c in range(n_clusters):
            tlen = rng.randint(*template_len)
            templates.append([rng.choice(vocab) for _ in range(tlen)])

        # assign rows to clusters: every cluster ≥1 row, rest Zipf-ish
        assign = list(range(n_clusters))
        while len(assign) < n_rows:
            # geometric preference for low cluster ids → size skew inside block
            c = min(int(rng.expovariate(1.0 / max(1, n_clusters / 3))), n_clusters - 1)
            assign.append(c)
        rng.shuffle(assign)

        member_ids: list[tuple[str, int]] = []
        for i, c in enumerate(assign):
            toks = list(templates[c])
            # token-level edits at edit_rate: substitutions + indels
            n_edit = int(len(toks) * edit_rate * rng.uniform(0.5, 1.5))
            for _ in range(n_edit):
                op = rng.random()
                pos = rng.randrange(len(toks))
                if op < 0.6:
                    toks[pos] = rng.choice(vocab)
                elif op < 0.8 and len(toks) > 10:
                    del toks[pos]
                else:
                    toks.insert(pos, rng.choice(vocab))
            content = "\n".join(
                " ".join(toks[j:j + 8]) for j in range(0, len(toks), 8)
            )
            repo = f"repo_{rng.randrange(200):04d}"
            variant = rng.choice(VARIANTS)
            d = rng.choice(DIRS)
            fname = f"{stem}{variant}.{EXT[lang]}"
            if rng.random() < 0.2:
                fname = fname.capitalize()
            path = f"{d}/{fname}"
            commit = hashlib.sha256(f"{repo}/{path}/{b}/{i}".encode()).hexdigest()[:40]
            rid = f"{repo}:{path}:{commit}"
            fx.files.append((repo, path, commit, lang, content))
            cluster_id = f"{block_key}#c{c}"
            fx.labels.append((block_key, rid, cluster_id))
            member_ids.append((rid, c))

        # labeled pairs (i<j by id string) — cap hot-block pair explosion
        if not emit_pairs:
            continue
        member_ids.sort()
        n_pairs = n_rows * (n_rows - 1) // 2
        if n_pairs <= max_pairs_per_block:
            for i in range(len(member_ids)):
                for j in range(i + 1, len(member_ids)):
                    (ia, ca), (ib, cb) = member_ids[i], member_ids[j]
                    fx.labeled_pairs.append((block_key, ia, ib, ca == cb))
    return fx


def to_spark(spark, fx: Fixture):
    """Materialize fixture as three DataFrames (files, labels, labeled_pairs)."""
    files = spark.createDataFrame(fx.files, schema=Fixture.FILES_SCHEMA)
    labels = spark.createDataFrame(fx.labels, schema=Fixture.LABELS_SCHEMA)
    pairs = spark.createDataFrame(fx.labeled_pairs, schema=Fixture.PAIRS_SCHEMA)
    return files, labels, pairs
