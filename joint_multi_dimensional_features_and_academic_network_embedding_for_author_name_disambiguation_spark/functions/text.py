"""Text normalization / tokenization / analysis as JVM-side Column math.

Mirrors the reference's text pipeline semantics (lowercase → strip
punctuation → collapse whitespace → split → drop short tokens/stopwords;
``convert()`` duplicated across the reference at e.g.
src/pre_data/generate_data.py:57-76 and src/pre_data/generate_adj.py:57-69)
but with zero per-row Python: everything here compiles into whole-stage
codegen. The only reference piece intentionally dropped is pinyin
transliteration (Chinese-name specific; our domain is source code).

Also provides the training-data-pipeline text analyses (language-ID
heuristic, quality scoring, token counting, rolling-hash fingerprint) —
each expressible identically in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Compact stopword list: intersection of the reference's inline list
# (src/utils/utils.py:337-345) with generic English function words; the
# reference's full 926-entry file is domain(OAG)-specific.
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "in", "is", "it", "of", "on", "or", "that", "the", "this", "to",
    "was", "were", "with",
)

# Punctuation-to-space regex, same role as the reference's `rrrr` regex
# (src/pre_data/generate_data.py:23).
NON_ALNUM = "[^a-z0-9]+"


def normalize_text(col: Column) -> Column:
    """lowercase → non-alphanumerics to space → trim (F1)."""
    return F.trim(F.regexp_replace(F.lower(col), NON_ALNUM, " "))


def tokenize(col: Column, min_len: int = 2, drop_stopwords: bool = True) -> Column:
    """Normalized token array: split, drop empties/short tokens/stopwords.

    Reference: split + `len(word) > 1` filter (src/utils/utils.py:403,418)
    + stopword removal (F2/F3).
    """
    toks = F.split(normalize_text(col), " ")
    toks = F.filter(toks, lambda x: F.length(x) >= min_len)
    if drop_stopwords:
        # F.filter, NOT array_except — array_except silently dedups, which
        # would corrupt downstream shingle sequences
        sw = F.array(*[F.lit(s) for s in STOPWORDS])
        toks = F.filter(toks, lambda x: ~F.array_contains(sw, x))
    return toks


def token_set(col: Column, **kw) -> Column:
    """Distinct, sorted token array — set semantics for Jaccard (A4)."""
    return F.array_sort(F.array_distinct(tokenize(col, **kw)))


def path_stem(path: Column) -> Column:
    """Normalized file-name stem used as part of the blocking key.

    Strips directories, extension, case, separators, and common clone
    suffixes (`_copy`, `_v2`, trailing digits) so renamed/moved clones
    land in the same block — the analogue of the reference's cleaned
    author_name blocking key (src/pre_data/repare_data_name.py).
    """
    base = F.element_at(F.split(path, "/"), -1)
    stem = F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")  # drop extension
    stem = F.lower(F.regexp_replace(stem, "[^A-Za-z0-9]+", ""))
    # strip ALL trailing variant junk in one anchored pass so `foo`,
    # `foo2`, `foo_v2`, `foo2_copy` normalize identically
    stem = F.regexp_replace(stem, "(copy|final|new|old|backup|bak|v[0-9]+|[0-9]+)+$", "")
    return stem


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Character n-gram shingle set of the normalized text (for MinHash).

    JVM-side: substring over a generated index sequence — no Python.
    """
    s = F.regexp_replace(normalize_text(col), " ", "_")
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(n))))


def hashed_word_ngrams(hashed_tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingle HASHES from an already-hashed token array.

    Equivalent set semantics to ``transform(word_ngrams(toks, n),
    xxhash64)`` — two documents share a shingle hash iff they share the
    underlying n-token window (up to the same 2^-64-scale xxhash64
    collision class) — but ~2× cheaper per row: each shingle is one
    chained ``xxhash64`` over an n-slice of longs instead of a
    ``concat_ws`` string allocation plus a string hash, and the distinct
    pass runs on longs. The <n-token fallback hashes the whole (hashed)
    sequence, mirroring word_ngrams' single whole-document shingle; a
    k<n-element chained hash cannot equal an n-element one, so fallback
    and true shingles never alias. Same let-binding discipline as
    word_ngrams (the input is referenced once per output element).
    """
    def build(t: Column) -> Column:
        m = F.size(t)
        idx = F.sequence(F.lit(1), F.greatest(m - (n - 1), F.lit(1)))
        return F.array_distinct(
            F.when(m >= n, F.transform(idx, lambda i: F.xxhash64(F.slice(t, i, n))))
            .otherwise(F.array(F.xxhash64(t)))
        )

    return F.element_at(F.transform(F.array(hashed_tokens), build), 1)


def word_ngrams(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array (n-gram Jaccard dedup).

    LET-BINDING, load-bearing: the shingle expression references its token
    input once per OUTPUT ELEMENT (the slice inside the lambda). If
    ``tokens`` is an inline expression (e.g. ``tokenize(text)``), Catalyst
    substitutes the whole subtree at every reference and re-tokenizes the
    document once per shingle — O(tokens²·|stopwords|) per row (measured
    21.8 s for 5000 sf0.1 docs; 10⁶× worse at corpus scale). Binding the
    input through a single-element-array ``transform`` evaluates it
    exactly once per row and every inner reference is a lambda VARIABLE.
    """
    def build(t: Column) -> Column:
        m = F.size(t)
        idx = F.sequence(F.lit(0), F.greatest(m - n, F.lit(0)))
        return F.array_distinct(
            F.when(m >= n, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i + 1, n))))
            .otherwise(F.array(F.concat_ws(" ", t)))
        )

    return F.element_at(F.transform(F.array(tokens), build), 1)


# ---------------------------------------------------------------------------
# Training-data-pipeline text analyses (documents table)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    # (language, marker words) — tiny deterministic heuristic; each marker
    # list is checked as whole-word membership in the token array.
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "que", "es"),
}


def lang_id(text: Column) -> Column:
    """Marker-word language guess; 'unknown' when nothing matches.

    Ties broken by fixed language order (en, de, fr, es) — deterministic
    and oracle-expressible as CASE WHEN chains.
    """
    toks = F.split(normalize_text(text), " ")
    scores = [
        (lang, sum((F.array_contains(toks, w).cast("int") for w in words), F.lit(0)))
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("unknown")
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def token_count(text: Column) -> Column:
    """Whitespace-ish token count (BPE-ish proxy: alnum runs)."""
    t = normalize_text(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def quality_score(text: Column) -> Column:
    """[0,1] doc-quality heuristic: length band + alnum ratio + stopword hit.

    Components (each 0..1, averaged):
      len_ok    — 1 if 20 ≤ n_chars ≤ 10000 else 0
      alnum     — fraction of chars that are [a-zA-Z0-9 ]
      stopw     — 1 if any top-stopword appears (fluent-text signal)
    """
    n = F.length(text)
    len_ok = ((n >= 20) & (n <= 10000)).cast("double")
    alnum = (
        F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", "")).cast("double")
        / F.greatest(n, F.lit(1)).cast("double")
    )
    toks = F.split(normalize_text(text), " ")
    stopw = F.arrays_overlap(toks, F.array(*[F.lit(s) for s in ("the", "and", "of", "is", "to")])).cast("double")
    return F.round((len_ok + alnum + stopw) / 3.0, 6)


def fingerprint(text: Column) -> Column:
    """Deterministic rolling-hash document fingerprint (bigint).

    Polynomial hash over normalized tokens: acc = (acc*31 + len(tok)*131
    + ascii(first char)) mod 2^31-1. Character-cheap but order-sensitive;
    identical formula runs in the DuckDB oracle via list_reduce.
    """
    toks = F.split(normalize_text(text), " ")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.length(x) * 131 + F.ascii(x)) % F.lit(2147483647),
    )
