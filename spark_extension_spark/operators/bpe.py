"""Distributed byte-pair-encoding (BPE) statistics, training, and
segmentation — the tokenizer-construction workload of an LLM data
pipeline, expressed Spark-first.

The classical observation (Sennrich et al., and every production BPE
trainer since) is that training never needs the corpus after one pass:
all pair statistics are linear in the **word frequency table**, which
is vocabulary-sized.  So the corpus is scanned exactly once
(:func:`word_counts` — one token explode + one map-side-combined
aggregate), and every merge iteration runs on the tiny distinct-word
table: one pair-count aggregate + one ``regexp_replace`` projection.
Only the argmax pair (a single row) ever reaches the driver.

Words are symbolized as a space-joined, space-padded character string
(``"hello"`` → ``" h e l l o "``); applying merge ``(a, b)`` is the
regex ``" a b(?= )"`` → ``" ab"`` — leftmost, non-overlapping, with a
lookahead boundary so chained occurrences (``"x y x y"``) all merge in
one pass.  This is exactly the greedy left-to-right merge order of the
reference BPE algorithm, and it is a JVM-side codegen'd projection —
no Python UDF anywhere.

Determinism: the winning pair is chosen by (count desc, left asc,
right asc), so training is a pure function of the corpus.  The
initial pair statistics (single-character symbols) replay exactly in
SQL (:func:`bpe_pair_counts_sql`); the full training loop replays via
unrolled per-merge CTEs (:func:`bpe_train_sql`) using a double-space
symbol encoding so plain ``replace`` reproduces the lookahead-regex
merge semantics RE2 (DuckDB) lacks, and is additionally verified
against a pure-Python reference implementation in the test suite.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import LocalCheckpointCycler
from .text import normalize_text

__all__ = [
    "word_counts",
    "bpe_pair_counts",
    "bpe_pair_counts_sql",
    "bpe_train",
    "bpe_train_sql",
    "bpe_segment",
    "bpe_segment_sql",
]

_TOKEN_PATTERN = "[a-z0-9]+"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the normalized token stream — the one corpus
    scan BPE training needs.  Map-side combined; output is
    vocabulary-sized."""
    toks = F.regexp_extract_all(
        normalize_text(text_col), F.lit(_TOKEN_PATTERN), F.lit(0)
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _spaced(word: Column) -> Column:
    """' h e l l o ' — split at every intra-word boundary, join with
    spaces, pad both ends (the merge regex anchors on the padding)."""
    return F.concat(F.lit(" "), F.array_join(F.split(word, "(?!^)"), " "), F.lit(" "))


def _pair_counts_from_spaced(vocab: DataFrame) -> DataFrame:
    """(sym_a, sym_b, cnt) adjacent-pair statistics over a symbolized
    vocabulary — one explode over per-word pair lists, weighted by word
    frequency, one aggregate.  Shuffle volume is pair-vocabulary-sized."""
    syms = F.split(F.trim(F.col("spaced")), " ")
    n = F.size(syms)
    pairs = F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("sym_a"),
        F.slice(syms, 2, n - 1).alias("sym_b"),
    )
    return (
        vocab.where(n >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.sym_a").alias("sym_a"), F.col("p.sym_b").alias("sym_b"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide adjacent character-pair counts ``(sym_a, sym_b,
    cnt)`` — the iteration-zero statistics of BPE training (and a
    corpus signature in their own right: the head of this table is
    what the first merges will be).

    One corpus scan (word counts) + one vocabulary-sized pair
    aggregate; the corpus itself never shuffles.
    """
    vocab = word_counts(df, text_col).select(
        _spaced(F.col("word")).alias("spaced"), "cnt"
    )
    return _pair_counts_from_spaced(vocab)


def bpe_pair_counts_sql(table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB query computing :func:`bpe_pair_counts` exactly (initial
    single-character symbols == plain substrings)."""
    return f"""
WITH words AS (
  SELECT w AS word, COUNT(*) AS cnt
  FROM {table},
       UNNEST(regexp_extract_all(trim(regexp_replace(lower({text_expr}), '[^a-z0-9]+', ' ', 'g')), '[a-z0-9]+')) AS t(w)
  GROUP BY 1
)
SELECT substring(word, i, 1) AS sym_a,
       substring(word, i + 1, 1) AS sym_b,
       CAST(SUM(cnt) AS BIGINT) AS cnt
FROM words, UNNEST(generate_series(1, length(word) - 1)) AS u(i)
WHERE length(word) >= 2
GROUP BY 1, 2
"""


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table ``(rank, sym_a, sym_b, merged)`` in application order.

    Scale shape: the corpus is scanned ONCE into the distinct-word
    frequency table (persisted); each merge iteration is one
    pair-count aggregate + a 1-row ``limit(1)`` argmax collect + one
    ``regexp_replace`` projection over the vocabulary — all
    vocabulary-sized, nothing corpus-sized.  Lineage is truncated via
    ``localCheckpoint`` every ``checkpoint_every`` merges (the
    re-symbolized vocabulary would otherwise chain ``n_merges``
    projections).  Training stops early when no pair reaches
    ``min_pair_count``.

    Determinism: winner by (count desc, sym_a asc, sym_b asc) — a pure
    function of the corpus, verified against a reference Python BPE in
    the test suite.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    vocab = (
        word_counts(df, text_col)
        .select(_spaced(F.col("word")).alias("spaced"), "cnt")
        .persist()
    )
    vocab.count()  # materialize once: every iteration reuses this scan

    merges: List[Tuple[int, str, str, str]] = []
    current = vocab
    # lag-1 cycling: each merge rewrites only the previous vocabulary,
    # and the result is the driver-side merge list, so the final
    # generation is releasable too — the loop leaves no checkpoint
    # storage behind
    cycler = LocalCheckpointCycler(spark, lag=1)
    try:
        for k in range(int(n_merges)):
            top = (
                _pair_counts_from_spaced(current)
                .where(F.col("cnt") >= int(min_pair_count))
                .orderBy(F.col("cnt").desc(), F.col("sym_a"), F.col("sym_b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["sym_a"], top[0]["sym_b"]
            merges.append((k, a, b, a + b))
            current = current.select(
                F.regexp_replace(
                    F.col("spaced"), f" {a} {b}(?= )", f" {a}{b}"
                ).alias("spaced"),
                "cnt",
            )
            if checkpoint_every and (k + 1) % int(checkpoint_every) == 0:
                current = cycler.checkpoint(current)
    finally:
        vocab.unpersist()
        cycler.release()
    return spark.createDataFrame(
        merges, "rank int, sym_a string, sym_b string, merged string"
    )


def bpe_train_sql(
    table: str = "documents",
    n_merges: int = 12,
    text_expr: str = "text",
    min_pair_count: int = 2,
) -> str:
    """DuckDB query replaying :func:`bpe_train` exactly — the full
    training loop unrolled into per-merge CTEs, so the trainer gets a
    value-level oracle despite RE2's missing lookahead.

    Per merge ``k`` three CTEs are emitted: ``p{k}`` (adjacent-pair
    counts over the symbolized vocabulary ``v{k}``), ``w{k}`` (the
    deterministic argmax — ``ORDER BY cnt DESC, sym_a, sym_b LIMIT
    1`` above ``min_pair_count``), and ``v{k+1}`` (the vocabulary with
    the winning pair merged).  The merge rewrite uses the
    double-space encoding (see :func:`bpe_segment_sql`): symbols are
    joined by TWO spaces, so one plain ``replace(s, ' a  b ', ' ab ')``
    per merge consumes only the inner half of each boundary and leaves
    the outer spaces for adjacent matches — exact leftmost
    non-overlapping (Java-lookahead) semantics in a single pass, runs
    of chained pairs included.  Every round's pair statistics — and
    therefore every argmax — replays bit-for-bit.

    Early stop parity: when no pair reaches ``min_pair_count`` the
    Spark loop breaks; here ``w{k}`` is empty, the ``LEFT JOIN``
    leaves the vocabulary untouched, and every later ``w`` is empty
    too, so ranks stay consecutive on both sides.

    Vocabulary CTEs are ``MATERIALIZED``: each ``v{k}`` feeds both
    ``p{k}`` and ``v{k+1}`` — inlining would re-evaluate the chain per
    reference.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    norm = (
        f"trim(regexp_replace(lower({text_expr}), '[^a-z0-9]+', ' ', 'g'))"
    )
    ctes = [
        f"""words AS (
  SELECT w AS word, COUNT(*) AS cnt
  FROM {table},
       UNNEST(regexp_extract_all({norm}, '[a-z0-9]+')) AS t(w)
  GROUP BY 1
)""",
        """v0 AS MATERIALIZED (
  SELECT '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS spaced, cnt
  FROM words
)""",
    ]
    for k in range(int(n_merges)):
        ctes.append(
            f"""p{k} AS (
  SELECT s[i] AS sym_a, s[i + 1] AS sym_b, SUM(cnt) AS cnt
  FROM (SELECT string_split(trim(spaced), '  ') AS s, cnt FROM v{k}),
       UNNEST(generate_series(1, len(s) - 1)) AS u(i)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""w{k} AS (
  SELECT sym_a, sym_b FROM p{k}
  WHERE cnt >= {int(min_pair_count)}
  ORDER BY cnt DESC, sym_a, sym_b LIMIT 1
)"""
        )
        ctes.append(
            f"""v{k + 1} AS MATERIALIZED (
  SELECT CASE WHEN w.sym_a IS NULL THEN v.spaced
         ELSE replace(v.spaced,
                      ' ' || w.sym_a || '  ' || w.sym_b || ' ',
                      ' ' || w.sym_a || w.sym_b || ' ') END AS spaced,
         v.cnt
  FROM v{k} v LEFT JOIN w{k} w ON TRUE
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, sym_a, sym_b, sym_a || sym_b AS merged FROM w{k}"
        for k in range(int(n_merges))
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def _norm_merges(merges: Sequence) -> List[Tuple[str, str]]:
    """Normalize a merge list to ``(sym_a, sym_b)`` pairs.  Accepts the
    trainer's 4-field output (``rank, sym_a, sym_b, merged``) and plain
    2-element pairs, in any sequence form — tuple, list (JSON
    round-trips), or Row — discriminated by LENGTH, not type: a
    4-element list must not be read as a pair (it would emit the
    garbage merge ``(rank, sym_a)``), and a 2-field Row must not be
    indexed at [2]."""
    norm: List[Tuple[str, str]] = []
    for m in merges:
        seq = list(m)
        if len(seq) == 4:
            norm.append((seq[1], seq[2]))
        elif len(seq) == 2:
            norm.append((seq[0], seq[1]))
        else:
            raise ValueError(
                "merge entries must have 2 fields (sym_a, sym_b) or 4"
                f" (rank, sym_a, sym_b, merged); got {len(seq)}: {m!r}"
            )
    return norm


def bpe_segment(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "tokens",
) -> DataFrame:
    """Tokenize documents with a learned merge list: ``(id, tokens
    array<string>)`` with merges applied in rank order inside every
    word — the same greedy pass the trainer used.

    Implementation: one projection — words via ``regexp_extract_all``,
    each word symbolized and run through the chained merge
    ``regexp_replace``s inside an array ``transform`` lambda, then
    flattened.  Zero shuffles, zero UDFs; the merge chain is a fixed
    expression tree (keep learned merge lists to a few hundred for one
    projection — split into two passes beyond that).

    ``merges`` accepts the trainer's output rows, ``(sym_a, sym_b)``
    pairs, or ``(rank, sym_a, sym_b, merged)`` 4-sequences — tuples,
    lists (e.g. a merge table round-tripped through JSON), and Rows
    alike.
    """
    norm = _norm_merges(merges)

    def apply_merges(word: Column) -> Column:
        s = _spaced(word)
        for a, b in norm:
            s = F.regexp_replace(s, f" {a} {b}(?= )", f" {a}{b}")
        return F.split(F.trim(s), " ")

    words = F.regexp_extract_all(
        normalize_text(text_col), F.lit(_TOKEN_PATTERN), F.lit(0)
    )
    return df.select(
        F.col(id_col),
        F.flatten(F.transform(words, apply_merges)).alias(out),
    )


def bpe_segment_sql(
    table: str,
    merges: Sequence[Tuple[str, str]],
    text_expr: str = "text",
    id_expr: str = "doc_id",
    out: str = "tokens",
) -> str:
    """DuckDB query computing :func:`bpe_segment` for a FIXED merge
    list.  RE2 has no lookahead, so the boundary-anchored rewrite uses
    the double-space encoding instead: symbols are joined by TWO
    spaces (``'  x  y  '``) and each merge is one plain
    ``replace(s, ' a  b ', ' ab ')``.  A match consumes only the inner
    space of each boundary, leaving the outer space for the adjacent
    match, so a run like ``x x x x`` merges ``(x1,x2),(x3,x4)`` in the
    single pass — exactly Java's leftmost non-overlapping
    ``' a b(?= )'`` semantics.  (The earlier single-space
    consuming-``replace`` fixpoint was NOT equivalent: on chained
    repeats it stabilized at ``xx x xx``, skipping every pair whose
    leading space the previous match had consumed.)"""
    expr = "'  ' || regexp_replace(w, '(.)', '\\1  ', 'g')"
    for a, b in _norm_merges(merges):
        expr = f"replace({expr}, ' {a}  {b} ', ' {a}{b} ')"
    return f"""
SELECT {id_expr} AS doc_id,
       flatten(list_transform(
         regexp_extract_all(trim(regexp_replace(lower({text_expr}), '[^a-z0-9]+', ' ', 'g')), '[a-z0-9]+'),
         w -> string_split(trim({expr}), '  ')
       )) AS {out}
FROM {table}
"""
