"""Lexical relevance scoring: document frequency, TF-IDF, BM25.

The retrieval/quality-scoring layer of a training-data pipeline:
rank documents against a query term list (curation, dataset search,
decontamination triage) or materialize per-(doc, term) weights for
downstream feature joins.

Execution shape (the part that matters at 100 TB):

* Tokenization is one ``regexp_extract_all`` over the normalized text
  (same normalization as the dedup shingles — one engine-portable
  regex, whole-stage codegen, no UDF).
* For :func:`bm25_score` the token stream is filtered to the query's
  terms *before* the explode-aggregate, so the shuffled volume is
  ``O(matching tokens)``, not corpus size; per-(doc, term) counts are
  map-side combined.
* Document frequency for the query terms is a second tiny aggregate
  whose result (≤ #terms rows) joins back **broadcast** — the corpus
  never shuffles for the idf.
* Document lengths come from a scan-speed projection (no explode).

All arithmetic is double-precision ``ln`` / ``/`` / ``*`` — IEEE
correctly-rounded in both Spark and DuckDB, so the scores hash-match
an ANSI-SQL oracle bit-for-bit.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text

__all__ = [
    "term_frequencies",
    "document_frequencies",
    "tfidf",
    "bm25_score",
    "unigram_lm",
    "doc_logprob",
    "sparse_cosine_pairs",
    "zipf_report",
    "pmi_pairs",
    "bigram_lm",
    "doc_logprob_bigram",
    "vocab_curve",
]

_TOKEN_PATTERN = "[a-z0-9]+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, token) occurrence; tokens are the ``[a-z0-9]+``
    runs of the normalized text (lock-step with the dedup shingles)."""
    toks = F.regexp_extract_all(normalize_text(text_col), F.lit(_TOKEN_PATTERN), F.lit(0))
    return df.select(F.col(id_col), F.explode(toks).alias("token"))


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token, tf) — one hash aggregate, map-side combined; shuffle
    volume is per-document vocabulary, not text size."""
    return (
        _tokens(df, id_col, text_col)
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, df) — number of distinct documents containing the token.
    ``distinct`` before the count keeps the aggregate exact while both
    steps stay map-side combinable."""
    return (
        _tokens(df, id_col, text_col)
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Per-(doc, token) TF-IDF: ``tf * ln((N + 1) / (df + 1))`` (the
    smoothed idf — never negative, defined for df = N).

    Two aggregates over one token explode + an equi-join keyed by
    token.  The join shuffles (id, token, tf) — vocabulary-sized, not
    text-sized; ``min_df`` prunes hapax noise *and* join volume."""
    tf = term_frequencies(df, id_col, text_col)
    dfreq = document_frequencies(df, id_col, text_col).where(F.col("df") >= min_df)
    n_docs = df.select(F.countDistinct(id_col).alias("__n"))
    idf = dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        F.log((F.col("__n") + F.lit(1).cast("long")).cast("double") / (F.col("df") + 1).cast("double")).alias("idf"),
    )
    return tf.join(idf, "token").select(
        id_col, "token", "tf", "df", "idf", (F.col("tf") * F.col("idf")).alias("tfidf")
    )


def bm25_score(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every matching document against ``terms``
    (Robertson/Sparck-Jones idf, the Lucene formulation):

    ``score = Σ_t ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
              · tf · (k1+1) / (tf + k1·(1 - b + b·len/avglen))``

    Returns (id, score, n_matched) for documents matching ≥1 term,
    scores descending (ties by id).

    The per-term idf — the only transcendental in the formula — is
    snapped to an exact DECIMAL(18,10) grid (round to 10 decimals,
    then the same-scale decimal cast; the EXACTNESS.md ``ln``
    discipline): ``ln`` differs between libm builds at the last ulp,
    and BM25 is a weighted sum of ``ln`` terms, exactly the class the
    quantization rule covers.  Everything downstream (the tf/length
    rational factor, the fixed-order term sum) is correctly-rounded
    IEEE arithmetic, so scores are bit-reproducible across engines —
    the snap perturbs each term by ≤ 5e-11, far below ranking
    resolution.

    Scale shape: the token stream is filtered to ``terms`` *before*
    any aggregation — everything downstream is O(matching tokens).
    The per-term df and the corpus-level (N, avg length) are tiny
    aggregates joined back broadcast; the corpus itself is scanned
    once and never shuffled beyond the (id, term, tf) counts.
    """
    if not terms:
        raise ValueError("bm25_score requires at least one query term")
    # extract the same [a-z0-9]+ token runs the corpus tokenizer emits:
    # a raw "u.s." or "new-york" can never equal a token and previously
    # matched nothing, silently scoring zero documents
    import re as _re

    # dedupe preserving FIRST-OCCURRENCE order: the final score is a
    # fixed-order sum over term_list (float addition is not
    # associative), so the order is part of the contract — it must
    # follow the caller's query order, which is also the order the
    # hand-written SQL oracle sums in
    term_list = list(
        dict.fromkeys(m for t in terms for m in _re.findall(r"[a-z0-9]+", t.lower()))
    )
    if not term_list:
        raise ValueError(
            f"no [a-z0-9]+ tokens extractable from query terms {terms!r}"
        )

    toks = _tokens(df, id_col, text_col)
    matched = toks.where(F.col("token").isin(term_list))
    tf = matched.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = matched.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    # corpus stats: one scan-speed projection (no explode), 1-row result
    lens = df.select(
        F.col(id_col),
        F.size(
            F.regexp_extract_all(normalize_text(text_col), F.lit(_TOKEN_PATTERN), F.lit(0))
        ).cast("double").alias("__len"),
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__len").alias("__avglen"),
    )

    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "token",
        # snapped to the DECIMAL(18,10) grid — see docstring; the
        # decimal→double cast back is correctly rounded in Spark (the
        # oracle routes its cast through VARCHAR, EXACTNESS.md rule 2)
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
            10,
        )
        .cast("decimal(18,10)")
        .cast("double")
        .alias("__idf"),
        "__n",
        "__avglen",
    )
    per_term = (
        tf.join(F.broadcast(idf), "token")
        .join(lens, id_col)
        .select(
            F.col(id_col),
            F.col("token"),
            (
                F.col("__idf")
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__len") / F.col("__avglen"))
                )
            ).alias("__s"),
        )
    )
    # fixed-order final sum: one conditional aggregate per query term,
    # added left-to-right.  A plain SUM would add the per-term doubles
    # in arrival order — non-deterministic across runs/engines (float
    # addition is not associative); the unrolled form is deterministic
    # and exactly replicable in ANSI SQL.  x + 0.0 is exact, so absent
    # terms contribute nothing.
    aggs = [
        F.sum(F.when(F.col("token") == t, F.col("__s"))).alias(f"__s_{i}")
        for i, t in enumerate(term_list)
    ] + [F.count(F.lit(1)).alias("n_matched")]
    grouped = per_term.groupBy(id_col).agg(*aggs)
    score = F.coalesce(F.col("__s_0"), F.lit(0.0))
    for i in range(1, len(term_list)):
        score = score + F.coalesce(F.col(f"__s_{i}"), F.lit(0.0))
    return grouped.select(
        F.col(id_col), score.alias("score"), F.col("n_matched")
    ).orderBy(F.col("score").desc(), F.col(id_col))


def unigram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """(token, logp) — add-``k`` smoothed unigram log-probabilities
    fitted on ``df``: ``ln((c + k) / (total + k·(V + 1)))`` with ``V``
    the vocabulary size (the ``+ 1`` reserves mass for unseen tokens:
    ``ln(k / (total + k·(V+1)))`` is the consistent ``unk_logp`` to
    score out-of-vocabulary tokens in :func:`doc_logprob`).

    One explode + one map-side-combined count per token; the corpus
    totals ride a single-partition window over the vocabulary-sized
    count frame (bounded by the same assumption that lets the result
    broadcast into the scoring join).  NOT a separate ``counts.agg``
    cross-joined back: that form gave the unpersisted count aggregate
    two consumers, and the whole tokenize+explode+count pipeline
    executed twice (round-10 REST census — the target_encode
    two-consumer finding, same shape)."""
    counts = (
        _tokens(df, id_col, text_col).groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    )
    wall = Window.partitionBy()
    total = F.sum("c").over(wall).cast("double")
    vocab = F.count(F.lit(1)).over(wall).cast("double")
    # prob is the raw ratio (correctly-rounded double division — bit-
    # reproducible across engines, which the ln output is not):
    # interpolating consumers (doc_logprob_bigram) combine probabilities
    # directly instead of exp(logp) round-trips, keeping ONE
    # transcendental in their score path
    prob = (F.col("c").cast("double") + F.lit(float(k))) / (
        total + F.lit(float(k)) * (vocab + F.lit(1.0))
    )
    return counts.select("token", F.log(prob).alias("logp"), prob.alias("prob"))


def doc_logprob(
    df: DataFrame,
    lm: DataFrame = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_logp: float = None,
) -> DataFrame:
    """Per-document unigram log-likelihood — the CCNet-style quality
    signal (documents whose token distribution is atypical for the
    corpus score low; perplexity is ``exp(-avg_logp)``):
    (id, ``n_tokens``, ``sum_logp``, ``avg_logp``).

    ``lm`` is a (token, logp) frame — fit one with :func:`unigram_lm`
    on a reference corpus, or leave ``None`` to self-score against
    ``df``'s own unigram distribution (then no token is unseen).  With
    an external ``lm``, out-of-vocabulary tokens take ``unk_logp``
    (use the reserved-mass constant from :func:`unigram_lm`'s
    docstring); if unset they propagate NULL into the document's score
    — visibly, never silently.

    Scale shape: tokenize once, one map-side-combined (doc, token, tf)
    aggregate, an equi-join with the vocabulary-sized ``lm``, one
    final per-doc aggregate.  Each ``logp`` is snapped to an exact
    DECIMAL(18,10) grid and the tf-weighted per-doc sum is integer
    decimal arithmetic — order-independent and bit-reproducible across
    partitionings, engines, and libm builds (the quantization perturbs
    ``sum_logp`` by ≤ 5e-11 · n_tokens, far below the signal's
    resolution)."""
    if lm is None:
        lm = unigram_lm(df, id_col, text_col)
    if unk_logp is not None and abs(float(unk_logp)) >= 1e8:
        # the DECIMAL(18,10) snap grid holds |logp| < 1e8; a larger
        # sentinel would overflow the cast (ANSI throws mid-job;
        # non-ANSI silently NULLs the term with __n_oov still 0, so an
        # OOV-heavy junk document would score HIGH — the exact failure
        # the __n_oov contract exists to catch).  Real log-probs are
        # tiny; fail loud at call time instead.
        raise ValueError(
            f"unk_logp magnitude must be < 1e8 (decimal snap grid), "
            f"got {unk_logp!r}"
        )
    tf = term_frequencies(df, id_col, text_col)
    logp = F.col("logp") if unk_logp is None else F.coalesce(F.col("logp"), F.lit(float(unk_logp)))
    # logp snapped to an exact DECIMAL(18,10) grid (round to 10
    # decimals, then the same-scale decimal cast): ln differs between
    # libm builds at the last ulp, and round() alone leaves a 1-ulp
    # double spread — the decimal cast recovers the identical grid
    # point on every engine.  The tf-weighted fold is then pure integer
    # arithmetic, so scores are bit-reproducible across engines and
    # partitionings.  Perturbs sum_logp by ≤ 5e-11 · n_tokens — far
    # below the signal's resolution.
    per_doc = (
        tf.join(lm, "token", "left")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(
                F.round(logp, 10).cast("decimal(18,10)")
                # decimal(19,0) covers the full long range of tf —
                # decimal(10,0) would overflow-to-NULL (non-ANSI) past
                # 1e10 occurrences and silently drop the term;
                # (18,10)×(19,0) → precision exactly 38, still lossless
                * F.col("tf").cast("decimal(19,0)")
            ).alias("__s"),
            # SQL SUM skips NULL terms, so the "OOV propagates NULL"
            # contract needs an explicit count: without it a document
            # that is 90% out-of-vocabulary would score over only its
            # matched 10% and look HIGH quality — exactly the junk a
            # quality filter must catch
            F.sum(F.when(logp.isNull(), 1).otherwise(0)).alias("__n_oov"),
        )
    )
    score = F.when(F.col("__n_oov") == 0, F.col("__s").cast("double"))
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            score.alias("sum_logp"),
            (score / F.col("n_tokens").cast("double")).alias("avg_logp"),
        )
    )


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sim: float = 0.5,
    min_df: int = 1,
    max_token_df: int = None,
) -> DataFrame:
    """Document near-duplicate pairs by *sparse* (TF-IDF) cosine
    similarity — the lexical complement to the embedding-space
    operators in ``similarity.py``: no model required, robust to
    paraphrase-free boilerplate, and the weights are interpretable.

    Candidates meet through an inverted-index equi-join on shared
    tokens (never an all-pairs product): documents with no common
    token have dot product 0 and are never enumerated.  ``min_df``
    drops hapax noise; ``max_token_df`` drops stop-like tokens whose
    postings lists dominate the join (a token in B documents
    contributes B² candidate pairs — cap it; the cap changes the
    token space, so it is part of the operator's *definition* here,
    mirrored exactly in the oracle, not a silent truncation).

    Per-pair dot products and per-doc norms are summed in
    DECIMAL(38,12): the number of shared tokens varies per pair, so
    a fixed-order float sum is impossible — decimal addition is
    order-independent, making similarities bit-stable across
    partitionings and engines.  The final ``sqrt``/``/``/``*`` are
    IEEE correctly-rounded doubles.

    Plan: tokenize once → tfidf (two map-side aggregates + vocab join)
    → postings self-join keyed by token → per-pair aggregate → two
    norm joins → filter.  Shuffle volume is postings + surviving
    pairs.

    Returns ``id_a, id_b, cosine_sim`` (``id_a < id_b``,
    ``cosine_sim >= min_sim``).
    """
    w = tfidf(df, id_col, text_col, min_df=min_df)
    if max_token_df is not None:
        w = w.where(F.col("df") <= max_token_df)
    w = w.select(F.col(id_col).alias("__id"), "token", F.col("tfidf").alias("__w"))
    norms = w.groupBy("__id").agg(
        F.sqrt(F.sum((F.col("__w") * F.col("__w")).cast("decimal(38,12)")).cast("double")).alias(
            "__norm"
        )
    )
    # a document whose every token has idf 0 (tokens present in ALL
    # docs) has norm 0: cosine is undefined for it — drop it here
    # rather than dividing by zero (ANSI throws; non-ANSI yields NaN,
    # which Spark orders ABOVE every double so NaN >= min_sim would
    # emit bogus pairs)
    norms = norms.where(F.col("__norm") > 0)
    a = w.select(F.col("__id").alias("id_a"), "token", F.col("__w").alias("__wa"))
    b = w.select(F.col("__id").alias("id_b"), "token", F.col("__w").alias("__wb"))
    dots = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum((F.col("__wa") * F.col("__wb")).cast("decimal(38,12)")).alias("__dot"))
    )
    na = norms.select(F.col("__id").alias("id_a"), F.col("__norm").alias("__na"))
    nb = norms.select(F.col("__id").alias("id_b"), F.col("__norm").alias("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("__dot").cast("double") / (F.col("__na") * F.col("__nb"))).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= F.lit(float(min_sim)))
    )


def zipf_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_types: int = 100_000,
) -> DataFrame:
    """Zipf power-law fit over the corpus token-frequency distribution —
    one row: (``n_types``, ``n_tokens``, ``alpha``, ``r2``).  Natural
    text follows ``freq ∝ rank^−α`` with α ≈ 1; extreme departures
    (α → 0: synthetic/boilerplate-flat, α ≫ 1: degenerate repetition)
    are a corpus-level quality alarm that per-document metrics miss.

    The fit is the closed-form least squares of ``ln freq`` on
    ``ln rank`` over the ``max_types`` most frequent types: ranking is
    one window over vocabulary-sized counts; the ``ln`` coordinates are
    snapped to an exact DECIMAL(12,10) grid so the five OLS sums are
    integer decimal arithmetic — bit-reproducible across partitionings,
    engines, and libm builds (the snap perturbs alpha/r2 by ≤ ~1e-9).
    Ties rank deterministically (freq desc, token asc).

    Scale shape: tokenize + one map-side-combined count (vocabulary
    rows) → one rank window over vocabulary → one 1-row aggregate.  The
    corpus is scanned once; nothing larger than the vocabulary
    shuffles."""
    counts = (
        _tokens(df, id_col, text_col).groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    )
    # top max_types via orderBy+limit = TakeOrderedAndProject
    # (per-partition heaps, no single-partition sort of the whole
    # vocabulary — the global-top-k hazard class, round 10); ranks are
    # then a window over the <= max_types survivors only
    w = Window.orderBy(F.col("c").desc(), F.col("token").asc())
    top = counts.orderBy(F.col("c").desc(), F.col("token").asc()).limit(
        int(max_types)
    )
    ranked = (
        top.withColumn("r", F.row_number().over(w))
        .select(
            # ln coordinates snapped to an exact DECIMAL(12,10) grid
            # (round to 10 decimals + same-scale decimal cast): libm
            # builds differ at the last ulp and the OLS's
            # n·Σxy − Σx·Σy cancellation amplifies that ~1e3×; on the
            # snapped grid all five OLS sums are exact integer
            # arithmetic, so the fit is bit-reproducible across engines
            # and partitionings.  The perturbation to alpha/r2 is
            # ≤ ~1e-9 — noise relative to the metric's meaning.
            F.round(F.log(F.col("r").cast("double")), 10)
            .cast("decimal(12,10)")
            .alias("x"),
            F.round(F.log(F.col("c").cast("double")), 10)
            .cast("decimal(12,10)")
            .alias("y"),
            F.col("c"),
        )
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("x")).cast("double").alias("sx"),
        F.sum(F.col("y")).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n_types").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    # degenerate fits (single token type -> vx=0; all frequencies equal
    # -> vy=0) report NULL instead of dividing by zero (ANSI throws)
    return agg.select(
        "n_types",
        "n_tokens",
        F.when(vx > 0, -(cov / vx)).alias("alpha"),
        F.when((vx > 0) & (vy > 0), (cov * cov) / (vx * vy)).alias("r2"),
    )


_PAIR_SEP = "\u0001"  # unused by the [a-z0-9]+ token alphabet


def pmi_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining: pointwise mutual information for ordered
    token pairs co-occurring within ``window`` positions —
    ``pmi = ln( (c_xy / N_pairs) / ((c_x / N_tok) * (c_y / N_tok)) )``
    plus the normalized variant ``npmi = pmi / -ln(c_xy / N_pairs)``.
    Note npmi here normalizes window-pair probability against UNIGRAM
    marginals (the standard corpus formulation); because N_pairs and
    N_tok are different denominators the textbook [-1, 1] bound is
    approximate — perfectly collocated tokens in a tiny corpus can
    exceed 1.  A corpus with a single pair type (p_xy = 1) reports
    NULL npmi (the -ln(p_xy) normalizer is zero).  High-PMI pairs are multi-word expressions ("new york",
    "machine learning"); a corpus whose top collocations are template
    fragments is boilerplate — a quality signal n-gram counts alone
    don't give.

    Scale shape: tokens materialize ONCE as an array column; pair
    arrays are index ``transform``s over that materialized attribute
    (cheap array indexing — NOT re-running the tokenizer; the
    shingles/DSIR regex trap only bites when the unevaluated
    expression is passed into the lambda); one explode bounded by
    tokens x window; two map-side-combined counts.  ``min_count``
    bounds the output to pairs worth reporting; token counts and
    totals broadcast.  All sums are integers; the PMI arithmetic is
    the same IEEE expression on both engines."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = F.regexp_extract_all(
        normalize_text(text_col), F.lit(_TOKEN_PATTERN), F.lit(0)
    )
    base = df.select(F.col(id_col), toks.alias("__t"))

    t = F.col("__t")
    empty = F.array_remove(F.array(F.lit(1)), 1)
    pair_arrays = []
    for dist in range(1, int(window) + 1):
        idx = F.when(
            F.size(t) > F.lit(dist),
            F.sequence(F.lit(1), F.size(t) - F.lit(dist)),
        ).otherwise(empty)

        def mk(d: int):
            return lambda i: F.concat_ws(
                _PAIR_SEP, F.element_at(t, i), F.element_at(t, i + F.lit(d))
            )

        pair_arrays.append(F.transform(idx, mk(dist)))
    pairs_col = pair_arrays[0]
    for arr in pair_arrays[1:]:
        pairs_col = F.concat(pairs_col, arr)

    pairs = base.select(F.explode(pairs_col).alias("__p"))
    pair_counts = pairs.groupBy("__p").agg(F.count(F.lit(1)).alias("c_xy"))
    tok_counts = base.select(F.explode(t).alias("__w")).groupBy("__w").agg(
        F.count(F.lit(1)).alias("c")
    )
    # totals ride single-partition windows over the count frames
    # (vocabulary-/pair-vocabulary-sized — the same bound that lets
    # them broadcast), attached BEFORE the min_count filter so __np
    # covers all pairs.  NOT separate .agg frames cross-joined back:
    # that made pair_counts and tok_counts their own second/third
    # consumers and re-ran the explode+count pipelines (round-10 REST
    # census: 4 corpus scans for this query).  Long-sum windows are
    # exact, so values are unchanged.
    wall = Window.partitionBy()
    pair_counts = pair_counts.withColumn(
        "__np", F.sum("c_xy").over(wall).cast("double")
    )
    tok_counts = tok_counts.withColumn("__nt", F.sum("c").over(wall).cast("double"))
    split = F.split(F.col("__p"), _PAIR_SEP)
    scored = (
        pair_counts.where(F.col("c_xy") >= int(min_count))
        .select(
            split.getItem(0).alias("x"),
            split.getItem(1).alias("y"),
            "c_xy",
            "__np",
        )
        .join(
            F.broadcast(
                tok_counts.select(
                    F.col("__w").alias("x"), F.col("c").alias("c_x"), "__nt"
                )
            ),
            "x",
        )
        .join(
            F.broadcast(
                tok_counts.select(F.col("__w").alias("y"), F.col("c").alias("c_y"))
            ),
            "y",
        )
    )
    p_xy = F.col("c_xy").cast("double") / F.col("__np")
    p_x = F.col("c_x").cast("double") / F.col("__nt")
    p_y = F.col("c_y").cast("double") / F.col("__nt")
    pmi = F.log(p_xy / (p_x * p_y))
    return scored.select(
        "x",
        "y",
        "c_xy",
        "c_x",
        "c_y",
        pmi.alias("pmi"),
        F.when(p_xy < 1, pmi / -F.log(p_xy)).alias("npmi"),
    )



def bigram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """(w1, w2, logp) — interpolation-ready bigram conditional
    log-probabilities fitted on ``df``:
    ``ln((c(w1 w2) + k) / (c(w1·) + k·(V + 1)))`` with ``V`` the
    unigram vocabulary (add-``k`` over the successor distribution of
    each history; the ``+1`` reserves mass for unseen successors).
    Pair counts come from the same materialized-array index transform
    as :func:`pmi_pairs`; the history totals join is bounded by the
    bigram vocabulary."""
    toks = F.regexp_extract_all(
        normalize_text(text_col), F.lit(_TOKEN_PATTERN), F.lit(0)
    )
    base = df.select(toks.alias("__t"))
    t = F.col("__t")
    empty = F.array_remove(F.array(F.lit(1)), 1)
    idx = F.when(F.size(t) > 1, F.sequence(F.lit(1), F.size(t) - 1)).otherwise(empty)
    pairs = base.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    _PAIR_SEP, F.element_at(t, i), F.element_at(t, i + F.lit(1))
                ),
            )
        ).alias("__p")
    )
    pc = pairs.groupBy("__p").agg(F.count(F.lit(1)).alias("__c"))
    split = F.split(F.col("__p"), _PAIR_SEP)
    pc = pc.select(
        split.getItem(0).alias("w1"), split.getItem(1).alias("w2"), "__c"
    )
    # history totals as a w1-keyed window over the bigram-count frame —
    # NOT a groupBy joined back, which made pc its own second consumer
    # and re-ran the whole pair explode+count pipeline (round-10 REST
    # census: this query read the corpus 7x).  Long sums are exact, so
    # values are unchanged; one exchange keyed by w1 replaces an
    # aggregate + a join.
    pc = pc.withColumn("__h", F.sum("__c").over(Window.partitionBy("w1")))
    vocab = base.select(F.explode(t).alias("__w")).agg(
        F.count_distinct("__w").cast("double").alias("__v")
    )
    # prob mirrors unigram_lm: the raw conditional ratio for
    # interpolating consumers (one ln in the score path, no exp(logp))
    prob = (F.col("__c").cast("double") + F.lit(float(k))) / (
        F.col("__h").cast("double") + F.lit(float(k)) * (F.col("__v") + F.lit(1.0))
    )
    return (
        pc.crossJoin(F.broadcast(vocab))
        .select("w1", "w2", F.log(prob).alias("logp"), prob.alias("prob"))
    )


def doc_logprob_bigram(
    df: DataFrame,
    lm: DataFrame = None,
    unigram: DataFrame = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    unk_logp: float = -20.0,
) -> DataFrame:
    """Per-document interpolated bigram log-likelihood — the stronger
    form of the :func:`doc_logprob` quality signal (CCNet uses a
    5-gram KenLM; the bigram interpolation is the largest order whose
    fit and scoring stay pure column algebra):
    ``p(w2|w1) = λ·p_bigram(w2|w1) + (1−λ)·p_unigram(w2)``, summed as
    ``ln p`` per document in DECIMAL(38,15).

    ``lm`` / ``unigram`` default to models fitted on ``df`` itself
    (self-scoring); pass external frames to score against a reference
    corpus.  Bigrams unseen in the model back off to
    ``(1−λ)·p_unigram``; tokens unseen entirely take ``unk_logp``.
    Returns (id, ``n_bigrams``, ``sum_logp``, ``avg_logp``).

    Exactness: when both model frames carry the ``prob`` column that
    :func:`bigram_lm` / :func:`unigram_lm` emit, the interpolation
    combines the raw probability ratios directly — correctly-rounded
    divisions and multiply-adds, bit-identical on every engine — so
    the ONLY transcendental in the score is the final
    ``ln(λ·p_bg + (1−λ)·p_ug)``, which is snapped to the exact
    DECIMAL(18,10) grid before the tf-weighted integer-decimal fold
    (the :func:`doc_logprob` discipline; perturbs ``sum_logp`` by
    ≤ 5e-11 · n_bigrams).  Scores are then bit-reproducible across
    engines, partitionings, and libm builds.  External models exposing
    only ``logp`` fall back to ``exp(logp)`` round-trips whose
    multi-ulp spread the snap cannot fully absorb — reproducible per
    engine, last-ulp across engines.

    Scale shape: one pair explode + map-side-combined (doc, bigram)
    counts, an equi-join with the bigram model (vocabulary-sized), the
    unigram join bounded by vocabulary, one per-doc decimal aggregate."""
    if lm is None:
        lm = bigram_lm(df, id_col, text_col)
    if unigram is None:
        unigram = unigram_lm(df, id_col, text_col)
    toks = F.regexp_extract_all(
        normalize_text(text_col), F.lit(_TOKEN_PATTERN), F.lit(0)
    )
    base = df.select(F.col(id_col), toks.alias("__t"))
    t = F.col("__t")
    empty = F.array_remove(F.array(F.lit(1)), 1)
    idx = F.when(F.size(t) > 1, F.sequence(F.lit(1), F.size(t) - 1)).otherwise(empty)
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    _PAIR_SEP, F.element_at(t, i), F.element_at(t, i + F.lit(1))
                ),
            )
        ).alias("__p"),
    )
    tf = pairs.groupBy(id_col, "__p").agg(F.count(F.lit(1)).alias("__tf"))
    split = F.split(F.col("__p"), _PAIR_SEP)
    tf = tf.select(
        F.col(id_col),
        split.getItem(0).alias("w1"),
        split.getItem(1).alias("w2"),
        "__tf",
    )
    lam_ = float(lam)
    use_prob = "prob" in lm.columns and "prob" in unigram.columns
    if use_prob:
        import math

        model = lm.select("w1", "w2", F.col("prob").alias("__bgp"))
        uni = unigram.select(F.col("token").alias("w2"), F.col("prob").alias("__ugp"))
        # unseen-token backoff probability as a driver-computed literal:
        # the same double lands in the lock-step oracle SQL, so the
        # backoff contributes no engine-libm term
        p = F.lit(lam_) * F.coalesce(F.col("__bgp"), F.lit(0.0)) + F.lit(
            1.0 - lam_
        ) * F.coalesce(F.col("__ugp"), F.lit(math.exp(float(unk_logp))))
    else:
        model = lm.select("w1", "w2", F.col("logp").alias("__bg"))
        uni = unigram.select(F.col("token").alias("w2"), F.col("logp").alias("__ug"))
        # ln(lam*e^bg + (1-lam)*e^ug); exp/ln of moderate magnitudes —
        # identical IEEE expression on both engines
        p = (
            F.lit(lam_) * F.exp(F.coalesce(F.col("__bg"), F.lit(float("-inf"))))
            + F.lit(1.0 - lam_)
            * F.exp(F.coalesce(F.col("__ug"), F.lit(float(unk_logp))))
        )
    per_doc = (
        tf.join(model, ["w1", "w2"], "left")
        .join(uni, "w2", "left")
        .groupBy(id_col)
        .agg(
            F.sum("__tf").alias("n_bigrams"),
            # ln(p) snapped to the DECIMAL(18,10) grid, tf-weighted fold
            # in integer decimal arithmetic (the doc_logprob discipline)
            F.sum(
                F.round(F.log(p), 10).cast("decimal(18,10)")
                * F.col("__tf").cast("decimal(19,0)")
            ).alias("__s"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.col("__s").cast("double").alias("sum_logp"),
            (F.col("__s").cast("double") / F.col("n_bigrams").cast("double")).alias(
                "avg_logp"
            ),
        )
    )


def vocab_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: Optional[int] = None,
    unpersist_handle=None,
) -> DataFrame:
    """Vocabulary coverage curve: tokens ranked by corpus frequency
    with the cumulative fraction of all token *occurrences* each
    vocabulary prefix covers — the sizing curve behind "how many types
    does a 95%-coverage tokenizer vocabulary need?" and the fast
    before/after check when changing normalization.  Returns
    ``(rank, token, freq, cum_freq, coverage)`` ordered by rank
    (frequency desc, token asc for a total, replayable order).

    Scale shape: one token-count aggregate (shuffle bounded by
    vocabulary, not corpus size), a 1-row total broadcast back, and a
    *global* prefix sum over the vocabulary-sized count frame via the
    partition-offsets technique (:func:`~spark_extension_spark.
    operators.packing.with_running_total`) — no single-partition
    window even for 10⁸-type vocabularies.  ``top_k`` truncates the
    *output* after ranking; coverage is always relative to the full
    token stream.

    Both prefix-sum helpers pin their sorted input at MEMORY_AND_DISK;
    pass an :class:`~spark_extension_spark.utils.UnpersistHandle` to
    release those caches when done (one call frees both).
    """
    counts = (
        _tokens(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    from .packing import with_running_total
    from .row_numbers import with_row_numbers

    run_h = row_h = None
    if unpersist_handle is not None:
        from ..utils import SilentUnpersistHandle

        run_h, row_h = SilentUnpersistHandle(), SilentUnpersistHandle()
        unpersist_handle.add_callback(run_h)
        unpersist_handle.add_callback(row_h)
    order = [F.col("freq").desc(), F.col("token").asc()]
    cum = with_running_total(
        counts, "freq", order, out="cum_freq", unpersist_handle=run_h
    )
    ranked = with_row_numbers(cum, "rank", order=order, unpersist_handle=row_h)
    # the grand total IS the last (= max) cumulative count, and `cum`'s
    # input is pinned by with_running_total — aggregating raw `counts`
    # instead would re-run the whole corpus tokenization a second time
    total = cum.agg(F.max("cum_freq").cast("double").alias("__total"))
    out = ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "token",
        "freq",
        "cum_freq",
        (F.col("cum_freq").cast("double") / F.col("__total")).alias("coverage"),
    )
    if top_k is not None:
        out = out.where(F.col("rank") <= int(top_k))
    return out
