"""Text analysis for large-scale training-data pipelines: token
counting, quality scoring, language identification, fingerprinting.

All hot-path logic is pure ``pyspark.sql.functions`` column algebra —
JVM-side, whole-stage-codegen, zero Python UDFs — so a 100 TB documents
table is processed at scan speed with no shuffle at all (per-row
transforms) or a single hash aggregate (corpus statistics).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "regex_token_count",
    "quality_metrics",
    "with_quality_metrics",
    "language_id",
    "fingerprint",
    "normalize_text",
    "deterministic_shuffle",
    "heavy_hitters",
    "dup_ngram_fraction",
    "gopher_rules",
    "apply_quality_rules",
    "mix_report",
    "chunk_documents",
    "vocab_coverage",
    "char_entropy",
    "repetition_metrics",
    "scrub_pii",
    "scrub_pii_sql",
    "with_scrubbed_pii",
    "language_id_sql",
]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(text) -> Column:
    """Whitespace token count; 0 for empty/blank/null-free semantics
    (null text -> null)."""
    t = F.trim(_col(text))
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def regex_token_count(text) -> Column:
    """BPE-ish token count: runs of word characters or single
    non-word-non-space characters — a stable proxy for subword token
    counts without a tokenizer dependency."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), F.lit(0)))


def normalize_text(text) -> Column:
    """Canonical form used for fingerprinting/dedup: lowercase,
    non-alphanumeric runs collapsed to single spaces, trimmed."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), "[^a-z0-9]+", " "))


def fingerprint(text) -> Column:
    """Deterministic 128-bit document fingerprint (hex) over the
    normalized text — equal fingerprints == exact near-normalized dups."""
    return F.md5(normalize_text(text))


# ratios guarded against empty documents
def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0)


def quality_metrics(text) -> Dict[str, Column]:
    """Quality signals: length, token stats, punctuation/digit/upper
    ratios, mean word length — the standard cheap quality filters."""
    t = _col(text)
    n_chars = F.length(t)
    tokens = token_count(t)
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    # explicit whitespace class, identical in Java regex and RE2 (\s
    # differs between them on \x0b): without \r a CRLF document counts
    # carriage returns as token characters and inflates mean_token_len
    spaces = F.length(F.regexp_replace(t, "[^ \t\n\r\f\x0b]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": tokens,
        "alpha_ratio": _ratio(alpha, n_chars),
        "digit_ratio": _ratio(digits, n_chars),
        "punct_ratio": _ratio(punct, n_chars),
        "upper_ratio": _ratio(upper, alpha),
        "mean_token_len": _ratio(n_chars - spaces, tokens),
    }


def with_quality_metrics(df: DataFrame, text: str = "text", prefix: str = "q_") -> DataFrame:
    """Input plus every :func:`quality_metrics` column (prefixed) — a
    scan-speed projection, no shuffle."""
    cols = quality_metrics(text)
    return df.select("*", *[c.alias(prefix + name) for name, c in cols.items()])


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping context windows of
    ``chunk_tokens`` whitespace tokens — the training-prep step that
    turns long documents into model-sized sequences: one output row per
    chunk, ``(id, chunk_id, text, n_tokens)``, chunk *i* starting at
    token ``i·(chunk_tokens − overlap)``.  The final chunk may be
    shorter; blank/empty documents produce no chunks; original token
    text is preserved (inter-token whitespace collapses to single
    spaces — the only reversible normalization a token split allows).

    Pure column algebra: tokenize once, generate chunk starts with
    ``sequence``, slice/join per start, one ``posexplode`` — zero
    shuffles, zero UDFs, scan-speed at any scale.  Output size is
    ``n/stride`` rows per document, exactly what the math says, skew-free
    (a long document fans out within its input partition)."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap} vs {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    t = F.trim(_col(text_col))
    tokens = F.split(t, r"\s+")
    n = F.size(tokens)
    # upper bound n - overlap - 1, not n - 1: a start s >= n - overlap
    # yields a chunk whose every token is already covered by the chunk
    # at s - stride — 100%-duplicated training text.  greatest(0, ...)
    # keeps one chunk for documents shorter than the overlap (and
    # guards sequence(0, -1), which would generate DESCENDING).
    starts = F.when(t.isNull() | (t == ""), F.array().cast("array<int>")).otherwise(
        F.sequence(
            F.lit(0),
            F.greatest(F.lit(0), n - F.lit(overlap) - 1),
            F.lit(stride),
        )
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(tokens, s + 1, chunk_tokens), " ")
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "__chunk")
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.col("__chunk").alias(text_col),
        F.size(F.split(F.col("__chunk"), r"\s+")).alias("n_tokens"),
    )


def mix_report(
    df: DataFrame,
    strata_col,
    text: str = "text",
) -> DataFrame:
    """Corpus-composition report per stratum (language, source, split —
    whatever the mix is steered by): ``(stratum, n_docs, doc_share,
    n_tokens, token_share, n_chars)``.  The observability companion to
    :func:`~spark_extension_spark.operators.sampling.resample_to_mix` /
    ``take_token_budget``: what a mixing decision *did* to the corpus,
    measured, not assumed.

    One map-side-combined aggregate (shuffle = one row per stratum);
    the totals ride a single-partition window over the |strata|-row
    frame — NOT a separate ``agg.agg`` cross-joined back, which gave
    the unpersisted aggregate two consumers and ran the token-count
    regex over the corpus twice (round-10 REST census: 2 input scans
    → 1).  long/long division is double in every engine, so the
    shares hash-match an ANSI oracle."""
    from pyspark.sql import Window as _W

    agg = df.groupBy(_col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text).cast("long")).alias("n_tokens"),
        F.sum(F.length(_col(text)).cast("long")).alias("n_chars"),
    )
    wall = _W.partitionBy()
    agg = agg.withColumn("__td", F.sum("n_docs").over(wall)).withColumn(
        "__tt", F.sum("n_tokens").over(wall)
    )
    return agg.select(
        "stratum",
        "n_docs",
        (F.col("n_docs") / F.col("__td")).alias("doc_share"),
        "n_tokens",
        (F.col("n_tokens") / F.col("__tt")).alias("token_share"),
        "n_chars",
    )


def gopher_rules(
    text="text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_digit_ratio: float = 0.2,
    min_alpha_ratio: float = 0.6,
) -> Dict[str, Column]:
    """Gopher-style document quality rules as named *pass* predicates
    over :func:`quality_metrics` (each value is a boolean Column that is
    true when the document passes; the key names the failure).  Pure
    projections — compose aggregation-based signals (e.g. join
    :func:`repetition_metrics` first) by adding entries to the dict
    before handing it to :func:`apply_quality_rules`."""
    m = quality_metrics(text)
    return {
        "too_few_tokens": m["n_tokens"] >= min_tokens,
        "too_many_tokens": m["n_tokens"] <= max_tokens,
        "mean_token_too_short": m["mean_token_len"] >= min_mean_token_len,
        "mean_token_too_long": m["mean_token_len"] <= max_mean_token_len,
        "too_many_digits": m["digit_ratio"] <= max_digit_ratio,
        "not_enough_letters": m["alpha_ratio"] >= min_alpha_ratio,
    }


def apply_quality_rules(
    df: DataFrame,
    rules: Dict[str, Column],
    kept_col: str = "kept",
    reasons_col: str = "failed_rules",
) -> DataFrame:
    """Evaluate named pass-predicates and annotate every row with
    ``kept`` (all rules pass) and ``failed_rules`` (comma-joined names
    of the rules it failed, rule order, empty when kept) — filtering
    with *reasons*, so a 100 TB curation run can report exactly why
    each share of the corpus was dropped instead of silently shrinking.

    A NULL predicate (e.g. NULL text) counts as a failure — nothing
    slips through on three-valued logic.  The whole evaluation is one
    codegen projection: zero shuffles, zero UDFs; ``concat_ws`` skips
    the NULLs of passing rules, so no array materializes either."""
    if not rules:
        raise ValueError("rules must not be empty")
    oks = {name: F.coalesce(pred, F.lit(False)) for name, pred in rules.items()}
    kept: Column = None
    for ok in oks.values():
        kept = ok if kept is None else (kept & ok)
    failed = [F.when(~ok, F.lit(name)) for name, ok in oks.items()]
    return df.select(
        "*", kept.alias(kept_col), F.concat_ws(",", *failed).alias(reasons_col)
    )


def repetition_metrics(df: DataFrame, id_col: str, text: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rules):
    one row per non-empty document with

    - ``n_tokens`` — total tokens;
    - ``n_distinct`` — distinct tokens;
    - ``distinct_ratio`` — vocabulary richness (low → templated/spam);
    - ``top_token_frac`` — share of the single most frequent token
      (high → keyword stuffing / boilerplate loops).

    Shape: explode tokens → two hash aggregates keyed by the document id
    (both map-side combined, one shuffle of (id, token) counts) — the
    SimHash cost profile, shuffle volume bounded by vocabulary, not text
    size.  Documents with zero tokens are omitted (no denominators).
    """
    t = F.trim(_col(text))
    tok = F.explode(F.split(t, r"\s+")).alias("__token")
    per_token = (
        df.select(F.col(id_col), tok)
        .where(F.col("__token") != "")
        .groupBy(id_col, "__token")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return (
        per_token.groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("__cnt").alias("__top"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")).alias("distinct_ratio"),
            (F.col("__top").cast("double") / F.col("n_tokens").cast("double")).alias("top_token_frac"),
        )
    )


# -- language identification ------------------------------------------------

# high-frequency, language-distinctive function words.  ASCII-only marker
# sets keep the regex engines (Java vs RE2) in exact agreement.
_LANG_MARKERS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "une"],
    "es": ["el", "los", "las", "es", "que", "una", "para"],
    "it": ["il", "che", "di", "non", "per", "una", "sono"],
}


def _marker_hits(text: Column, words: Sequence[str]) -> Column:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def language_id(text, min_hits: int = 1) -> Column:
    """N-gram/function-word language guess over a fixed language set;
    ``und`` (undetermined) when no language reaches ``min_hits``.

    Ties break by the fixed language order (en, de, fr, es, it) —
    deterministic and SQL-replicable.
    """
    t = _col(text)
    hits = [(lang, _marker_hits(t, words)) for lang, words in _LANG_MARKERS.items()]
    best = F.greatest(*[h for _, h in hits])
    result = F.lit("und")
    # build the when-chain in reverse so earlier languages win ties
    for lang, h in reversed(hits):
        result = F.when((h == best) & (best >= min_hits), lang).otherwise(result)
    return result


def language_id_sql(text_expr: str, min_hits: int = 1) -> str:
    """The exact DuckDB SQL equivalent of :func:`language_id` — kept next
    to the implementation so the two stay in lock-step."""
    hit = {
        lang: (
            f"len(regexp_extract_all(lower({text_expr}), "
            f"'\\b({'|'.join(words)})\\b'))"
        )
        for lang, words in _LANG_MARKERS.items()
    }
    greatest = "greatest(" + ", ".join(hit.values()) + ")"
    clauses = "\n".join(
        f"WHEN {hit[lang]} = {greatest} AND {greatest} >= {min_hits} THEN '{lang}'"
        for lang in _LANG_MARKERS
    )
    return f"CASE {clauses} ELSE 'und' END"


# PII patterns, deliberately simple and RE2-safe so the Spark (Java
# regex) and DuckDB (RE2) formulations match token-for-token: no
# lookaround, no backreferences, ASCII word boundaries only.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # international (+CC ...) or separator-grouped domestic (3-3/4-4)
    # forms only: the old \+?\d[\d -]{7,}\d swallowed any >=9-char
    # digit/space/dash run — dates ("2026-08-16 14"), id numbers
    # ("4021 7788") — destroying non-PII text
    "phone": r"(\+\d[\d -]{7,}\d|\b\d{3}[- ]\d{3,4}[- ]\d{4}\b)",
}
# scrub order matters: emails first (they contain digits/dots), then IPs,
# then phones — counts are taken on the progressively-scrubbed text so a
# string is never double-counted across categories
_PII_ORDER = ["email", "ip", "phone"]


def scrub_pii(text) -> Dict[str, Column]:
    """Redact emails, IPv4 addresses, and phone numbers with typed
    placeholders (``<EMAIL>``/``<IP>``/``<PHONE>``), returning the
    scrubbed text plus a per-category match count.

    Pure column algebra (JVM regex, whole-stage codegen) — scan-speed, no
    shuffle, no UDF; the regexes are intentionally conservative
    (precision over recall) and identical across engines for the oracle.
    """
    current = _col(text)
    out: Dict[str, Column] = {}
    for kind in _PII_ORDER:
        pattern = _PII_PATTERNS[kind]
        out[f"n_{kind}"] = F.size(
            F.regexp_extract_all(current, F.lit(pattern), F.lit(0))
        )
        current = F.regexp_replace(current, pattern, f"<{kind.upper()}>")
    out["text_scrubbed"] = current
    return out


def scrub_pii_sql(text_expr: str) -> Dict[str, str]:
    """DuckDB expressions in lock-step with :func:`scrub_pii` (DuckDB
    needs the explicit ``'g'`` flag; Spark replaces all by default)."""
    current = text_expr
    out: Dict[str, str] = {}
    for kind in _PII_ORDER:
        # DuckDB single-quoted strings pass backslashes through literally
        pattern = _PII_PATTERNS[kind].replace("'", "''")
        out[f"n_{kind}"] = f"len(regexp_extract_all({current}, '{pattern}'))"
        current = f"regexp_replace({current}, '{pattern}', '<{kind.upper()}>', 'g')"
    out["text_scrubbed"] = current
    return out


def with_scrubbed_pii(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach ``n_email``/``n_ip``/``n_phone`` and replace ``text`` with
    its scrubbed form."""
    cols = scrub_pii(text)
    out = df
    for name, col in cols.items():
        out = out.withColumn(name if name != "text_scrubbed" else text, col)
    return out


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 42) -> DataFrame:
    """Reproducible global shuffle for training-data ordering: rows are
    ordered by an md5 hash of (seed, id) — the same permutation on every
    run, every engine, every cluster size (unlike ``orderBy(rand())``).

    Implemented as a range-partitioned sort on the hash (one exchange);
    compose with :func:`~spark_extension_spark.operators.row_numbers.with_row_numbers`
    for contiguous shuffled sample ids.
    """
    key = F.md5(F.concat_ws("_", F.lit(str(seed)), F.col(id_col).cast("string")))
    return df.orderBy(key)


def heavy_hitters(
    df: DataFrame,
    text: str = "text",
    k: int = 20,
    by: str = None,
) -> DataFrame:
    """Exact top-``k`` most frequent tokens — corpus-wide, or per
    ``by`` group (e.g. per language): (``by``?, token, n, rank).

    Two chained hash aggregates do the heavy lifting map-side (the
    shuffle carries (group, token, partial-count) — vocabulary-sized,
    not corpus-sized); the rank window then sees only one row per
    (group, token).  For the global variant that final window is a
    single partition over the vocabulary — bounded by |vocabulary|,
    which is what makes exact (not sketched) heavy hitters viable at
    100 TB of *text* but would not be viable over an unbounded key
    domain (ids, urls): there, cap the domain first or sketch.

    Ties rank deterministically by token."""
    toks = F.regexp_extract_all(normalize_text(text), F.lit("[a-z0-9]+"), F.lit(0))
    keys = [by] if by else []
    counts = (
        df.select(*keys, F.explode(toks).alias("token"))
        .groupBy(*keys, "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def dup_ngram_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level duplication signal per document (the
    RefinedWeb/Gopher "duplicated n-gram fraction" family): for each
    document, the fraction of its n-gram *occurrences* whose n-gram
    appears in at least ``min_docs`` distinct documents.

    Returns (id, ``n_ngrams``, ``n_dup``, ``dup_frac``); documents too
    short for any n-gram are omitted (no denominator).

    Shape: one shingle pass (lookahead-capture regex, no UDF) → per
    (doc, gram) counts (map-side combined — the only text-sized
    shuffle, keyed by gram after reduction to per-doc vocabulary) →
    per-gram distinct-doc counts (aggregate *of the counts*, already
    small) joined back on the gram key → per-doc sums.  No self-join,
    no explosion; a boilerplate gram shared by B docs costs B join
    rows, not B².
    """
    from .dedup import shingles

    grams = shingles(df, id_col=id_col, text_col=text, n=n, distinct=False)
    per_doc_gram = grams.groupBy(id_col, "shingle").agg(
        F.count(F.lit(1)).alias("__occ")
    )
    gram_docs = per_doc_gram.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("__n_docs")
    )
    joined = per_doc_gram.join(gram_docs, "shingle").select(
        F.col(id_col),
        F.col("__occ"),
        (F.col("__n_docs") >= min_docs).cast("long").alias("__is_dup"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("__occ").alias("n_ngrams"),
            F.sum(F.col("__occ") * F.col("__is_dup")).alias("n_dup"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_ngrams").cast("double")).alias("dup_frac"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document vocabulary coverage / out-of-vocabulary rate against
    a reference token list — the cheap filter for "is this document in
    the tokenizer's language?" and for catching encoding mojibake
    (coverage collapses when bytes aren't text).

    ``vocab`` is any DataFrame with a ``token`` column (duplicates
    tolerated).  Tokens come from the same normalize-and-extract pass
    the ranking operators use, so coverage is comparable with TF-IDF /
    BM25 statistics.

    Scale shape: vocabularies are tokenizer-sized (10⁴–10⁶ rows), so
    the membership test is a broadcast left join onto the exploded
    token stream — the corpus is only ever shuffled by ``id_col`` for
    the per-document aggregate.  Documents with zero tokens are kept
    (coverage 0.0), via a final left join against the id spine.

    Returns ``(id, n_tokens, n_in_vocab, coverage)``.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(normalize_text(text_col), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("token"),
    )
    members = vocab.select("token").distinct().withColumn("__in", F.lit(1))
    per = (
        toks.join(F.broadcast(members), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("__in"), F.lit(0))).cast("long").alias("n_in_vocab"),
        )
    )
    spine = df.select(id_col)
    return (
        spine.join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_in_vocab", F.lit(0)).alias("n_in_vocab"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.coalesce("n_in_vocab", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(0.0).alias("coverage"),
        )
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character-level Shannon entropy (nats):
    ``H = −Σ_c p_c · ln p_c`` over the raw character distribution —
    the gibberish detector ratio metrics miss: keyboard mash and
    base64 blobs run hot (flat distribution), template/repeated
    filler runs cold, natural language sits in a narrow band.

    Returns (id, ``n_chars``, ``entropy``); empty documents get
    ``n_chars = 0`` and NULL entropy (visible, not a fake 0).

    Using ``H = −(1/n)·Σ_c k_c · ln(k_c/n)``, each ``ln(k/n)`` output
    is snapped to an exact DECIMAL(18,10) grid (round to 10 decimals,
    then the same-scale decimal cast — the discipline from
    :func:`~..ranking.doc_logprob`): ``ln`` differs between libm
    builds at the last ulp, and the snap absorbs that spread.  The
    ``k · snapped_ln`` fold is then pure integer-decimal arithmetic —
    order-independent — and only the single final division by ``n``
    touches floats (one IEEE correctly-rounded op).  Unlike rounding
    the ``p·ln p`` *product* (whose 3–4-ulp spread from divide ×
    multiply can straddle a 0.5e-10 grid midpoint), the snapped input
    carries at most the 1-ulp ln spread into the grid, so outputs are
    reproducible across engines and libm builds except in the rare
    case where ``ln`` itself lands within an ulp of a grid midpoint.
    A second quantization stage makes even that case inert: the final
    entropy is snapped to a 1e-7 DECIMAL grid, so an inner flip
    (≤ 1e-10 movement) changes the output only if the entropy also
    sits within 1e-10 of a 0.5e-7 midpoint — two independent
    near-midpoint coincidences.  The quantization perturbs the
    reported entropy by at most ``5e-8`` — far below the metric's
    meaningful resolution (the gibberish/template bands it separates
    differ by ~0.1 nat).

    Scale shape: one char explode (rows = corpus character count — the
    same cost class as tokenization, one scan) into a map-side-combined
    (doc, char) count, then a per-doc exact DECIMAL aggregate of the
    ``k · snapped_ln`` terms — order-independent."""
    chars = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("__c")
    ).where(F.col("__c") != "")
    counts = chars.groupBy(id_col, "__c").agg(F.count(F.lit(1)).alias("__k"))
    n = Window.partitionBy(id_col)
    per_doc = (
        counts.withColumn("__n", F.sum("__k").over(n))
        .select(
            F.col(id_col),
            F.col("__n"),
            (
                F.round(
                    F.log(F.col("__k").cast("double") / F.col("__n").cast("double")),
                    10,
                ).cast("decimal(18,10)")
                # decimal(19,0) covers the full long range of __k —
                # decimal(10,0) would overflow-to-NULL (non-ANSI) past
                # 1e10 occurrences and silently drop the dominant term;
                # (18,10)×(19,0) → precision exactly 38, still lossless
                * F.col("__k").cast("decimal(19,0)")
            ).alias("__t"),
        )
        .groupBy(id_col)
        .agg(
            F.max("__n").alias("n_chars"),
            F.sum("__t").alias("__s"),
        )
        .select(
            F.col(id_col),
            F.col("n_chars"),
            # + 0.0 canonicalizes the all-one-char case: ln(1) = 0
            # exactly, so __s = 0 and -(0/n) is IEEE -0.0; -0.0 + 0.0
            # = +0.0.  The outer snap (round to 7 decimals, same-scale
            # DECIMAL cast, correctly-rounded cast back to double) is
            # the second quantization stage: if an inner ln snap ever
            # flips (the residual 1-ulp-at-a-grid-midpoint case), the
            # entropy moves by ≤ 1e-10 — invisible on the 1e-7 output
            # grid unless the value itself sits within 1e-10 of a
            # 0.5e-7 midpoint.  1e-7 nats is far below the metric's
            # meaningful resolution (gibberish/template bands differ
            # by ~0.1).
            F.round(
                -(F.col("__s").cast("double") / F.col("n_chars").cast("double"))
                + F.lit(0.0),
                7,
            )
            .cast("decimal(18,7)")
            .cast("double")
            .alias("entropy"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars", F.lit(0).cast("long")).alias("n_chars"),
            "entropy",
        )
    )
