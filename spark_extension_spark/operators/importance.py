"""Data selection via importance resampling (DSIR-style) and
hashed-n-gram classifier scoring.

At 100 TB you cannot afford a neural quality filter over every
document; the published scalable alternative (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling") scores each
document under two bag-of-hashed-n-grams unigram models — a *target*
(what you want more of) and a *source* (what the raw corpus looks
like) — and resamples by the estimated importance weight
``log w(x) = Σ_feature count · (ln p_target − ln p_source)``.
The same arithmetic is the multinomial-Naive-Bayes log-odds score, so
this module doubles as the classic closed-form quality classifier.

Execution shape (what matters at scale):

* Featurization is one lookahead-capture ``regexp_extract_all`` pass
  per gram order, hashed to ``buckets`` ids with the same
  engine-portable md5-prefix trick as :mod:`sampling` — all JVM
  column algebra, no UDF, no shuffle before the per-doc aggregate.
* The fitted model is exactly ``buckets`` rows (every bucket gets a
  smoothed log-ratio, absent features included) — a few KB that
  **broadcasts** into the scoring join; the corpus never shuffles to
  be scored.
* Per-document sums run in DECIMAL(38,15): decimal addition is
  order-independent, so scores are bit-reproducible across
  partitionings and engines (the BM25/doc_logprob float-sum
  discipline).
* :func:`select_by_importance` turns scores into a without-replacement
  sample with the Gumbel-top-k trick on a frozen md5 draw — fully
  deterministic, partitioning-independent, and exactly replicable in
  ANSI SQL for the oracle gate.

The reference engine has no data-selection surface; this is
beyond-parity functionality for LLM-corpus curation (SURVEY.md §2
"training-data pipeline" extensions).
"""

from __future__ import annotations

import math
from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text

__all__ = [
    "hashed_gram_counts",
    "importance_model",
    "importance_weights",
    "select_by_importance",
    "hashed_grams_sql",
    "importance_model_sql",
]

_TOKEN_PATTERN = "[a-z0-9]+"


def _col(c: Union[str, Column]) -> Column:
    return F.col(c) if isinstance(c, str) else c


def gram_bucket(gram: Union[str, Column], buckets: int, seed: int = 7) -> Column:
    """Hash a feature string into ``[0, buckets)`` — first 8 hex chars
    of ``md5(seed ':' gram)`` as an int64, mod ``buckets``.  Identical
    in Spark and DuckDB (the :func:`sampling.hash_uniform` trick), so
    oracle gates replicate it exactly."""
    key = F.concat(F.lit(f"{int(seed)}:"), _col(gram))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (h % F.lit(int(buckets))).alias("bucket")


def _gram_array(text: Union[str, Column], n_max: int) -> Column:
    """Array of word n-grams (1..n_max) over the normalized text — one
    lookahead-capture ``regexp_extract_all`` pass per gram order, no
    explode until the caller needs rows.

    NOT the ``transform`` + ``element_at`` array-index formulation:
    Catalyst does no common-subexpression elimination across lambda
    bodies, so that version re-runs the tokenization regex once per
    element per gram position — measured ~15x slower end-to-end on the
    DSIR gates (the same trap :func:`dedup.shingles` documents)."""
    norm = normalize_text(text)
    grams = F.regexp_extract_all(norm, F.lit(_TOKEN_PATTERN), F.lit(0))
    for n in range(2, int(n_max) + 1):
        pattern = (
            "(?=(" + (_TOKEN_PATTERN + " ") * (n - 1) + _TOKEN_PATTERN + "))"
            + _TOKEN_PATTERN
        )
        grams = F.concat(grams, F.regexp_extract_all(norm, F.lit(pattern), F.lit(1)))
    return grams


def hashed_gram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 2,
    buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """(id, bucket, cnt) — hashed bag-of-n-grams counts per document.
    One explode + one map-side-combined aggregate; shuffle volume is
    per-document *distinct buckets* (≤ buckets), not text size."""
    grams = df.select(
        F.col(id_col), F.explode(_gram_array(text_col, n_max)).alias("__gram")
    )
    return (
        grams.select(F.col(id_col), gram_bucket("__gram", buckets, seed))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def importance_model(
    target: DataFrame,
    source: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 2,
    buckets: int = 4096,
    seed: int = 7,
    k: float = 1.0,
) -> DataFrame:
    """(bucket, logratio) over **every** bucket in ``[0, buckets)`` —
    the add-``k`` smoothed DSIR importance model
    ``ln((c_t + k)/(T_t + k·B)) − ln((c_s + k)/(T_s + k·B))``.

    Two map-side-combined counts (one per corpus), totals from a
    single-partition window over the ``buckets``-row dense frame,
    densified against a ``spark.range(buckets)`` frame so
    unseen features carry the smoothed default explicitly (no silent
    NULL semantics at score time).  The result is ``buckets`` rows —
    broadcast it into :func:`importance_weights`.

    ``logratio`` is quantized to 9 decimals (since round 5): ln()
    differs between math libraries at the last ulp, and the snapped
    grid makes scores bit-reproducible across engines and platforms.
    Callers pinning pre-quantization outputs will see scores move by
    ≤ 5e-10, and 1e-9 ties now break downstream by id."""

    def bucket_counts(df: DataFrame, out: str) -> DataFrame:
        grams = df.select(F.explode(_gram_array(text_col, n_max)).alias("__gram"))
        return (
            grams.select(gram_bucket("__gram", buckets, seed))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    tgt = bucket_counts(target, "__ct")
    src = bucket_counts(source, "__cs")
    all_buckets = target.sparkSession.range(int(buckets)).select(
        F.col("id").alias("bucket")
    )
    dense = (
        all_buckets.join(tgt, "bucket", "left").join(src, "bucket", "left").select(
            "bucket",
            F.coalesce("__ct", F.lit(0)).cast("long").alias("__ct"),
            F.coalesce("__cs", F.lit(0)).cast("long").alias("__cs"),
        )
    )
    # integer sums: exact and order-independent (double partials are
    # not).  Totals ride a single-partition window over the
    # ``buckets``-row dense frame — a separate dense.agg cross-joined
    # back made `dense` its own second consumer and re-ran BOTH
    # corpora's n-gram featurization (round-10 REST census: ~2x the
    # regex work of the whole model fit)
    from pyspark.sql import Window as _W

    wall = _W.partitionBy()
    dense = dense.withColumn(
        "__tt", F.sum("__ct").over(wall).cast("double")
    ).withColumn("__ts", F.sum("__cs").over(wall).cast("double"))
    kB = float(k) * float(buckets)
    # logratio quantized to 9 decimals: ln() differs between math
    # libraries at the last ulp, and the per-doc weighted sum amplifies
    # that into score drift across engines/platforms.  1e-9 on a
    # log-odds score is far below any selection-relevant resolution,
    # and snapping to the grid makes scores reproducible bit-for-bit
    # everywhere (the SQL mirror rounds identically).
    return dense.select(
        "bucket",
        F.round(
            F.log((F.col("__ct") + F.lit(float(k))) / (F.col("__tt") + F.lit(kB)))
            - F.log((F.col("__cs") + F.lit(float(k))) / (F.col("__ts") + F.lit(kB))),
            9,
        ).alias("logratio"),
    )


def importance_weights(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_max: int = 2,
    buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """(id, n_grams, logw) — per-document log importance weight
    ``Σ_bucket cnt · logratio`` (equivalently the NB log-odds score).

    ``model`` must come from :func:`importance_model` with the same
    featurization parameters.  The join is **broadcast** (model is
    ``buckets`` rows); the per-doc sum runs in DECIMAL(38,15) so the
    score is independent of partial-aggregate order.  Documents with no
    features score 0.0 with ``n_grams = 0`` (visible, not NULL)."""
    counts = hashed_gram_counts(df, id_col, text_col, n_max, buckets, seed)
    per_doc = (
        counts.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(
                (F.col("cnt").cast("double") * F.col("logratio")).cast(
                    "decimal(38,15)"
                )
            ).alias("__s"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce(F.col("__s").cast("double"), F.lit(0.0)).alias("logw"),
        )
    )


def select_by_importance(
    weights: DataFrame,
    n: int,
    id_col: str = "doc_id",
    logw_col: str = "logw",
    seed: int = 123,
    temperature: float = 1.0,
    unpersist_handle=None,
) -> DataFrame:
    """Sample ``n`` documents without replacement with probability
    ∝ ``exp(logw / temperature)`` — the Gumbel-top-k trick: rank by
    ``logw/τ + Gumbel(u)`` with ``u`` a frozen md5 draw, keep the top
    ``n``.  Working in log space avoids ``exp(logw)`` overflow (the
    reason this is not a thin wrapper over ``weighted_sample``).

    Adds a ``gumbel_key`` column; deterministic for a given seed no
    matter the partitioning.  The global top-n is a rank window over a
    range-partitioned sort (Spark's TakeOrderedAndProject handles the
    small-n case without a full sort).

    ``gumbel_key`` is quantized to 9 decimals (since round 5, matching
    the model's ``logratio``) so selections are bit-reproducible across
    engines; keys moving by ≤ 5e-10 can flip which of two
    near-identical candidates sits at the cutoff, with 1e-9 ties broken
    deterministically by id."""
    if n <= 0:
        raise ValueError("n must be positive")
    from .sampling import hash_uniform

    u = hash_uniform(_col(id_col), seed)
    # u in [0,1); ln(-ln(u)) is finite except u=0 (md5 exact-zero:
    # probability 2^-32 per seed — guarded to the draw's resolution)
    safe_u = F.greatest(u, F.lit(2.0 ** -33))
    # quantized to 9 decimals like the model's logratio: ln() is
    # library-dependent at the last ulp, and a snapped key makes the
    # selection (and the diagnostic column) reproducible bit-for-bit
    # across engines; ties introduced at 1e-9 are broken by id
    key = F.round(
        _col(logw_col) / F.lit(float(temperature)) - F.log(-F.log(safe_u)), 9
    )
    keyed = weights.withColumn("gumbel_key", key)
    # top-n: TakeOrderedAndProject (per-partition n-row heaps + one
    # n-row merge) for n up to TOP_N_SPILL_THRESHOLD — the former
    # unpartitioned row_number window single-partition-sorted the
    # ENTIRE corpus (the billion-row hazard, round 10).  Data-selection
    # n is routinely millions, and the TakeOrdered heap does not spill,
    # so above the threshold global_top_n switches to the spillable
    # range-sort + 5-step row-number form.  Selection is identical in
    # both forms: same total order, same n survivors.
    from .sampling import global_top_n

    return global_top_n(
        keyed,
        [F.col("gumbel_key").desc(), _col(id_col).asc()],
        int(n),
        unpersist_handle=unpersist_handle,
    )


# ---------------------------------------------------------------------------
# lock-step DuckDB SQL builders (oracle gates)
# ---------------------------------------------------------------------------


def hashed_grams_sql(
    table: str,
    id_expr: str,
    text_expr: str,
    n_max: int = 2,
    buckets: int = 4096,
    seed: int = 7,
    where: str = "",
) -> str:
    """DuckDB query producing (id, bucket) one row per gram occurrence —
    lock-step with :func:`hashed_gram_counts` before its aggregate."""
    norm = (
        f"trim(regexp_replace(lower({text_expr}), '[^a-z0-9]+', ' ', 'g'))"
    )
    toks = f"regexp_extract_all({norm}, '[a-z0-9]+')"
    gram_lists = ["t"]
    for n in range(2, int(n_max) + 1):
        joined = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
        gram_lists.append(
            f"list_transform(range(1, greatest(len(t) - {n - 1}, 0) + 1), i -> {joined})"
        )
    grams = " || ".join(gram_lists)
    return f"""
SELECT {id_expr} AS id,
       CAST(CONCAT('0x', substr(md5(CONCAT('{int(seed)}:', gram)), 1, 8)) AS BIGINT)
         % {int(buckets)} AS bucket
FROM (SELECT {id_expr}, unnest({grams}) AS gram
      FROM (SELECT {id_expr}, {toks} AS t FROM {table} {where}) base_toks) exploded
"""


def importance_model_sql(
    target_where: str,
    n_max: int = 2,
    buckets: int = 4096,
    seed: int = 7,
    k: float = 1.0,
    table: str = "documents",
    id_expr: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB CTE body (``model AS (...)`` payload) computing
    :func:`importance_model` where target = ``table WHERE target_where``
    and source = the whole ``table``."""
    tgt = hashed_grams_sql(table, id_expr, text_expr, n_max, buckets, seed, f"WHERE {target_where}")
    src = hashed_grams_sql(table, id_expr, text_expr, n_max, buckets, seed)
    kB = float(k) * float(buckets)
    return f"""
tgt AS (SELECT bucket, COUNT(*) AS ct FROM ({tgt}) GROUP BY 1),
src AS (SELECT bucket, COUNT(*) AS cs FROM ({src}) GROUP BY 1),
dense AS (
  SELECT r.range AS bucket,
         COALESCE(tgt.ct, 0) AS ct,
         COALESCE(src.cs, 0) AS cs
  FROM range(0, {int(buckets)}) r
  LEFT JOIN tgt ON tgt.bucket = r.range
  LEFT JOIN src ON src.bucket = r.range
),
tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt, CAST(SUM(cs) AS DOUBLE) AS ts FROM dense),
model AS (
  SELECT bucket,
         round(ln((ct + {float(k)!r}) / (tt + {kB!r}))
           - ln((cs + {float(k)!r}) / (ts + {kB!r})), 9) AS logratio
  FROM dense CROSS JOIN tot
)
"""
