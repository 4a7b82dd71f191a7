"""Similarity search over embedding columns (``array<float>``).

Two strategies:

* :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the corpus, score with pure column algebra
  (``zip_with`` + ``aggregate`` — JVM-side, codegen), rank per query.
  The baseline, and the right answer whenever |queries| is small.
* :func:`rp_lsh_topk` / :func:`embedding_near_dup_pairs` — the scale
  path: sign-random-projection LSH.  Each vector hashes to a bit-string
  bucket from deterministic ±1 hyperplanes (seeded, engine-portable);
  candidates meet through an equi-join on the bucket (shuffle keyed by
  bucket, never a cross join), then exact cosine verifies.  Multi-probe
  (flipping each bit) trades recall for candidate count.

At 100 TB the brute-force variant is a single broadcast-join scan with
no shuffle of the corpus at all; the LSH variant shuffles only
(bucket, vector) pairs and scores only colliding candidates.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_similarity",
    "brute_force_topk",
    "rp_planes",
    "rp_bucket",
    "rp_lsh_topk",
    "embedding_near_dup_pairs",
]


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two ``array`` columns — computed in double precision,
    left-to-right (deterministic, engine-portable)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm_a = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    norm_b = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((norm_a > 0) & (norm_b > 0), dot / (norm_a * norm_b)).otherwise(F.lit(None))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbours per query vector.

    Returns (query_id, vec_id, cosine, rank); self-matches (same id)
    are excluded.  Ties rank deterministically by neighbour id.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# sign-random-projection LSH
# ---------------------------------------------------------------------------


def rp_planes(num_planes: int, dim: int, seed: int = 42) -> List[List[int]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible anywhere."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"rp_{seed}_{p}_{d}".encode()).digest()
            row.append(1 if digest[0] % 2 == 0 else -1)
        planes.append(row)
    return planes


def rp_bucket(vec: Column, planes: List[List[int]]) -> Column:
    """Bit-string bucket id: sign of the projection onto each plane."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.transform(vec, lambda x: x.cast("double")),
                    F.array(*[F.lit(float(w)) for w in row]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            "1",
        ).otherwise("0")
        for row in planes
    ]
    return F.concat(*bits)


def _with_buckets(
    df: DataFrame, vec_col: str, planes: List[List[int]], probes: int
) -> DataFrame:
    """Attach one row per probed bucket.  probes=0: exact bucket only;
    probes=1 adds every 1-bit-flip neighbour bucket."""
    bucket = rp_bucket(F.col(vec_col), planes)
    if probes == 0:
        return df.withColumn("__bucket", bucket)
    num = len(planes)
    variants = [bucket] + [
        F.concat(
            F.substring(bucket, 1, i),
            F.when(F.substring(bucket, i + 1, 1) == "1", "0").otherwise("1"),
            F.substring(bucket, i + 2, num - i - 1),
        )
        for i in range(num)
    ]
    return df.withColumn("__bucket", F.explode(F.array(*variants)))


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 12,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: Optional[int] = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates from (multi-probe) bucket collisions,
    exact cosine on candidates only."""
    dim = dim or len(corpus.select(vec_col).head()[0])
    planes = rp_planes(num_planes, dim, seed)

    c = _with_buckets(corpus, vec_col, planes, probes=0)
    q = _with_buckets(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
        ),
        "__qvec",
        planes,
        probes=probes,
    )
    candidates = (
        c.join(q, "__bucket")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, "__qvec", vec_col)
        .distinct()
    )
    scored = candidates.select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: Optional[int] = None,
    seed: int = 42,
) -> DataFrame:
    """Vector pairs with cosine ≥ threshold, via exact-bucket LSH
    collision + exact verification.  Near-identical directions land in
    identical buckets, so recall at thresholds ≈1 is high."""
    dim = dim or len(df.select(vec_col).head()[0])
    planes = rp_planes(num_planes, dim, seed)
    bucketed = _with_buckets(df, vec_col, planes, probes=0)

    left = bucketed.select(
        F.col("__bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("__vec_a")
    )
    right = bucketed.select(
        F.col("__bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vec_b")
    )
    return (
        left.join(right, "__bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("__vec_a"), F.col("__vec_b")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search
# ---------------------------------------------------------------------------


def ivf_assignments(
    df: DataFrame,
    centroids: List[List[float]],
    vec_col: str = "embedding",
    n_probes: int = 1,
) -> DataFrame:
    """Attach ``__cell`` — the index of the nearest centroid (or the
    ``n_probes`` nearest, exploded).

    Computed in one Arrow-batched kernel as a normalized matrix multiply
    (vectors × centroidsᵀ): Spark's higher-order array functions are
    *interpreted* (no whole-stage codegen inside lambdas), so k
    per-centroid fold expressions cost k×dim interpreted evals per row,
    while the numpy path is one BLAS call per batch.  Ties break on
    centroid index (argsort is stable over -scores)."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(cents, axis=1)
    norms[norms == 0] = 1.0
    cents_unit = (cents / norms[:, None]).T  # (dim, k)
    probes = n_probes
    vec_name = vec_col

    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, __cell int"

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(__cell=pd.Series(dtype="int32"))
                continue
            vectors = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_name]])
            vnorms = np.linalg.norm(vectors, axis=1)
            vnorms[vnorms == 0] = 1.0
            scores = (vectors / vnorms[:, None]) @ cents_unit  # (n, k)
            top = np.argsort(-scores, axis=1, kind="stable")[:, :probes]  # (n, p)
            repeated = pdf.loc[pdf.index.repeat(probes)].reset_index(drop=True)
            repeated["__cell"] = top.reshape(-1).astype("int32")
            yield repeated

    return df.mapInPandas(kernel, out_schema)


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List[List[float]]:
    """Deterministic coarse centroids: the ``n_centroids`` lowest-id
    corpus vectors (a data-independent seed choice; swap in k-means||
    from ``pyspark.ml`` for production recall)."""
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: Optional[List[List[float]]] = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    centroid (one pass, no shuffle of vectors beyond the final join);
    each query probes its ``n_probes`` nearest cells and scores only the
    vectors inside them.  Candidate fraction ≈ n_probes/n_centroids."""
    from pyspark.sql import Window

    cents = centroids or ivf_centroids(corpus, n_centroids, id_col, vec_col)
    c = ivf_assignments(corpus, cents, vec_col, n_probes=1)
    q = ivf_assignments(
        queries.select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
        ),
        cents,
        "__qvec",
        n_probes=n_probes,
    )
    scored = (
        c.join(q, "__cell")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            cosine_similarity(F.col("__qvec"), F.col(vec_col)).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
