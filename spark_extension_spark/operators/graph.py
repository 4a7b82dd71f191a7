"""Iterative graph algorithms on edge-list DataFrames.

Connected components (the dedup workhorse) lives in
:mod:`spark_extension_spark.operators.dedup`; this module adds PageRank
— the standard authority score for host/domain-level corpus curation
(rank sources by link authority, downweight link-farm hosts, seed
crawl frontiers).

Execution shape per iteration (the thing that must hold at 10^10
edges): ONE equi-join (ranks onto edges, keyed by source) + ONE
aggregate (contributions keyed by destination) + a 1-row broadcast
(dangling mass).  No driver-side collection of anything wider than the
dangling-mass scalar; iteration state is ``localCheckpoint``-ed every
few rounds to truncate lineage (the exponential-plan guard inherited
from :func:`~spark_extension_spark.operators.dedup.connected_components`).

Determinism: per-destination contribution sums and the dangling mass
run in DECIMAL(38,20) — order-independent, so ranks are bit-identical
across partitionings and engines, and the whole fixed-iteration
computation unrolls into plain SQL for the oracle gate.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "out_degrees"]


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """(id, out_deg) for every source appearing in the edge list."""
    return edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over a directed edge list: (``id``, ``rank``) after
    ``iterations`` synchronous power-iteration steps with uniform
    teleport — ``rank' = (1−d)/N + d·(Σ_in rank/out_deg + dangling/N)``.
    Dangling nodes (no out-edges) redistribute their mass uniformly,
    so total rank is conserved at every step.

    A fixed iteration count (not a convergence epsilon) keeps the
    result a pure deterministic function of the input — reproducible,
    auditable, and exactly replicable in SQL; 10–20 iterations is the
    standard operating range for ranking purposes.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    d = float(damping)

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    deg = out_degrees(e, "src")
    # (id, out_deg) with 0 for dangling nodes — left join once, reused
    # every iteration
    base = nodes.join(deg, "id", "left").select(
        "id", F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg")
    ).persist()
    total = base.agg(F.count(F.lit(1)).cast("double").alias("__n"))

    ranks = base.crossJoin(F.broadcast(total)).select(
        "id", "out_deg", (F.lit(1.0) / F.col("__n")).alias("rank"), "__n"
    )

    for i in range(int(iterations)):
        contrib = (
            e.join(ranks.select("id", "out_deg", "rank"), e["src"] == F.col("id"))
            .select(F.col("dst"), (F.col("rank") / F.col("out_deg").cast("double")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum(F.col("__c").cast("decimal(38,20)")).cast("double").alias("__in"))
        )
        dangling = ranks.where(F.col("out_deg") == 0).agg(
            F.coalesce(
                F.sum(F.col("rank").cast("decimal(38,20)")).cast("double"), F.lit(0.0)
            ).alias("__dang")
        )
        ranks = (
            ranks.join(contrib, ranks["id"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                "out_deg",
                (
                    F.lit(1.0 - d) / F.col("__n")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    )
                ).alias("rank"),
                "__n",
            )
        )
        if checkpoint_every and (i + 1) % int(checkpoint_every) == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)

    return ranks.select("id", "rank")


def pagerank_sql(
    edges_subquery: str,
    iterations: int = 10,
    damping: float = 0.85,
) -> str:
    """DuckDB query computing :func:`pagerank` exactly — the fixed
    iteration count unrolls into one CTE per step with the identical
    arithmetic (decimal contribution sums, double combination)."""
    d = float(damping)
    parts = [
        f"e AS ({edges_subquery})",
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))",
        "deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS out_deg FROM e GROUP BY 1)",
        "base AS (SELECT n.id, COALESCE(deg.out_deg, 0) AS out_deg FROM nodes n LEFT JOIN deg USING (id))",
        "tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base)",
        "r0 AS (SELECT id, out_deg, 1.0 / n AS rank, n FROM base CROSS JOIN tot)",
    ]
    prev = "r0"
    for i in range(1, int(iterations) + 1):
        cur = f"r{i}"
        parts.append(
            f"""c{i} AS (
  SELECT e.dst, CAST(SUM(CAST(r.rank / CAST(r.out_deg AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS cin
  FROM e JOIN {prev} r ON e.src = r.id GROUP BY e.dst
),
g{i} AS (
  SELECT COALESCE(CAST(SUM(CAST(rank AS DECIMAL(38,20))) AS DOUBLE), 0.0) AS dang
  FROM {prev} WHERE out_deg = 0
),
{cur} AS (
  SELECT r.id, r.out_deg,
         {1.0 - d!r} / r.n + {d!r} * (COALESCE(c{i}.cin, 0.0) + g{i}.dang / r.n) AS rank,
         r.n
  FROM {prev} r LEFT JOIN c{i} ON c{i}.dst = r.id CROSS JOIN g{i}
)"""
        )
        prev = cur
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, rank FROM {prev}"
