"""Market-basket co-occurrence mining: frequent item pairs and
association-rule metrics (support / confidence / lift) over a
(basket, item) relation — order↔part affinity, doc↔entity
co-mention, user↔feature adoption.

The text-side twin is :func:`~spark_extension_spark.operators.ranking.
pmi_pairs` (windowed token collocations); this operates on explicit
basket membership and reports the rule metrics a recommender /
cross-sell analysis expects.

Execution shape: distinct membership → per-basket self-equi-join on
the basket key (pairs only form inside a basket — never a global
cross join) → pair-count aggregate, with item counts and the basket
total broadcast back.  The self-join is quadratic in *basket size*,
not corpus size; ``max_basket_size`` drops pathological baskets (the
"one order containing the whole catalog" guard) with the same
explicit-cap discipline as the dedup operators.
"""

from __future__ import annotations

from typing import Optional, TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from ..utils import UnpersistHandle

__all__ = ["association_rules"]


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket_size: Optional[int] = 1000,
    unpersist_handle: Optional["UnpersistHandle"] = None,
) -> DataFrame:
    """Association rules over item pairs co-occurring in a basket:
    one row per ordered pair ``(antecedent, consequent)`` whose
    co-occurrence count reaches ``min_count``, with

    - ``support``     = P(a ∧ b)  — co-baskets / total baskets,
    - ``confidence``  = P(b | a)  — co-baskets / antecedent baskets,
    - ``lift``        = confidence / P(b) — >1 means genuinely
      associated, not just individually popular.

    **Unlike every other operator in this module family, construction
    is EAGER and the result is a SNAPSHOT**: calling this function
    runs one Spark action (it persists the deduplicated membership and
    counts baskets), and the basket total is frozen into the returned
    plan as a literal.  Re-executing the returned frame after the
    source data changes therefore recomputes pair counts against the
    NEW data but support/lift against the OLD basket total — re-call
    the function instead of re-running a stale frame over changed
    input.  This is the deliberate static-batch contract; see the
    persist note below for why laziness was a correctness trap here.

    Both directions of every qualifying pair are emitted (confidence
    and lift are asymmetric).  Membership is set-valued: duplicate
    (basket, item) rows count once; NULL basket/item rows are
    excluded.  Baskets above ``max_basket_size`` items are dropped
    entirely (quadratic pair fan-out; ``None`` disables the cap).
    All metrics are exact integer ratios evaluated as single double
    divisions — engine-replayable.

    The deduplicated (basket, item) membership feeds FOUR consumers
    (basket total, per-item counts, both self-join sides), so it is
    persisted and forced once by the basket-count action — unpersisted,
    each consumer re-ran the scan+distinct (the round-10 REST-census
    two-consumer trap), and AQE's parallel broadcast builds race a lazy
    cache.  The basket total rides into the metrics as a driver
    literal, which also removes the former 1-row cross join.  Pass
    ``unpersist_handle`` to release the membership cache when done;
    without one the cache lives until session GC (the same contract as
    the dedup pair generators' internal persists).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    b, i = F.col(basket_col), F.col(item_col)
    mem = (
        df.where(b.isNotNull() & i.isNotNull())
        .select(b.alias("__b"), i.alias("__i"))
        .distinct()
    )
    if max_basket_size is not None:
        ok = (
            mem.groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__sz"))
            .where(F.col("__sz") <= int(max_basket_size))
            .select("__b")
        )
        mem = mem.join(ok, "__b", "left_semi")
    mem = mem.persist()
    if unpersist_handle is not None:
        unpersist_handle.set_dataframe(mem)
    # one action: forces the membership cache AND yields the exact
    # basket total as a plan literal (identical value to the former
    # count_distinct aggregate — mem is already (basket, item) distinct)
    n_baskets = mem.select("__b").distinct().count()
    item_counts = mem.groupBy(F.col("__i").alias("antecedent")).agg(
        F.count(F.lit(1)).cast("long").alias("__na")
    )
    a = mem.select(F.col("__b"), F.col("__i").alias("antecedent"))
    c = mem.select(F.col("__b"), F.col("__i").alias("consequent"))
    pairs = (
        a.join(c, "__b")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= int(min_count))
    )
    cons_counts = item_counts.select(
        F.col("antecedent").alias("consequent"), F.col("__na").alias("__nc")
    )
    out = pairs.join(F.broadcast(item_counts), "antecedent").join(
        F.broadcast(cons_counts), "consequent"
    )
    nb = F.lit(int(n_baskets)).cast("double")
    support = F.col("n_ab").cast("double") / nb
    confidence = F.col("n_ab").cast("double") / F.col("__na").cast("double")
    lift = (
        F.col("n_ab").cast("double") / F.col("__na").cast("double")
    ) / (F.col("__nc").cast("double") / nb)
    return out.select(
        "antecedent",
        "consequent",
        "n_ab",
        F.col("__na").alias("n_antecedent"),
        F.col("__nc").alias("n_consequent"),
        support.alias("support"),
        confidence.alias("confidence"),
        lift.alias("lift"),
    )
