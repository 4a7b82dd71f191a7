import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.decontam import contamination_flags, decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "alpha beta gamma delta epsilon zeta again alpha beta gamma delta epsilon zeta"),
            (4, "completely unrelated text with no overlap whatsoever here"),
        ],
        ["doc_id", "text"],
    )


@pytest.fixture(scope="module")
def bench(spark):
    # contains the 3-gram "beta gamma delta" and "two three four"
    return spark.createDataFrame(
        [("the beta gamma delta question",), ("answer: two three four",)],
        ["text"],
    )


def test_flags(corpus, bench):
    got = {r["doc_id"]: r for r in contamination_flags(corpus, bench, n=3).collect()}
    assert got[1]["contaminated"] and got[1]["n_contaminated"] == 1
    assert got[2]["contaminated"]
    # doc 3 repeats the contaminated gram — distinct grams counted once
    assert got[3]["n_contaminated"] == 1
    assert not got[4]["contaminated"] and got[4]["n_contaminated"] == 0


def test_min_overlap_threshold(corpus, spark):
    bench2 = spark.createDataFrame(
        [("alpha beta gamma plus beta gamma delta plus gamma delta epsilon",)], ["text"]
    )
    # doc 1 shares 3 distinct 3-grams with bench2, doc 2 none
    strict = contamination_flags(corpus, bench2, n=3, min_overlap=3)
    got = {r["doc_id"]: r["contaminated"] for r in strict.collect()}
    assert got[1] is True and got[2] is False


def test_decontaminate_drops_and_keeps_columns(corpus, bench):
    clean = decontaminate(corpus, bench, n=3)
    assert set(clean.columns) == {"doc_id", "text"}
    assert {r["doc_id"] for r in clean.collect()} == {4}


def test_short_docs_no_grams(spark, bench):
    docs = spark.createDataFrame([(9, "too short")], ["doc_id", "text"])
    got = contamination_flags(docs, bench, n=3).collect()
    assert got[0]["n_contaminated"] == 0 and not got[0]["contaminated"]


def test_count_distinct_false_counts_occurrences(corpus, bench):
    # doc 3 repeats the contaminated gram twice: occurrence counting
    # sees 2, distinct counting sees 1; the flag agrees at min_overlap=1
    occ = {
        r["doc_id"]: r
        for r in contamination_flags(
            corpus, bench, n=3, count_distinct=False
        ).collect()
    }
    assert occ[3]["n_contaminated"] == 2 and occ[3]["contaminated"]
    assert occ[1]["n_contaminated"] == 1
    assert not occ[4]["contaminated"]
    dis = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_flags(corpus, bench, n=3).collect()
    }
    assert dis == {d: occ[d]["contaminated"] for d in dis}
