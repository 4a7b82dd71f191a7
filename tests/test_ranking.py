import math

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.ranking import (
    bm25_score,
    document_frequencies,
    term_frequencies,
    tfidf,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick red fox"),
            (3, "lorem ipsum dolor sit amet"),
            (4, "the dog sleeps; the dog dreams of the fox"),
        ],
        ["doc_id", "text"],
    )


def test_term_frequencies(docs):
    tf = {(r["doc_id"], r["token"]): r["tf"] for r in term_frequencies(docs).collect()}
    assert tf[(1, "the")] == 2
    assert tf[(4, "dog")] == 2
    assert tf[(4, "the")] == 3
    assert (3, "the") not in tf


def test_document_frequencies(docs):
    df = {r["token"]: r["df"] for r in document_frequencies(docs).collect()}
    assert df["the"] == 3
    assert df["fox"] == 3
    assert df["lorem"] == 1


def test_tfidf_values(docs):
    rows = {(r["doc_id"], r["token"]): r for r in tfidf(docs).collect()}
    # idf = ln((N+1)/(df+1)) with N=4
    r = rows[(1, "dog")]
    assert r["tf"] == 1 and r["df"] == 2
    assert r["tfidf"] == pytest.approx(math.log(5 / 3))
    # df = N -> idf = ln(5/4) > 0 (smoothed idf never hits zero)
    assert rows[(2, "the")]["idf"] == pytest.approx(math.log(5 / 4))


def test_tfidf_min_df_prunes(docs):
    toks = {r["token"] for r in tfidf(docs, min_df=2).collect()}
    assert "lorem" not in toks and "the" in toks


def test_bm25_ranks_matching_docs(docs):
    got = bm25_score(docs, ["dog", "fox"]).collect()
    ids = [r["doc_id"] for r in got]
    assert set(ids) == {1, 2, 4}
    # doc 4 has dog twice + fox once -> highest score
    assert ids[0] == 4
    n = {r["doc_id"]: r["n_matched"] for r in got}
    assert n == {1: 2, 2: 1, 4: 2}
    # exact value check for the single-term doc: tf=1, df_fox=3, N=4
    lens = {1: 9, 2: 4, 4: 9}
    avglen = (9 + 4 + 9 + 5) / 4
    idf = math.log(1 + (4 - 3 + 0.5) / (3 + 0.5))
    expect = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * lens[2] / avglen))
    row2 = [r for r in got if r["doc_id"] == 2][0]
    assert row2["score"] == pytest.approx(expect)


def test_bm25_case_insensitive_and_empty_terms(docs):
    up = bm25_score(docs, ["DOG"]).collect()
    assert {r["doc_id"] for r in up} == {1, 4}
    with pytest.raises(ValueError):
        bm25_score(docs, [])


def test_bm25_deterministic_across_partitionings(docs):
    a = bm25_score(docs, ["the", "fox", "dog"]).collect()
    b = bm25_score(docs.repartition(7), ["the", "fox", "dog"]).collect()
    assert {(r["doc_id"], r["score"]) for r in a} == {(r["doc_id"], r["score"]) for r in b}
