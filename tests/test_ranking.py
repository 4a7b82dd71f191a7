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


# -- unigram LM / doc log-likelihood ----------------------------------------


def test_unigram_lm_probabilities_sum_below_one(docs):
    from spark_extension_spark.operators.ranking import unigram_lm

    lm = {r["token"]: r["logp"] for r in unigram_lm(docs, k=1.0).collect()}
    total_mass = sum(math.exp(lp) for lp in lm.values())
    assert 0.9 < total_mass < 1.0  # reserved mass for unseen tokens
    # "the" (8 occurrences) is the most probable token
    assert max(lm, key=lm.get) == "the"


def test_doc_logprob_self_scored(docs):
    from spark_extension_spark.operators.ranking import doc_logprob, unigram_lm

    got = {r["doc_id"]: r for r in doc_logprob(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["n_tokens"] == 9
    # hand-check doc 2: sum over tokens of ln((c+1)/(total + vocab+1)),
    # each logp snapped HALF_UP to the DECIMAL(18,10) grid as documented
    from decimal import ROUND_HALF_UP, Decimal

    snap = lambda x: Decimal(repr(x)).quantize(Decimal("1e-10"), ROUND_HALF_UP)
    lm = {r["token"]: r["logp"] for r in unigram_lm(docs).collect()}
    expect = float(sum(snap(lm[t]) for t in "the quick red fox".split()))
    assert got[2]["sum_logp"] == pytest.approx(expect, rel=1e-12)
    assert got[2]["avg_logp"] == pytest.approx(expect / 4, rel=1e-12)
    # the lorem doc shares no tokens with the rest: most atypical
    assert got[3]["avg_logp"] == min(r["avg_logp"] for r in got.values())


def test_doc_logprob_external_lm_and_unk(docs, spark):
    from spark_extension_spark.operators.ranking import doc_logprob, unigram_lm

    ref = docs.where(F.col("doc_id") != 3)  # LM never saw lorem-ipsum tokens
    lm = unigram_lm(ref)
    # without unk_logp, OOV tokens poison the score visibly (NULL)
    got = {r["doc_id"]: r for r in doc_logprob(docs, lm=lm).collect()}
    assert got[3]["sum_logp"] is None
    assert got[1]["sum_logp"] is not None
    # with unk_logp, OOV tokens take the floor and the score exists
    got2 = {r["doc_id"]: r for r in doc_logprob(docs, lm=lm, unk_logp=-20.0).collect()}
    assert got2[3]["sum_logp"] == pytest.approx(-20.0 * 5)


def test_doc_logprob_partial_oov_is_null_not_partial_sum(docs, spark):
    # The sharp edge of the OOV contract: a document with SOME matched
    # tokens.  SQL SUM skips NULL terms, so before round 8's fix a doc
    # that was 90% out-of-vocabulary scored over only its matched 10%
    # and looked HIGH quality — exactly the junk a quality filter must
    # catch.  The whole score must go NULL, not a silent partial sum.
    from spark_extension_spark.operators.ranking import doc_logprob, unigram_lm

    lm = unigram_lm(docs)  # vocabulary = the fixture corpus
    mixed = spark.createDataFrame(
        [(10, "the quick fox"), (11, "the quick zzzunseen")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in doc_logprob(mixed, lm=lm).collect()}
    # fully in-vocab doc scores; 2-of-3-matched doc propagates NULL
    assert got[10]["sum_logp"] is not None and got[10]["avg_logp"] is not None
    assert got[11]["n_tokens"] == 3  # tokens counted even when unscored
    assert got[11]["sum_logp"] is None and got[11]["avg_logp"] is None

    # with unk_logp the same doc scores matched-sum + floor, exactly
    from decimal import ROUND_HALF_UP, Decimal

    snap = lambda x: Decimal(repr(x)).quantize(Decimal("1e-10"), ROUND_HALF_UP)
    lmv = {r["token"]: r["logp"] for r in lm.collect()}
    expect = float(snap(lmv["the"]) + snap(lmv["quick"]) + snap(-20.0))
    got2 = {
        r["doc_id"]: r for r in doc_logprob(mixed, lm=lm, unk_logp=-20.0).collect()
    }
    assert got2[11]["sum_logp"] == pytest.approx(expect, rel=1e-12)
    assert got2[11]["avg_logp"] == pytest.approx(expect / 3, rel=1e-12)


def test_doc_logprob_empty_doc(spark):
    from spark_extension_spark.operators.ranking import doc_logprob

    docs = spark.createDataFrame([(1, "only punctuation ..."), (2, "...")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in doc_logprob(docs).collect()}
    assert got[2]["n_tokens"] == 0
    assert got[2]["sum_logp"] is None and got[2]["avg_logp"] is None


def test_doc_logprob_partitioning_independent(docs):
    from spark_extension_spark.operators.ranking import doc_logprob

    a = {r["doc_id"]: r["sum_logp"] for r in doc_logprob(docs.coalesce(1)).collect()}
    b = {r["doc_id"]: r["sum_logp"] for r in doc_logprob(docs.repartition(7)).collect()}
    assert a == b  # decimal sums: bit-identical under any partitioning


class TestSparseCosine:
    def test_matches_dense_formulation(self, spark):
        # tiny corpus: verify against numpy dense cosine of the same
        # tf-idf weights
        docs = spark.createDataFrame(
            [
                (1, "apple banana apple cherry"),
                (2, "apple banana cherry"),
                (3, "dog cat mouse"),
                (4, "dog cat mouse dog"),
                (5, "zebra"),
            ],
            ["doc_id", "text"],
        )
        from spark_extension_spark.operators.ranking import sparse_cosine_pairs, tfidf

        got = {
            (r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in sparse_cosine_pairs(docs, min_sim=0.0).collect()
        }
        import numpy as np

        w = tfidf(docs).collect()
        vocab = sorted({r["token"] for r in w})
        vecs = {}
        for r in w:
            vecs.setdefault(r["doc_id"], np.zeros(len(vocab)))[vocab.index(r["token"])] = r["tfidf"]
        for (a, b), sim in got.items():
            va, vb = vecs[a], vecs[b]
            want = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            assert abs(sim - want) < 1e-9
        # docs 1-2 similar, 3-4 similar, no cross pairs, 5 isolated
        assert (1, 2) in got and (3, 4) in got
        assert (1, 3) not in got and not any(5 in p for p in got)

    def test_disjoint_docs_never_enumerated(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta")], ["doc_id", "text"]
        )
        from spark_extension_spark.operators.ranking import sparse_cosine_pairs

        assert sparse_cosine_pairs(docs, min_sim=0.0).count() == 0

    def test_partitioning_independent(self, spark, sf_dir):
        from conftest import load
        from spark_extension_spark.operators.ranking import sparse_cosine_pairs

        docs = load(spark, sf_dir, "documents")
        a = sparse_cosine_pairs(docs, min_sim=0.8, min_df=2, max_token_df=40)
        b = sparse_cosine_pairs(
            docs.repartition(13, "lang"), min_sim=0.8, min_df=2, max_token_df=40
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_zipf_report_powerlaw_recovery(spark):
    """A synthetic corpus with freq ∝ rank^-1 must fit alpha ≈ 1 with
    high r2; a flat corpus must fit alpha ≈ 0."""
    from spark_extension_spark.operators.ranking import zipf_report

    zipf_docs, word_id = [], 0
    # 200 types, type r repeated ~ 1000/r times
    text = []
    for r in range(1, 201):
        text += [f"w{r:03d}"] * max(1000 // r, 1)
    zipf_docs = [(1, " ".join(text))]
    rep = zipf_report(spark.createDataFrame(zipf_docs, ["doc_id", "text"])).collect()[0]
    assert 0.8 < rep["alpha"] < 1.2
    assert rep["r2"] > 0.95
    assert rep["n_types"] == 200

    flat = [(1, " ".join(f"t{i}" for i in range(100)) * 5)]
    rep2 = zipf_report(spark.createDataFrame(flat, ["doc_id", "text"])).collect()[0]
    assert abs(rep2["alpha"]) < 0.05  # every type equally frequent


def test_zipf_report_partitioning_independent(spark, sf_dir):
    from spark_extension_spark.operators.ranking import zipf_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = zipf_report(docs).collect()[0]
    b = zipf_report(docs.repartition(13)).collect()[0]
    assert a == b


def test_pmi_collocation_detection(spark):
    """A pair that always co-occurs ("san francisco") must out-PMI a
    pair of independent frequent tokens."""
    from spark_extension_spark.operators.ranking import pmi_pairs

    docs = []
    for i in range(50):
        # "san francisco" always adjacent; "the"/"cat" independent
        docs.append((i, f"the san francisco cat walked w{i} the dog sat"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {(r["x"], r["y"]): r for r in pmi_pairs(df, window=2, min_count=5).collect()}
    sf = out[("san", "francisco")]
    assert sf["c_xy"] == 50
    # always-adjacent pair: strong positive association (the window=2
    # pair pool dilutes p_xy, so "perfect" lands well below 1.0)
    assert sf["npmi"] > 0.5
    # "the dog" is also always adjacent but "the" is twice as frequent:
    # PMI must rank the exclusive pair higher
    assert sf["pmi"] > out[("the", "dog")]["pmi"]
    assert -1.0 <= min(r["npmi"] for r in out.values()) <= 1.0


def test_pmi_partitioning_independent(spark, sf_dir):
    from spark_extension_spark.operators.ranking import pmi_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, pmi_pairs(docs, min_count=10).collect()))
    b = sorted(map(tuple, pmi_pairs(docs.repartition(9), min_count=10).collect()))
    assert a == b


def test_pmi_rejects_bad_params(spark):
    import pytest as _pytest
    from spark_extension_spark.operators.ranking import pmi_pairs

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        pmi_pairs(df, window=0)
    with _pytest.raises(ValueError):
        pmi_pairs(df, min_count=0)


def test_bigram_lm_probabilities_normalize(spark):
    """Successor probabilities for one history sum to < 1 (reserved
    unseen mass) and to ~1 including it."""
    import math

    from spark_extension_spark.operators.ranking import bigram_lm

    df = spark.createDataFrame(
        [(1, "a b a c a b")], ["doc_id", "text"]
    )
    rows = {(r["w1"], r["w2"]): r["logp"] for r in bigram_lm(df, k=1.0).collect()}
    # history 'a': successors b (x2), c (x1); V=3
    p_b = math.exp(rows[("a", "b")])
    p_c = math.exp(rows[("a", "c")])
    assert p_b > p_c
    assert p_b + p_c < 1.0


def test_doc_logprob_bigram_flags_scrambled_text(spark):
    """Documents with typical bigrams must outscore documents whose
    bigrams never occur elsewhere — the quality signal itself."""
    from spark_extension_spark.operators.ranking import doc_logprob_bigram

    common = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    weird = [(100, "dog the over fox brown lazy jumps quick the")]
    df = spark.createDataFrame(common + weird, ["doc_id", "text"])
    scores = {r["doc_id"]: r["avg_logp"] for r in doc_logprob_bigram(df).collect()}
    assert scores[0] > scores[100]


def test_doc_logprob_bigram_partitioning_independent(spark, sf_dir):
    from spark_extension_spark.operators.ranking import doc_logprob_bigram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, doc_logprob_bigram(docs).collect()))
    b = sorted(map(tuple, doc_logprob_bigram(docs.repartition(7)).collect()))
    assert a == b


class TestVocabCurve:
    def test_known_coverage(self, spark):
        from spark_extension_spark.operators.ranking import vocab_curve

        df = spark.createDataFrame(
            [(1, "a a a b b c"), (2, "a b. C!")], ["doc_id", "text"]
        )
        # freqs: a=4, b=3, c=2 -> total 9
        out = {r["rank"]: r for r in vocab_curve(df).collect()}
        assert [out[i]["token"] for i in (1, 2, 3)] == ["a", "b", "c"]
        assert [out[i]["freq"] for i in (1, 2, 3)] == [4, 3, 2]
        assert out[1]["cum_freq"] == 4 and out[3]["cum_freq"] == 9
        assert abs(out[2]["coverage"] - 7 / 9) < 1e-12
        assert out[3]["coverage"] == 1.0

    def test_top_k_truncates_output_not_total(self, spark):
        from spark_extension_spark.operators.ranking import vocab_curve

        df = spark.createDataFrame([(1, "x x x y z")], ["doc_id", "text"])
        out = vocab_curve(df, top_k=1).collect()
        assert len(out) == 1
        assert abs(out[0]["coverage"] - 3 / 5) < 1e-12  # denominator is ALL tokens


class TestSemanticDecontam:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_flags_near_benchmark(self, spark):
        from spark_extension_spark.operators.similarity import (
            semantic_decontam_flags,
            semantic_decontaminate,
        )

        corpus = self._df(
            spark,
            [
                (1, [1.0, 0.0]),        # exactly a benchmark direction
                (2, [0.99, 0.14]),      # close to it
                (3, [0.0, 1.0]),        # orthogonal
                (4, None),              # unscorable
                (5, [0.0, 0.0]),        # zero norm
            ],
        )
        bench = self._df(spark, [(100, [2.0, 0.0])])
        out = {r["vec_id"]: r for r in
               semantic_decontam_flags(corpus, bench, threshold=0.95).collect()}
        assert out[1]["contaminated"] and abs(out[1]["max_benchmark_cosine"] - 1.0) < 1e-12
        assert out[2]["contaminated"]
        assert not out[3]["contaminated"] and abs(out[3]["max_benchmark_cosine"]) < 1e-12
        assert out[4]["max_benchmark_cosine"] is None and not out[4]["contaminated"]
        assert out[5]["max_benchmark_cosine"] is None and not out[5]["contaminated"]

        kept = semantic_decontaminate(corpus, bench, threshold=0.95)
        assert sorted(r["vec_id"] for r in kept.collect()) == [3, 4, 5]

    def test_empty_or_degenerate_benchmark(self, spark):
        from spark_extension_spark.operators.similarity import semantic_decontam_flags

        corpus = self._df(spark, [(1, [1.0, 0.0])])
        bench = self._df(spark, [(9, None), (10, [0.0, 0.0])])
        out = semantic_decontam_flags(corpus, bench).collect()
        assert len(out) == 1
        assert out[0]["max_benchmark_cosine"] is None
        assert out[0]["contaminated"] is False

    def test_ragged_benchmark_raises(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.similarity import semantic_decontam_flags

        corpus = self._df(spark, [(1, [1.0, 0.0])])
        bench = self._df(spark, [(2, [1.0, 0.0]), (3, [1.0, 0.0, 0.0])])
        with _pytest.raises(ValueError, match="inconsistent dimensions"):
            semantic_decontam_flags(corpus, bench)


def test_vocab_curve_unpersist_handle_releases_caches(spark):
    from spark_extension_spark.operators.ranking import vocab_curve
    from spark_extension_spark.utils import UnpersistHandle

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], ["doc_id", "text"]
    )
    before = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    h = UnpersistHandle()
    out = vocab_curve(df, unpersist_handle=h)
    assert out.count() == 3
    h()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after <= before


def test_sparse_cosine_zero_norm_docs_dropped(spark):
    from spark_extension_spark.operators.ranking import sparse_cosine_pairs

    # 'the' appears in every doc -> idf 0 -> docs 1 and 2 have norm 0
    df = spark.createDataFrame(
        [(1, "the"), (2, "the"), (3, "the zebra quagga")],
        "doc_id long, text string",
    )
    rows = sparse_cosine_pairs(df, min_df=1, min_sim=0.1).collect()
    # no crash (ANSI divide-by-zero) and no bogus NaN pairs
    assert rows == []


def test_zipf_degenerate_fit_null_not_crash(spark):
    from spark_extension_spark.operators.ranking import zipf_report

    df = spark.createDataFrame([(1, "alpha beta gamma delta")], "doc_id long, text string")
    row = zipf_report(df).collect()[0]  # all frequencies equal -> vy = 0
    assert row["n_types"] == 4
    assert row["alpha"] == 0.0  # flat fit (vy=0 hits only r2's divisor)
    assert row["r2"] is None
    single = spark.createDataFrame([(1, "solo solo solo")], "doc_id long, text string")
    row1 = zipf_report(single).collect()[0]
    assert row1["n_types"] == 1
    assert row1["alpha"] is None and row1["r2"] is None  # vx = 0


def test_doc_logprob_rejects_oversized_unk_logp(spark):
    from spark_extension_spark.operators.ranking import doc_logprob, unigram_lm

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    lm = unigram_lm(df)
    with pytest.raises(ValueError, match="unk_logp magnitude"):
        doc_logprob(df, lm=lm, unk_logp=-1e12)


def test_pmi_single_pair_type_null_npmi(spark):
    from spark_extension_spark.operators.ranking import pmi_pairs

    df = spark.createDataFrame([(1, "foo bar")], "doc_id long, text string")
    rows = pmi_pairs(df, window=1, min_count=1).collect()
    # the corpus has exactly one pair type: p_xy == 1, -ln(p_xy) is
    # zero — npmi NULL, no crash / no -inf
    assert len(rows) == 1 and rows[0]["npmi"] is None


def test_bm25_score_normalizes_query_terms(spark):
    from spark_extension_spark.operators.ranking import bm25_score

    df = spark.createDataFrame(
        [(1, "the u s army"), (2, "other text here")], "doc_id long, text string"
    )
    rows = bm25_score(df, ["u.s."]).collect()
    # 'u.s.' tokenizes to ['u', 's'] and must match doc 1
    assert [r["doc_id"] for r in rows] == [1]
    with pytest.raises(ValueError, match="no \\[a-z0-9\\]"):
        bm25_score(df, ["..."])
