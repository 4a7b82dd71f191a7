"""Text analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from spark_extension_spark.operators.text import (
    fingerprint,
    language_id,
    normalize_text,
    quality_metrics,
    regex_token_count,
    token_count,
    with_quality_metrics,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "The cat and the dog, of course!"),
            (2, "Der Hund und die Katze ist nicht da."),
            (3, "Le chat et le chien est une merveille."),
            (4, "xyzzy plugh"),
            (5, ""),
            (6, "  spaced   out  "),
        ],
        ["doc_id", "text"],
    )


def test_token_count(docs):
    got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count("text").alias("n")).collect()}
    assert got[1] == 7 and got[5] == 0 and got[6] == 2


def test_regex_token_count(spark):
    df = spark.createDataFrame([("Hello, world! (x=1)",)], ["text"])
    n = df.select(regex_token_count("text").alias("n")).collect()[0]["n"]
    # Hello , world ! ( x = 1 ) -> 9
    assert n == 9


def test_normalize_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    rows = df.select("doc_id", normalize_text("text").alias("norm"), fingerprint("text").alias("fp")).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["norm"] == "hello world"
    assert by_id[1]["fp"] == by_id[2]["fp"]
    assert by_id[1]["fp"] != by_id[3]["fp"]


def test_quality_metrics(spark):
    df = spark.createDataFrame([("AB cd, 12!",)], ["text"])
    m = df.select(*[c.alias(k) for k, c in quality_metrics("text").items()]).collect()[0]
    assert m["n_chars"] == 10
    assert m["n_tokens"] == 3
    assert m["digit_ratio"] == pytest.approx(0.2)
    assert m["upper_ratio"] == pytest.approx(0.5)
    assert m["punct_ratio"] == pytest.approx(0.2)


def test_with_quality_metrics_schema(docs):
    out = with_quality_metrics(docs)
    assert [c for c in out.columns if c.startswith("q_")] == [
        "q_n_chars", "q_n_tokens", "q_alpha_ratio", "q_digit_ratio",
        "q_punct_ratio", "q_upper_ratio", "q_mean_token_len",
    ]


def test_language_id(docs):
    got = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", language_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_language_id_on_documents_table(spark, sf_dir):
    """The synthetic documents table carries a lang column; our n-gram
    guess should agree on a meaningful share of en docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labelled = docs.select("lang", language_id("text").alias("guess"))
    stats = labelled.groupBy("lang", "guess").count().collect()
    total = sum(r["count"] for r in stats)
    assert total > 0


def test_deterministic_shuffle(spark):
    from spark_extension_spark.operators.text import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    a = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id").collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id").collect()]
    assert a == b                       # reproducible
    assert a != list(range(50))         # actually permuted
    assert sorted(a) == list(range(50)) # a permutation
    c = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=7).collect()]
    assert c != a                       # seed changes the permutation


# -- PII scrubbing ----------------------------------------------------------


def test_scrub_pii_categories(spark):
    from spark_extension_spark import scrub_pii

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@corp.example.org now",),
            ("server at 192.168.0.17 port 80",),
            ("call +44 20 7946 0958 today",),
            ("clean text with no contacts",),
        ],
        ["text"],
    )
    cols = scrub_pii("text")
    out = df.select(
        cols["n_email"].alias("ne"), cols["n_ip"].alias("ni"),
        cols["n_phone"].alias("np"), cols["text_scrubbed"].alias("t"),
    ).collect()
    assert (out[0]["ne"], out[0]["t"]) == (1, "mail <EMAIL> now")
    assert (out[1]["ni"], out[1]["t"]) == (1, "server at <IP> port 80")
    assert (out[2]["np"], out[2]["t"]) == (1, "call <PHONE> today")
    assert out[3] == (0, 0, 0, "clean text with no contacts")


def test_scrub_pii_no_double_count(spark):
    from spark_extension_spark import scrub_pii

    # the email contains digits and the IP contains phone-like digit runs:
    # progressive scrubbing must attribute each once
    df = spark.createDataFrame([("a1.b2@x.io and 10.20.30.40 and +1 555 123 9876",)], ["text"])
    cols = scrub_pii("text")
    row = df.select(
        cols["n_email"].alias("ne"), cols["n_ip"].alias("ni"),
        cols["n_phone"].alias("np"), cols["text_scrubbed"].alias("t"),
    ).first()
    assert (row["ne"], row["ni"], row["np"]) == (1, 1, 1)
    assert row["t"] == "<EMAIL> and <IP> and <PHONE>"


def test_with_scrubbed_pii_replaces_text(spark):
    from spark_extension_spark import with_scrubbed_pii

    df = spark.createDataFrame([(1, "write to a@b.co")], ["id", "text"])
    out = with_scrubbed_pii(df).first()
    assert out["text"] == "write to <EMAIL>"
    assert out["n_email"] == 1 and out["n_ip"] == 0 and out["n_phone"] == 0


# -- repetition metrics -----------------------------------------------------


def test_repetition_metrics_values(spark):
    from spark_extension_spark import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "a a a a b"),           # 5 tokens, 2 distinct, top=4/5
            (2, "x y z"),               # all distinct
            (3, "   "),                 # no tokens -> omitted
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_metrics(df, "doc_id").collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_tokens"] == 5 and got[1]["n_distinct"] == 2
    assert abs(got[1]["top_token_frac"] - 0.8) < 1e-12
    assert abs(got[1]["distinct_ratio"] - 0.4) < 1e-12
    assert got[2]["distinct_ratio"] == 1.0 and got[2]["top_token_frac"] == pytest.approx(1 / 3)


def test_repetition_metrics_no_join(spark):
    from spark_extension_spark import repetition_metrics
    from spark_extension_spark.plans import summarize_plan

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = summarize_plan(repetition_metrics(docs, "doc_id"))
    assert plan.joins == []  # two chained aggregates, no self-join


# -- heavy hitters ----------------------------------------------------------


def test_heavy_hitters_global(spark):
    from spark_extension_spark.operators.text import heavy_hitters

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z"), (3, "q q a")], ["doc_id", "text"]
    )
    got = heavy_hitters(docs, k=2).collect()
    assert [(r["token"], r["n"], r["rank"]) for r in got] == [("a", 5, 1), ("b", 3, 2)]


def test_heavy_hitters_per_group_and_ties(spark):
    from spark_extension_spark.operators.text import heavy_hitters

    docs = spark.createDataFrame(
        [("en", "x y"), ("en", "y x"), ("de", "w")], ["lang", "text"]
    )
    got = heavy_hitters(docs, k=1, by="lang").collect()
    by = {r["lang"]: (r["token"], r["n"]) for r in got}
    # x and y tie at 2; token order breaks the tie deterministically
    assert by == {"en": ("x", 2), "de": ("w", 1)}


# -- corpus-duplicated n-gram fraction ---------------------------------------


def test_dup_ngram_fraction(spark):
    from spark_extension_spark.operators.text import dup_ngram_fraction

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),       # grams: abg, bgd
            (2, "alpha beta gamma other words"), # shares abg
            (3, "nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in dup_ngram_fraction(docs, n=3).collect()}
    assert got[1]["n_ngrams"] == 2 and got[1]["n_dup"] == 1
    assert got[1]["dup_frac"] == 0.5
    assert got[2]["n_dup"] == 1
    assert got[3]["n_dup"] == 0 and got[3]["dup_frac"] == 0.0


def test_dup_ngram_fraction_counts_occurrences(spark):
    from spark_extension_spark.operators.text import dup_ngram_fraction

    # doc 1 repeats the shared gram twice: both occurrences count as dup
    docs = spark.createDataFrame(
        [(1, "a b c zz a b c"), (2, "a b c unrelated tail")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in dup_ngram_fraction(docs, n=3).collect()}
    assert got[1]["n_ngrams"] == 5 and got[1]["n_dup"] == 2
    # short docs with no n-grams are omitted
    docs2 = spark.createDataFrame([(9, "hi")], ["doc_id", "text"])
    assert dup_ngram_fraction(docs2, n=3).count() == 0


# -- quality rules with reasons ---------------------------------------------


def test_apply_quality_rules_reasons(spark):
    from spark_extension_spark.operators.text import apply_quality_rules, gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "word " * 60),                      # passes everything
            (2, "short text"),                      # too few tokens
            (3, "1234 5678 " * 40),                 # digits + no letters (+ short means ok)
            (4, None),                              # null text: fails everything, visibly
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           apply_quality_rules(docs, gopher_rules("text")).collect()}
    assert got[1]["kept"] and got[1]["failed_rules"] == ""
    assert not got[2]["kept"] and "too_few_tokens" in got[2]["failed_rules"]
    assert "too_many_digits" in got[3]["failed_rules"]
    assert "not_enough_letters" in got[3]["failed_rules"]
    assert not got[4]["kept"]  # NULL predicates count as failures
    assert "too_few_tokens" in got[4]["failed_rules"]


def test_apply_quality_rules_custom_and_empty(spark):
    from pyspark.sql import functions as F
    from spark_extension_spark.operators.text import apply_quality_rules

    docs = spark.createDataFrame([(1, "en"), (2, "xx")], ["doc_id", "lang"])
    rules = {"bad_lang": F.col("lang").isin("en", "es", "de")}
    got = {r["doc_id"]: r for r in apply_quality_rules(docs, rules).collect()}
    assert got[1]["kept"] and not got[2]["kept"]
    assert got[2]["failed_rules"] == "bad_lang"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="rules must not be empty"):
        apply_quality_rules(docs, {})


def test_mix_report_shares(spark):
    from spark_extension_spark.operators.text import mix_report

    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e", "en"), (3, "f g h i j", "de")],
        ["doc_id", "text", "lang"],
    )
    got = {r["stratum"]: r for r in mix_report(docs, "lang").collect()}
    assert got["en"]["n_docs"] == 2 and got["de"]["n_docs"] == 1
    assert got["en"]["n_tokens"] == 5 and got["de"]["n_tokens"] == 5
    assert got["en"]["doc_share"] == pytest.approx(2 / 3)
    assert got["en"]["token_share"] == pytest.approx(0.5)
    assert abs(sum(r["token_share"] for r in got.values()) - 1.0) < 1e-12


def test_chunk_documents_windows_and_overlap(spark):
    from spark_extension_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([(1, words), (2, "short"), (3, "  ")], ["doc_id", "text"])
    got = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    # stride 3: starts 0,3,6 -> 3 chunks.  Start 9 is NOT emitted: the
    # lone tail token w9 is already covered by the chunk at start 6
    # (a start inside the final overlap window is 100% duplicated text)
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert by_doc[1][0]["text"] == "w0 w1 w2 w3"
    assert by_doc[1][1]["text"] == "w3 w4 w5 w6"   # one-token overlap
    assert by_doc[1][2]["text"] == "w6 w7 w8 w9"
    assert by_doc[2][0]["text"] == "short"
    assert 3 not in by_doc  # blank docs produce no chunks

    # reconstruction: stripping each chunk's overlap prefix rebuilds the doc
    rebuilt = by_doc[1][0]["text"].split()
    for i in (1, 2):
        rebuilt += by_doc[1][i]["text"].split()[1:]
    assert rebuilt == words.split()


def test_chunk_documents_validation(spark):
    from spark_extension_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="chunk_tokens must be positive"):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError, match="overlap must be in"):
        chunk_documents(docs, 4, overlap=4)


def test_vocab_coverage(spark):
    from spark_extension_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zzz qqq"), (3, ""), (4, "THE Cat!")],
        ["doc_id", "text"],
    )
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("mat",), ("the",)], ["token"]  # dup tolerated
    )
    got = {r["doc_id"]: r for r in vocab_coverage(docs, vocab).collect()}
    assert got[1]["n_tokens"] == 6 and got[1]["n_in_vocab"] == 4
    assert abs(got[1]["coverage"] - 4 / 6) < 1e-12
    assert got[2]["n_in_vocab"] == 0 and got[2]["coverage"] == 0.0
    # empty doc kept with zero coverage
    assert got[3]["n_tokens"] == 0 and got[3]["coverage"] == 0.0
    # normalization: case/punctuation insensitive
    assert got[4]["n_tokens"] == 2 and got[4]["n_in_vocab"] == 2


def test_char_entropy_signal(spark):
    """Flat random-ish text runs hot, repeated filler runs cold, and a
    single-character doc has zero entropy."""
    import math

    from spark_extension_spark.operators.text import char_entropy

    docs = [
        (1, "abcdefghijklmnopqrstuvwxyz"),   # flat: H = ln(26)
        (2, "aaaaaaaaaaaaaaaaaaaaaaaaaa"),   # constant: H = 0
        (3, "abababababababababababab"),     # two symbols: H = ln(2)
        (4, ""),                             # empty: NULL, visible
    ]
    out = {r["doc_id"]: r for r in char_entropy(spark.createDataFrame(docs, ["doc_id", "text"])).collect()}
    assert out[1]["entropy"] == pytest.approx(math.log(26))
    assert out[2]["entropy"] == 0.0
    assert out[3]["entropy"] == pytest.approx(math.log(2))
    assert out[4]["n_chars"] == 0 and out[4]["entropy"] is None
    assert out[1]["entropy"] > out[3]["entropy"] > out[2]["entropy"]


def test_char_entropy_partitioning_independent(spark, sf_dir):
    from spark_extension_spark.operators.text import char_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    a = sorted(map(tuple, char_entropy(docs).collect()))
    b = sorted(map(tuple, char_entropy(docs.repartition(11)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


def _ref_bpe_train(word_counts, n_merges, min_pair_count=2):
    """Pure-Python reference BPE (Sennrich-style greedy trainer)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        pairs = {p: c for p, c in pairs.items() if c >= min_pair_count}
        if not pairs:
            break
        (a, b), _c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _ref_segment(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class TestBpe:
    CORPUS = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]

    def test_pair_counts_match_reference(self, spark):
        from collections import Counter

        from spark_extension_spark.operators.bpe import bpe_pair_counts

        df = spark.createDataFrame([(i, t) for i, t in enumerate(self.CORPUS)], ["doc_id", "text"])
        got = {(r["sym_a"], r["sym_b"]): r["cnt"] for r in bpe_pair_counts(df).collect()}

        words = Counter(w for t in self.CORPUS for w in t.split())
        want = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                want[(w[i], w[i + 1])] += c
        assert got == dict(want)

    def test_train_matches_reference_bpe(self, spark):
        from collections import Counter

        from spark_extension_spark.operators.bpe import bpe_train

        df = spark.createDataFrame([(i, t) for i, t in enumerate(self.CORPUS)], ["doc_id", "text"])
        got = [(r["sym_a"], r["sym_b"]) for r in bpe_train(df, 8).orderBy("rank").collect()]
        words = Counter(w for t in self.CORPUS for w in t.split())
        want = _ref_bpe_train(words, 8)
        assert got == want

    def test_segment_matches_reference_and_roundtrip(self, spark):
        from collections import Counter

        from spark_extension_spark.operators.bpe import bpe_segment, bpe_train

        df = spark.createDataFrame([(i, t) for i, t in enumerate(self.CORPUS)], ["doc_id", "text"])
        merges_rows = bpe_train(df, 6).orderBy("rank").collect()
        merges = [(r["sym_a"], r["sym_b"]) for r in merges_rows]

        seg = {r["doc_id"]: list(r["tokens"]) for r in bpe_segment(df, merges_rows).collect()}
        for i, t in enumerate(self.CORPUS):
            want = [tok for w in t.split() for tok in _ref_segment(w, merges)]
            assert seg[i] == want, f"doc {i}"
            # lossless: concatenation restores the normalized text
            assert "".join(seg[i]) == t.replace(" ", "")

    def test_train_deterministic_across_partitionings(self, spark):
        from spark_extension_spark.operators.bpe import bpe_train

        rows = [(i, self.CORPUS[i % len(self.CORPUS)]) for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        a = [tuple(r) for r in bpe_train(df.coalesce(1), 5).collect()]
        b = [tuple(r) for r in bpe_train(df.repartition(7), 5).collect()]
        assert a == b

    def test_train_early_stop_and_guard(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.bpe import bpe_train

        df = spark.createDataFrame([(0, "ab cd ef")], ["doc_id", "text"])
        # every pair occurs once -> below min_pair_count=2 -> no merges
        assert bpe_train(df, 5).count() == 0
        with _pytest.raises(ValueError):
            bpe_train(df, 0)

    def test_train_sql_oracle_three_way_on_random_corpora(self, spark):
        """bpe_train (Spark), bpe_train_sql (DuckDB), and the pure-Python
        reference must agree merge-for-merge on adversarial corpora —
        including chained-repeat words (the consuming-replace fixpoint's
        hard case) and early-stop corpora."""
        from collections import Counter

        import duckdb
        import pandas as pd

        from spark_extension_spark.operators.bpe import bpe_train, bpe_train_sql

        corpora = [
            ["ababab ababab abab", "banana bandana banana"],
            ["xxxxxxxx xxxx xx", "xyxyxyxy xyxy"],        # chained repeats
            ["aaaa aaaa", "aaab aaab aaab", "ba ba"],
            ["q w e r t y"],                                # early stop: no pair >= 2
            ["the cat sat", "the bat sat", "the cat sat on the mat"],
        ]
        for corpus in corpora:
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
            )
            got = [
                (r["sym_a"], r["sym_b"])
                for r in bpe_train(df, 6).orderBy("rank").collect()
            ]
            want = _ref_bpe_train(
                Counter(w for t in corpus for w in t.split()), 6
            )
            assert got == want, corpus

            con = duckdb.connect()
            con.register(
                "documents",
                pd.DataFrame(
                    {"doc_id": range(len(corpus)), "text": corpus}
                ),
            )
            duck = [
                (a, b)
                for _rank, a, b, _m in sorted(
                    con.execute(bpe_train_sql("documents", n_merges=6)).fetchall()
                )
            ]
            assert duck == want, corpus

            # the segmenter's SQL oracle must tokenize with the same
            # leftmost-greedy merge semantics (chained repeats included)
            if want:
                from spark_extension_spark.operators.bpe import bpe_segment_sql

                seg = {
                    i: list(toks)
                    for i, toks in con.execute(
                        bpe_segment_sql("documents", want)
                    ).fetchall()
                }
                for i, t in enumerate(corpus):
                    ref = [
                        tok for w in t.split() for tok in _ref_segment(w, want)
                    ]
                    assert seg[i] == ref, (corpus, i)


class TestBpeBatchedMerges:
    """The round-12 speculate+validate trainer must be bit-identical
    to exact per-merge greedy BPE — the acceptance rule (_plan_batch)
    is stress-tested in pure Python over small-alphabet random corpora
    (tiny alphabets maximize merged-symbol string collisions and
    mispredicted guesses, the hard cases), and the Spark trainer's
    batched/per-merge paths are compared directly."""

    @staticmethod
    def _apply_merge(vocab, a, b):
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        return new_vocab

    @classmethod
    def _tops(cls, vocab, min_pair_count, k):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        rows = sorted(
            ((a, b, c) for (a, b), c in pairs.items() if c >= min_pair_count),
            key=lambda r: (-r[2], r[0], r[1]),
        )
        return rows[:k]

    @classmethod
    def _tris(cls, vocab, min_pair_count):
        tris = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 2):
                t = (syms[i], syms[i + 1], syms[i + 2])
                tris[t] = tris.get(t, 0) + c
        return sorted(
            (
                (a, b, d, c)
                for (a, b, d), c in tris.items()
                if c >= min_pair_count
            ),
            key=lambda r: (-r[3], r[0], r[1], r[2]),
        )

    @classmethod
    def _sim_batched(cls, word_counts, n_merges, batch_size, min_pair_count=2):
        """Pure-Python simulation of the speculate+validate loop: one
        per-state top-K (+ last-state triples) 'job' per batch, merges
        applied with the same leftmost non-overlapping semantics the
        Spark regex uses.  Mirrors bpe_train's driver logic exactly
        (shared _next_round: _plan_batch acceptance + adaptive cap +
        chain-aware guessing)."""
        from spark_extension_spark.operators.bpe import _next_round

        vocab = {tuple(w): c for w, c in word_counts.items()}
        merges = []
        guess = []
        base_cap = batch_size - 1
        cap = base_cap
        cap_max = 8 * batch_size - 1 if base_cap > 0 else 0
        jobs = 0
        while len(merges) < n_merges:
            guess = guess[: min(cap, n_merges - len(merges) - 1)]
            top_k = max(32, 2 * batch_size, 2 * (cap + 1))
            # the 'one job': per-state top-K for states 0..len(guess)
            # plus the final state's triple counts
            step_tops, v = {}, dict(vocab)
            for j in range(len(guess) + 1):
                step_tops[j] = cls._tops(v, min_pair_count, top_k)
                if j < len(guess):
                    v = cls._apply_merge(v, *guess[j])
            tri_tops = cls._tris(v, min_pair_count)
            jobs += 1
            accepted, guess, cap, done = _next_round(
                step_tops, tri_tops, guess, cap, base_cap, cap_max,
                min_pair_count,
            )
            accepted = accepted[: n_merges - len(merges)]
            if not accepted:
                break
            for a, b in accepted:
                merges.append((a, b))
                vocab = cls._apply_merge(vocab, a, b)
            if done:
                break
        return merges, jobs

    def test_plan_batch_pure_units(self):
        from spark_extension_spark.operators.bpe import _plan_batch

        # bootstrap (no guess): accept the state-0 argmax, guess the
        # rest of the table in order, capped
        acc, nxt, done = _plan_batch(
            {0: [("a", "b", 9), ("c", "d", 8), ("a", "x", 7), ("y", "z", 6)]},
            [],
            2,
        )
        assert acc == [("a", "b")] and nxt == [("c", "d"), ("a", "x")]
        assert not done

        # full match: every guess equals its state's argmax, plus the
        # final state's argmax rides along
        tops = {
            0: [("a", "b", 9), ("c", "d", 8)],
            1: [("c", "d", 8), ("e", "f", 3)],
            2: [("e", "f", 3)],
        }
        acc, nxt, done = _plan_batch(tops, [("a", "b"), ("c", "d")], 3)
        assert acc == [("a", "b"), ("c", "d"), ("e", "f")] and not done

        # mismatch mid-batch: verified prefix + the TRUE argmax, stop;
        # the next guess re-reads the mismatching state's order
        tops = {
            0: [("a", "b", 9)],
            1: [("x", "y", 9), ("c", "d", 8)],
        }
        acc, nxt, done = _plan_batch(tops, [("a", "b"), ("c", "d")], 3)
        assert acc == [("a", "b"), ("x", "y")] and nxt == [("c", "d")]
        assert not done

        # empty state table: training done after the verified prefix
        tops = {0: [("a", "b", 9)], 1: []}
        acc, nxt, done = _plan_batch(tops, [("a", "b")], 3)
        assert acc == [("a", "b")] and done

    def test_batch_size_one_is_the_classic_loop(self):
        # the adaptive cap must stay pinned at 0 for batch_size=1: one
        # merge per job, exactly the classic loop (round-13 contract)
        from collections import Counter

        words = Counter({"spark": 5, "spar": 3, "park": 4, "spa": 2})
        want = _ref_bpe_train(words, 6)
        got, jobs = self._sim_batched(words, 6, 1)
        assert got == want
        assert jobs == len(got)

    def test_batched_equals_reference_on_random_small_alphabet_corpora(self):
        import random
        from collections import Counter

        rng = random.Random(0xB9E)
        for trial in range(300):
            alphabet = rng.choice(["ab", "abc", "abcd"])
            words = Counter()
            for _ in range(rng.randint(1, 12)):
                w = "".join(
                    rng.choice(alphabet) for _ in range(rng.randint(1, 8))
                )
                words[w] += rng.randint(1, 9)
            n_merges = rng.randint(1, 10)
            batch = rng.choice([1, 2, 4, 8])
            want = _ref_bpe_train(words, n_merges)
            got, jobs = self._sim_batched(words, n_merges, batch)
            assert got == want, (trial, dict(words), n_merges, batch)
            # every job must advance: jobs never exceed merges (+1 probe)
            assert jobs <= max(1, len(got)) + 1, (trial, jobs, len(got))

    def test_spark_batched_equals_per_merge_and_reference(self, spark):
        from collections import Counter

        from spark_extension_spark.operators.bpe import bpe_train

        corpora = [
            TestBpe.CORPUS,
            ["ababab ababab abab", "banana bandana banana"],
            ["xxxxxxxx xxxx xx", "xyxyxyxy xyxy"],
        ]
        for corpus in corpora:
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
            )
            batched = [
                tuple(r) for r in bpe_train(df, 8).orderBy("rank").collect()
            ]
            per_merge = [
                tuple(r)
                for r in bpe_train(df, 8, batch_size=1).orderBy("rank").collect()
            ]
            assert batched == per_merge, corpus
            want = _ref_bpe_train(Counter(w for t in corpus for w in t.split()), 8)
            assert [(a, b) for _r, a, b, _m in batched] == want, corpus

    def test_batch_size_guard(self, spark):
        import pytest as _pytest

        from spark_extension_spark.operators.bpe import bpe_train

        df = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
        with _pytest.raises(ValueError, match="batch_size"):
            bpe_train(df, 2, batch_size=0)


def test_bpe_segment_accepts_lists_and_two_field_rows(spark):
    # merge tables round-tripped through JSON arrive as lists, and
    # select('sym_a','sym_b').collect() yields 2-field Rows — both must
    # normalize by LENGTH, not python type
    from pyspark.sql import Row

    from spark_extension_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame([(1, "hehe ha")], ["doc_id", "text"])

    def toks(merges):
        return [
            r["tokens"]
            for r in bpe_segment(df, merges).orderBy("doc_id").collect()
        ][0]

    base = [(0, "h", "e", "he"), (1, "he", "h", "heh")]
    got_tuple4 = toks(base)
    got_list4 = toks([list(m) for m in base])
    got_pairs = toks([(m[1], m[2]) for m in base])
    got_rows2 = toks([Row(sym_a=m[1], sym_b=m[2]) for m in base])
    # merge (h,e) applies to ALL non-overlapping pairs in one pass, so
    # "hehe" -> [he, he] and (he,h) then finds no adjacency
    want = ["he", "he", "h", "a"]
    assert got_tuple4 == got_list4 == got_pairs == got_rows2 == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="2 fields .* or 4"):
        bpe_segment(df, [("a", "b", "c")])


def test_chunk_documents_no_fully_contained_trailing_chunk(spark):
    # a start inside the final overlap window is 100% covered by the
    # previous chunk — duplicated training text
    from spark_extension_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"]
    )
    got = [
        r["text"]
        for r in chunk_documents(df, chunk_tokens=5, overlap=2)
        .orderBy("chunk_id")
        .collect()
    ]
    # starts 0, 3, 6 — NOT 9 (chunk [9:10] is inside chunk [6:11))
    assert got == [
        "t0 t1 t2 t3 t4",
        "t3 t4 t5 t6 t7",
        "t6 t7 t8 t9",
    ]
    for prev, cur in zip(got, got[1:]):
        assert not set(cur.split()).issubset(set(prev.split()))
    # a document shorter than the overlap still yields its one chunk
    tiny = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    assert chunk_documents(tiny, chunk_tokens=5, overlap=2).count() == 1


def test_scrub_pii_phone_precision(spark):
    from spark_extension_spark.operators.text import scrub_pii

    rows = [
        (1, "meeting on 2026-08-16 14:30 room 4021 7788"),   # no PII
        (2, "call +1 555 010 4242 or 555-123-4567 now"),     # two phones
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = scrub_pii("text")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", cols["n_phone"].alias("n"), cols["text_scrubbed"].alias("s")
    ).collect()}
    # dates, times, and id-number runs are NOT phones
    assert out[1]["n"] == 0
    assert out[1]["s"] == "meeting on 2026-08-16 14:30 room 4021 7788"
    assert out[2]["n"] == 2
    assert "<PHONE>" in out[2]["s"] and "555" not in out[2]["s"]


def test_quality_metrics_crlf_token_len(spark):
    from spark_extension_spark.operators.text import quality_metrics

    df = spark.createDataFrame([("a\r\nb",)], "text string")
    m = quality_metrics("text")
    row = df.select(m["mean_token_len"].alias("mtl"), m["n_tokens"].alias("n")).collect()[0]
    # \r is whitespace, not token characters: two 1-char tokens
    assert row["n"] == 2
    assert row["mtl"] == pytest.approx(1.0)


def test_chunk_documents_null_text_no_chunks(spark):
    from spark_extension_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_tokens=2).collect()
    assert all(r["doc_id"] == 1 for r in rows)  # null/empty -> no chunks
