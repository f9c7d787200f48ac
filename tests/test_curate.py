"""Corpus-curation funnel (plans/curate.py): score → filter → dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.plans.curate import curate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    en = ("the cat and the dog ran to the house of the old man and it "
          "was good for all of them to rest in the shade is what we say")
    rows = [
        (0, en),                              # kept
        (1, en),                              # exact dup of 0 → folded
        (2, "  " + en + "  "),                # whitespace-variant dup
        (3, "der hund und die katze nicht das haus " * 4),   # german
        (4, "short the text"),                # < 20 tokens
        (5, " ".join(f"w{i}" for i in range(40))),  # no stopwords → und
        # en words but stopword-poor: 1 hit in 60 tokens < 1/50
        (6, "the " + " ".join(f"zz{i}" for i in range(59))),
        (7, en + " extra tail words here"),   # kept, distinct fp
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCurateCorpus:
    def test_funnel_semantics(self, spark, corpus):
        out = {r.doc_id: r for r in curate_corpus(corpus).collect()}
        assert set(out) == {0, 7}
        assert out[0].dup_count == 3          # docs 0,1,2 share the fp
        assert out[7].dup_count == 1
        assert out[0].lang_guess == "en"
        assert out[0].ws_tokens >= 20

    def test_stopword_floor_is_exact(self, spark, corpus):
        # doc 6: 1 hit / 60 tokens — below 1/50 → dropped; at (1, 60)
        # threshold it is kept: the integer compare has no float boundary
        kept = curate_corpus(corpus, min_stopword=(1, 60))
        assert 6 in {r.doc_id for r in kept.collect()}

    def test_lang_and_token_knobs(self, spark, corpus):
        all_langs = curate_corpus(corpus, langs=("en", "de", "und"),
                                  min_tokens=1, min_stopword=(0, 1))
        ids = {r.doc_id for r in all_langs.collect()}
        assert {3, 4, 5}.issubset(ids)

    def test_single_shuffle_plan(self, spark, corpus):
        plan = (curate_corpus(corpus)._jdf.queryExecution()
                .executedPlan().toString())
        assert plan.count("Exchange") == 1, plan

    def test_deterministic_survivor(self, spark, corpus):
        a = curate_corpus(corpus).collect()
        b = curate_corpus(corpus.repartition(7)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_near_dup_tier(self, spark, corpus):
        # doc 7 = doc 0's text + 4 extra words: shingle-Jaccard high but
        # not 1.0 — survives exact dedup, dies at a permissive threshold
        base = curate_corpus(corpus)
        near = curate_corpus(corpus, near_dup_threshold=0.5)
        base_ids = {r.doc_id for r in base.collect()}
        near_ids = {r.doc_id for r in near.collect()}
        assert base_ids == {0, 7}
        assert near_ids == {0}
        # a strict threshold keeps both
        strict = curate_corpus(corpus, near_dup_threshold=0.99)
        assert {r.doc_id for r in strict.collect()} == {0, 7}
        # schema identical across tiers
        assert near.columns == base.columns

    def test_near_dup_cluster_keep(self, spark, corpus):
        # cluster keep: same outcome as greedy on this pair set (no
        # chains), identical schema, bad mode rejected
        near = curate_corpus(corpus, near_dup_threshold=0.5,
                             near_dup_keep="cluster")
        assert {r.doc_id for r in near.collect()} == {0}
        with pytest.raises(ValueError, match="near_dup_keep"):
            curate_corpus(corpus, near_dup_threshold=0.5,
                          near_dup_keep="bogus")


@pytest.fixture(scope="module")
def interleaved(spark):
    """Hand-built (doc_id, spans) rows; span arrays deliberately out of
    offset order so extraction must re-sort."""
    en = ("the cat and the dog ran to the house of the old man and it "
          "was good for all of them to rest in the shade is what we say")
    w = en.split()
    j = " ".join

    def t(text_, off):
        return ("text", text_, None, off)

    def m(ref, off):
        return ("media", None, ref, off)

    rows = [
        # kept: 2 text spans + 1 valid media (ratio 1/3), out of order
        (0, [m("https://m/0.png", 1), t(j(w[15:]), 2), t(j(w[:15]), 0)]),
        # same extracted text, different chunking + no media → same fp
        (1, [t(j(w[20:]), 9), t(j(w[:7]), 1), t(j(w[7:20]), 5)]),
        # mostly media: 3 media / 4 spans → ratio gate drops it
        (2, [m("https://m/2a.png", 1), m("https://m/2b.png", 2),
             t(en + " two", 0), m("https://m/2c.png", 3)]),
        # broken media (NULL ref) → dropped unless drop_broken_media=False
        (3, [t(j(w[:15]) + " three", 0), m(None, 1), t(j(w[15:]), 2)]),
        # empty-string ref is broken too
        (5, [t(j(w[:15]) + " five", 0), m("", 1), t(j(w[15:]), 2)]),
        # german text → lang gate
        (4, [t("der hund und die katze nicht das haus " * 4, 0)]),
    ]
    schema = ("doc_id long, spans array<struct<kind:string, text:string, "
              "media_ref:string, offset:int>>")
    return spark.createDataFrame(rows, schema)


class TestCurateInterleaved:
    def test_gates_and_dedup(self, spark, interleaved):
        from fess_ds_s3_spark.plans.curate import curate_interleaved
        out = {r.doc_id: r for r in
               curate_interleaved(interleaved).collect()}
        assert set(out) == {0}
        # docs 0 and 1 extract to the SAME text despite different
        # chunking and array order → folded, doc 0 wins
        assert out[0].dup_count == 2
        assert out[0].n_spans == 3 and out[0].n_media == 1
        assert out[0].lang_guess == "en"

    def test_broken_media_knob(self, spark, interleaved):
        from fess_ds_s3_spark.plans.curate import curate_interleaved
        kept = {r.doc_id for r in
                curate_interleaved(interleaved,
                                   drop_broken_media=False).collect()}
        assert kept == {0, 3, 5}

    def test_media_ratio_knob(self, spark, interleaved):
        from fess_ds_s3_spark.plans.curate import curate_interleaved
        loose = {r.doc_id for r in
                 curate_interleaved(interleaved, max_media=None).collect()}
        assert 2 in loose
        tight = {r.doc_id for r in
                 curate_interleaved(interleaved,
                                    max_media=(0, 1)).collect()}
        assert tight == {1}  # only the media-free doc passes a 0-ratio

    def test_no_explode_single_shuffle(self, spark, interleaved):
        from fess_ds_s3_spark.plans.curate import curate_interleaved
        plan = (curate_interleaved(interleaved)._jdf.queryExecution()
                .executedPlan().toString())
        assert plan.count("Exchange") == 1, plan
        assert "Generate" not in plan, plan  # no explode of span arrays
