"""HTML text/link extraction (functions/text.py, operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fess_ds_s3_spark.functions import text as T
from fess_ds_s3_spark.operators import graph


def _one(spark, html):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(T.html_to_text("h").alias("t"),
                     T.html_links("h").alias("l")).first()


class TestHtmlToText:
    def test_strips_tags_scripts_styles_comments(self, spark):
        html = ("<html><head><style>p{color:red}</style>"
                "<script type='x'>var a = '<p>not text</p>';</script>"
                "</head><body><!-- hidden --><p>Hello <b>world</b></p>"
                "</body></html>")
        assert _one(spark, html).t == "Hello world"

    def test_entities_and_whitespace(self, spark):
        html = "<p>a &amp; b &lt;c&gt;   d&nbsp;e &#39;f&#39;</p>"
        assert _one(spark, html).t == "a & b <c> d e 'f'"

    def test_amp_decoded_last_no_double_decode(self, spark):
        # "&amp;lt;" is the literal text "&lt;", not "<"
        assert _one(spark, "&amp;lt;x").t == "&lt;x"

    def test_plain_text_passthrough(self, spark):
        assert _one(spark, "  just   text  ").t == "just text"


class TestHtmlLinks:
    def test_ordered_hrefs_both_quote_styles(self, spark):
        html = ("<a href='https://a.example/x'>1</a>"
                '<link href="/rel.css"><a href="https://b.example/">2</a>')
        assert _one(spark, html).l == \
            ["https://a.example/x", "/rel.css", "https://b.example/"]

    def test_url_host(self, spark):
        df = spark.createDataFrame(
            [("https://h.example:8080/p?q#f",), ("/relative",),
             ("ftp://other",), ("http://plain.example",)], "u string")
        got = [r.h for r in df.select(T.url_host("u").alias("h")).collect()]
        assert got == ["h.example:8080", None, None, "plain.example"]


class TestLinkHostEdges:
    def test_edges_resolve_relative_to_self_host(self, spark):
        pages = spark.createDataFrame([
            ("https://a.example/p1",
             '<a href="https://b.example/x"></a><a href="/rel"></a>'),
            ("https://b.example/p2", '<a href="https://a.example/"></a>'),
        ], "url string, contents string")
        got = {(r.src, r.dst)
               for r in graph.link_host_edges(pages).collect()}
        # '/rel' resolves against the page → self-host edge
        assert got == {("a.example", "b.example"),
                       ("a.example", "a.example"),
                       ("b.example", "a.example")}
        # resolve=False drops non-absolute hrefs instead
        strict = {(r.src, r.dst) for r in
                  graph.link_host_edges(pages, resolve=False).collect()}
        assert strict == {("a.example", "b.example"),
                          ("b.example", "a.example")}

    def test_feeds_host_authority(self, spark):
        pages = spark.createDataFrame([
            ("https://a.example/", '<a href="https://hub.example/"></a>'),
            ("https://b.example/", '<a href="https://hub.example/"></a>'),
            ("https://hub.example/", '<a href="https://a.example/"></a>'),
        ], "url string, contents string")
        ranks = {r.host: r.rank for r in graph.host_authority(
            graph.link_host_edges(pages)).collect()}
        assert ranks["hub.example"] > ranks["a.example"] > ranks["b.example"]


class TestAnchorTexts:
    def _pairs(self, spark, html):
        df = spark.createDataFrame([(html,)], "h string")
        return df.select(T.html_anchor_pairs("h").alias("a")).first().a

    def test_pairs_strip_nested_tags_and_whitespace(self, spark):
        html = ('<a href="https://t.example/a"><b>Big</b>\n  deal </a>'
                "<a href='/rel' class='x'>self</a>")
        pairs = self._pairs(spark, html)
        assert [(p.href, p.anchor) for p in pairs] == [
            ("https://t.example/a", "Big deal"), ("/rel", "self")]

    def test_multiline_and_case_insensitive(self, spark):
        html = '<A HREF="https://t.example/b">line1\nline2</A>'
        pairs = self._pairs(spark, html)
        assert [(p.href, p.anchor) for p in pairs] == [
            ("https://t.example/b", "line1 line2")]

    def test_empty_anchor_and_unclosed_tag(self, spark):
        html = ('<a href="https://t.example/img"><img src="x"></a>'
                '<a href="https://t.example/broken">never closed')
        pairs = self._pairs(spark, html)
        # image-only body → '' anchor; unclosed <a> never matches
        assert [(p.href, p.anchor) for p in pairs] == [
            ("https://t.example/img", "")]

    def test_anchor_texts_resolves_and_aggregates(self, spark):
        rows = [
            ("https://h1.example/p1",
             '<a href="https://t.example/x">hit</a>'
             "<a href='/rel'>self</a>"
             '<a href="mailto:a@b">mail</a>'),
            ("https://h1.example/p2",
             '<a href="https://t.example/x">hit</a>'),
            ("https://h2.example/p",
             '<a href="https://t.example/x">other words</a>'),
        ]
        pages = spark.createDataFrame(rows, "url string, contents string")
        out = {(r.dst_url, r.anchor): r.n_refs
               for r in graph.anchor_texts(pages).collect()}
        assert out == {
            ("https://t.example/x", "hit"): 2,
            ("https://t.example/x", "other words"): 1,
            ("https://h1.example/rel", "self"): 1,
        }

    def test_no_resolve_drops_relative(self, spark):
        pages = spark.createDataFrame(
            [("https://h.example/p",
              '<a href="/rel">r</a><a href="https://t.example/x">a</a>')],
            "url string, contents string")
        out = graph.anchor_texts(pages, resolve=False).collect()
        assert [(r.dst_url, r.anchor, r.n_refs) for r in out] == [
            ("https://t.example/x", "a", 1)]

    def test_plan_is_explode_plus_one_agg(self, spark):
        pages = spark.createDataFrame(
            [("https://h.example/p", '<a href="/a">x</a>')],
            "url string, contents string")
        plan = graph.anchor_texts(pages) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "EvalPython" not in plan
