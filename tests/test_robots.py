"""robots.txt parsing, longest-match semantics, filter routing, budgets."""

from __future__ import annotations

import urllib.robotparser

import pytest
from pyspark.sql import functions as F

from fess_ds_s3_spark.config import CrawlConfig
from fess_ds_s3_spark.operators import robots
from fess_ds_s3_spark.operators.filters import with_status_columns

ROBOTS_A = """
# comments are ignored
User-agent: *
Disallow: /private/
Allow: /private/public/
Crawl-delay: 2

User-agent: fess-ds-s3-spark
Disallow: /internal/
"""

ROBOTS_B = """
User-agent: *
Disallow:
"""


class TestParser:
    def test_rules_shape(self):
        rules = robots.parse_robots_txt(ROBOTS_A)
        kinds = {(r["agent"], r["rule_kind"], r["path_prefix"])
                 for r in rules if r["rule_kind"] != "delay"}
        assert ("*", "disallow", "/private/") in kinds
        assert ("*", "allow", "/private/public/") in kinds
        assert ("fess-ds-s3-spark", "disallow", "/internal/") in kinds
        assert robots.crawl_delay_of(rules, "other-bot") == 2.0

    def test_empty_disallow_allows_all(self):
        rules = robots.parse_robots_txt(ROBOTS_B)
        assert robots.robots_allowed(rules, "any", "/anything")

    @pytest.mark.parametrize("path,agent,expected", [
        ("/private/x", "other-bot", False),
        # RFC 9309 longest match: Allow /private/public/ overrides the
        # shorter Disallow /private/ (stdlib robotparser would disagree —
        # it uses legacy first-match order)
        ("/private/public/x", "other-bot", True),
        ("/open/x", "other-bot", True),
        ("/internal/x", "fess-ds-s3-spark", False),
        # agent-specific group exists → '*' group ignored for this agent
        ("/private/x", "fess-ds-s3-spark", True),
    ])
    def test_rfc9309_longest_match(self, path, agent, expected):
        assert robots.robots_allowed(
            robots.parse_robots_txt(ROBOTS_A), agent, path) is expected

    @pytest.mark.parametrize("path,expected", [
        ("/doc/file.pdf", False),      # /*.pdf$ wildcard + anchor
        ("/doc/file.pdfx", True),      # $ anchors: trailing chars escape
        ("/tmp123/x", False),          # /tmp*/ mid-pattern wildcard
        ("/tmp-keep/x", True),         # longer Allow beats /tmp*/
        ("/a%20b/doc", False),         # encoded path vs encoded rule
        ("/a b/doc", False),           # decoded path vs encoded rule
        ("/open/x", True),
    ])
    def test_rfc9309_wildcards_and_encoding(self, path, expected):
        body = ("User-agent: *\n"
                "Disallow: /*.pdf$\n"
                "Disallow: /tmp*/\n"
                "Disallow: /a%20b/\n"
                "Allow: /tmp-keep/\n")
        rules = robots.parse_robots_txt(body)
        assert robots.robots_allowed(rules, "any", path) is expected

    def test_plain_disallow_matches_robotparser(self):
        # where no Allow/Disallow conflict exists, stdlib agrees
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(ROBOTS_A.splitlines())
        for path, expected in [("/private/x", False), ("/open/x", True)]:
            assert rp.can_fetch("other-bot", f"https://h{path}") is expected
            assert robots.robots_allowed(
                robots.parse_robots_txt(ROBOTS_A), "other-bot",
                path) is expected


class TestDataFrameOps:
    @pytest.fixture()
    def rules_df(self, spark):
        bodies = spark.createDataFrame(
            [("a.com", ROBOTS_A), ("b.com", ROBOTS_B)],
            "host string, body string")
        return robots.robots_rules_table(bodies)

    def test_rules_table(self, spark, rules_df):
        rows = rules_df.collect()
        assert {r.host for r in rows} == {"a.com", "b.com"}
        assert any(r.rule_kind == "delay" and r.crawl_delay == 2.0
                   for r in rows)

    def test_filter_routing(self, spark, rules_df):
        cfg = CrawlConfig(region="r")  # agent fess-ds-s3-spark
        frontier = spark.createDataFrame(
            [("a.com", "https://a.com/internal/doc"),
             ("a.com", "https://a.com/private/doc"),
             ("b.com", "https://b.com/whatever"),
             ("c.com", "https://c.com/no-robots")],
            "host string, url string")
        out = robots.apply_robots_filter(
            with_status_columns(frontier), rules_df, cfg)
        got = {r.url: (r.status, r.discard_reason) for r in out.collect()}
        assert got["https://a.com/internal/doc"] == ("discarded", "robots")
        # agent-specific group: '*' Disallow /private/ does not apply
        assert got["https://a.com/private/doc"][0] == "pending"
        assert got["https://b.com/whatever"][0] == "pending"
        assert got["https://c.com/no-robots"][0] == "pending"

    def test_crawl_delay_budgets(self, spark, rules_df):
        cfg = CrawlConfig(region="r")
        budgets = robots.crawl_delay_budgets(rules_df, cfg,
                                             round_seconds=60.0)
        rows = {r.host: r for r in budgets.collect()}
        assert rows["a.com"].budget_per_round == 30
        assert rows["a.com"].crawl_delay_ms == 2000
