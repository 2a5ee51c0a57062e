"""RFC 9309 robots.txt evaluation: parser group/rule semantics, pattern
compilation, and the JVM-side longest-match verdict join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestParser:
    def test_group_selection_exact_beats_star(self):
        from docling_eval_spark.operators.robots import parse_robots_txt

        txt = ("User-agent: ccbot\nDisallow: /only-ccbot\n"
               "User-agent: *\nDisallow: /everyone\n")
        assert parse_robots_txt(txt, "ccbot") == [
            ("^/only\\-ccbot", 11, False)]
        assert parse_robots_txt(txt, "somebot") == [
            ("^/everyone", 9, False)]

    def test_multi_agent_group_and_merged_groups(self):
        from docling_eval_spark.operators.robots import parse_robots_txt

        txt = ("User-agent: a\nUser-agent: b\nDisallow: /x\n"
               "User-agent: b\nAllow: /x/y\n")
        # both b-groups merge; the a/b group is shared
        assert parse_robots_txt(txt, "b") == [
            ("^/x", 2, False), ("^/x/y", 4, True)]
        assert parse_robots_txt(txt, "a") == [("^/x", 2, False)]

    def test_empty_disallow_comments_junk(self):
        from docling_eval_spark.operators.robots import parse_robots_txt

        txt = ("# header comment\n"
               "User-agent: *  # trailing comment\n"
               "Disallow:\n"              # empty = allow-all = no rule
               "Crawl-delay: 10\n"        # unknown directive ignored
               "not a directive line\n"
               "Disallow: /real # comment\n")
        assert parse_robots_txt(txt, "anybot") == [("^/real", 5, False)]

    def test_pattern_compile_wildcard_and_anchor(self):
        import re

        from docling_eval_spark.operators.robots import compile_pattern

        rx = compile_pattern("/p*.html$")
        assert re.search(rx, "/pabc.html")
        assert not re.search(rx, "/pabc.html?x=1")  # $ anchors
        assert not re.search(rx, "/q/pabc.html")    # ^ anchors
        # regex metachars in the raw pattern are literal
        rx2 = compile_pattern("/a+b?.c")
        assert re.search(rx2, "/a+b?.c") and not re.search(rx2, "/aabXc")


class TestVerdict:
    @pytest.fixture()
    def rules(self, spark):
        from docling_eval_spark.operators.robots import compile_robots

        robots = spark.createDataFrame(
            [("a.example",
              "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
             ("b.example", "garbage that parses to nothing")],
            ["domain", "robots_txt"])
        return compile_robots(robots, agent="ccbot")

    def test_longest_match_allow_wins_and_left_join_miss(self, spark, rules):
        from docling_eval_spark.operators.robots import with_robots_verdict

        pages = spark.createDataFrame(
            [(1, "https://a.example/private/ok/deep"),
             (2, "https://a.example/private/no"),
             (3, "https://a.example/"),
             (4, "https://b.example/anything"),     # no rules parsed
             (5, "https://missing.example/x")],     # no robots row
            ["doc_id", "url"])
        out = {r["doc_id"]: r["robots_txt_allowed"]
               for r in with_robots_verdict(pages, rules).collect()}
        assert out == {1: True, 2: False, 3: True, 4: True, 5: True}

    def test_verdict_join_is_jvm_only(self, spark, rules):
        from docling_eval_spark.operators.robots import with_robots_verdict

        pages = spark.createDataFrame(
            [(1, "https://a.example/private/x")], ["doc_id", "url"])
        # materialize the compiled rules so the verdict plan's Python
        # stage count reflects ONLY the join+match, as at scale where
        # rules are a persisted table
        mat = spark.createDataFrame(rules.collect(), rules.schema)
        df = with_robots_verdict(pages, mat)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
        assert [r["robots_txt_allowed"] for r in df.collect()] == [False]

    def test_query_matches_path_and_query_target(self, spark):
        from docling_eval_spark.operators.robots import (
            compile_robots, with_robots_verdict)

        robots = spark.createDataFrame(
            [("c.example", "User-agent: *\nDisallow: /*?session=\n")],
            ["domain", "robots_txt"])
        rules = compile_robots(robots)
        pages = spark.createDataFrame(
            [(1, "https://c.example/page?session=abc"),
             (2, "https://c.example/page")], ["doc_id", "url"])
        out = {r["doc_id"]: r["robots_txt_allowed"]
               for r in with_robots_verdict(pages, rules).collect()}
        assert out == {1: False, 2: True}


def test_cli_curate_robots_gate(spark, tmp_path):
    """--robots-txt drops pages a domain's robots.txt disallows for the
    agent (RFC 9309 longest-match) and accounts for them."""
    import json

    from docling_eval_spark import cli

    line = "the quick brown fox jumps over the fence today."
    body = "\n".join([line, line.replace("fox", "cat"),
                      line.replace("fox", "owl")])
    rows = [
        (1, "https://a.example/public/p", body),
        (2, "https://a.example/private/p", body.replace("quick", "swift")),
        (3, "https://b.example/private/p", body.replace("brown", "black")),
    ]
    inp = str(tmp_path / "docs")
    rob = str(tmp_path / "robots")
    out = str(tmp_path / "curated")
    summ = str(tmp_path / "summary.json")
    spark.createDataFrame(rows, ["doc_id", "url", "text"]) \
        .write.parquet(inp)
    spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private\n")],
        ["domain", "robots_txt"]).write.parquet(rob)

    cli.main(["curate", "--input", inp, "--output", out,
              "--min-words", "10", "--robots-txt", rob,
              "--summary", summ])

    cur = spark.read.parquet(out).collect()
    # doc 2 disallowed; doc 3's domain has no robots.txt -> allowed
    assert {r.doc_id for r in cur} == {1, 3}
    s = json.loads(open(summ).read())
    assert s["n_robots_disallowed_dropped"] == 1
