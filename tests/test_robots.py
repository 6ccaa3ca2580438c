"""robots.txt gate (operators/robots.py — RFC 9309 relationally):
grouping, group selection/hiding, pattern translation, longest-match
precedence, defaults, and the plan shape."""

from pyspark.sql import functions as F

from datamancer_spark.operators.robots import (
    parse_robots,
    robots_effective_rules,
    robots_url_filter,
)

POLICY = """# policy file
User-agent: otherbot
Disallow: /

User-Agent: alpha
user-agent: beta
Allow: /c/
DISALLOW: /c/private
Disallow: /nd/
Allow: /nd/*0$
disallow: /spam/
Disallow:
Crawl-delay: 10

User-agent: *
Disallow: /u/
"""


def _rules(spark, extra_hosts=()):
    rows = [("h1.example", POLICY)] + [
        (h, "User-agent: *\nDisallow: /x/") for h in extra_hosts
    ]
    robots = spark.createDataFrame(rows, "host string, robots_txt string")
    return parse_robots(robots)


class TestParse:
    def test_grouping_and_directives(self, spark):
        rules = _rules(spark)
        rows = rules.collect()
        # consecutive UA lines share one group: alpha AND beta each
        # carry the full 5-rule set (empty Disallow and Crawl-delay
        # dropped)
        per_agent = {}
        for r in rows:
            per_agent.setdefault(r["agent"], set()).add(
                (r["rule"], r["pattern"])
            )
        want = {
            ("allow", "/c/"),
            ("disallow", "/c/private"),
            ("disallow", "/nd/"),
            ("allow", "/nd/*0$"),
            ("disallow", "/spam/"),
        }
        assert per_agent["alpha"] == want
        assert per_agent["beta"] == want
        assert per_agent["otherbot"] == {("disallow", "/")}
        assert per_agent["*"] == {("disallow", "/u/")}
        # groups are distinct
        gids = {r["agent"]: r["group_id"] for r in rows}
        assert gids["alpha"] == gids["beta"] != gids["otherbot"]

    def test_pattern_regex_translation(self, spark):
        rules = _rules(spark)
        rx = {
            r["pattern"]: r["regex"]
            for r in rules.filter(F.col("agent") == "alpha").collect()
        }
        assert rx["/nd/*0$"] == "^/nd/.*0$"
        assert rx["/c/"] == "^/c/"


class TestSelection:
    def test_exact_group_hides_wildcard(self, spark):
        rules = _rules(spark)
        eff = robots_effective_rules(rules, "Alpha")  # case-insensitive
        pats = {r["pattern"] for r in eff.collect()}
        assert "/u/" not in pats  # the * group is invisible
        assert "/c/" in pats

    def test_unknown_agent_falls_back_to_star(self, spark):
        rules = _rules(spark)
        eff = robots_effective_rules(rules, "nobody")
        assert {r["pattern"] for r in eff.collect()} == {"/u/"}


class TestGate:
    def test_all_rfc_behaviors(self, spark):
        rules = _rules(spark, extra_hosts=("h2.example",))
        urls = spark.createDataFrame(
            [
                (1, "h1.example", "http://h1.example/c/12"),
                (2, "h1.example", "http://h1.example/c/private/x"),
                (3, "h1.example", "http://h1.example/nd/17"),
                (4, "h1.example", "http://h1.example/nd/20"),
                (5, "h1.example", "http://h1.example/spam/9"),
                (6, "h1.example", "http://h1.example/u/7"),
                (7, "h2.example", "http://h2.example/x/1"),
                (8, "h2.example", "http://h2.example/y"),
                (9, "h3.example", "http://h3.example/anything"),
                (10, "h1.example", "http://h1.example"),
            ],
            "i long, host string, url string",
        )
        out = {
            r["i"]: (r["robots_allowed"], r["matched_pattern"])
            for r in robots_url_filter(urls, rules, "alpha").collect()
        }
        assert out[1] == (True, "/c/")          # allow prefix
        assert out[2] == (False, "/c/private")  # longest match
        assert out[3] == (False, "/nd/")
        assert out[4] == (True, "/nd/*0$")      # wildcard+$ beats /nd/
        assert out[5] == (False, "/spam/")
        assert out[6] == (True, None)           # * group hidden
        assert out[7] == (False, "/x/")         # fallback to *
        assert out[8] == (True, None)
        assert out[9] == (True, None)           # no robots at all
        assert out[10] == (True, None)          # bare host -> path "/"

    def test_allow_wins_length_tie(self, spark):
        robots = spark.createDataFrame(
            [("h.example", "User-agent: *\nAllow: /p/\nDisallow: /p/")],
            "host string, robots_txt string",
        )
        rules = parse_robots(robots)
        urls = spark.createDataFrame(
            [(1, "h.example", "http://h.example/p/x")],
            "i long, host string, url string",
        )
        r = robots_url_filter(urls, rules, "bot").collect()[0]
        assert r["robots_allowed"] is True

    def test_plan_is_broadcast_no_cartesian(self, spark):
        from datamancer_spark.plans import executed_plan

        rules = _rules(spark)
        urls = spark.createDataFrame(
            [(i, "h1.example", f"http://h1.example/c/{i}")
             for i in range(100)],
            "i long, host string, url string",
        )
        plan = executed_plan(robots_url_filter(urls, rules, "alpha"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


class TestRealWorldMess:
    def test_bom_and_crlf_tolerated(self, spark):
        """Real robots.txt regularly leads with a UTF-8 BOM and uses
        CRLF endings; neither may drop directives (a BOM glued to the
        first 'User-agent' used to silently kill the whole group)."""
        txt = "﻿User-agent: *\r\nDisallow: /private/\r\n"
        robots = spark.createDataFrame(
            [("h.example", txt)], "host string, robots_txt string"
        )
        rules = parse_robots(robots)
        rows = rules.collect()
        assert len(rows) == 1
        assert rows[0]["agent"] == "*"
        assert rows[0]["pattern"] == "/private/"
        urls = spark.createDataFrame(
            [(1, "h.example", "http://h.example/private/x"),
             (2, "h.example", "http://h.example/pub")],
            "i long, host string, url string",
        )
        out = {
            r["i"]: r["robots_allowed"]
            for r in robots_url_filter(urls, rules, "bot").collect()
        }
        assert out == {1: False, 2: True}

    def test_unknown_directives_and_missing_colons_ignored(self, spark):
        txt = ("User-agent: *\nCrawl-delay: 5\nSitemap: http://x/s.xml\n"
               "garbage line without colon\nDisallow: /d/\n")
        robots = spark.createDataFrame(
            [("h.example", txt)], "host string, robots_txt string"
        )
        rules = parse_robots(robots)
        assert {(r["rule"], r["pattern"]) for r in rules.collect()} == {
            ("disallow", "/d/")
        }


class TestSitemaps:
    def test_extracts_group_independent_sitemaps(self, spark):
        """Sitemap: lines are group-independent per the spec — they
        extract regardless of position, case, comments, or BOM;
        relative URLs drop (the spec requires absolute)."""
        from datamancer_spark.operators.robots import robots_sitemaps

        txt = ("﻿# header\n"
               "Sitemap: https://h.example/sitemap.xml\n"
               "User-agent: *\n"
               "Disallow: /x/\n"
               "sitemap: https://h.example/news.xml  # inline comment\n"
               "SITEMAP: /relative/dropped.xml\n"
               "Sitemap: https://h.example/sitemap.xml\n")  # duplicate
        robots = spark.createDataFrame(
            [("h.example", txt)], "host string, robots_txt string"
        )
        got = {
            (r["host"], r["sitemap_url"])
            for r in robots_sitemaps(robots).collect()
        }
        assert got == {
            ("h.example", "https://h.example/sitemap.xml"),
            ("h.example", "https://h.example/news.xml"),
        }


class TestDeterminismAndEdges:
    def test_uppercase_scheme_and_null_url(self, spark):
        from datamancer_spark.operators.robots import (
            parse_robots,
            robots_url_filter,
        )

        robots = spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /x/")],
            "host string, robots_txt string",
        )
        rules = parse_robots(robots)
        urls = spark.createDataFrame(
            [(1, "h.example", "HTTP://h.example/x/page"),
             (2, "h.example", None),
             (3, "h.example", "not a url at all")],
            "i long, host string, url string",
        )
        out = {r["i"]: r["robots_allowed"]
               for r in robots_url_filter(urls, rules, "bot").collect()}
        # scheme case must not bypass the gate (RFC 3986: schemes are
        # case-insensitive)
        assert out[1] is False
        # NULL/unparseable URLs gate as "/": allowed here (no / rule)
        assert out[2] is True and out[3] is True
        strict = spark.createDataFrame(
            [("h.example", "User-agent: *\nDisallow: /")],
            "host string, robots_txt string",
        )
        out2 = {
            r["i"]: r["robots_allowed"]
            for r in robots_url_filter(
                urls, parse_robots(strict), "bot"
            ).collect()
        }
        # under Disallow: / even the NULL-url rows must not slip through
        assert out2 == {1: False, 2: False, 3: False}

    def test_same_length_tie_is_deterministic(self, spark):
        from datamancer_spark.operators.robots import (
            parse_robots,
            robots_url_filter,
        )

        robots = spark.createDataFrame(
            [("h.example",
              "User-agent: *\nDisallow: /ab*\nDisallow: /a*b")],
            "host string, robots_txt string",
        )
        rules = parse_robots(robots)
        urls = spark.createDataFrame(
            [(1, "h.example", "http://h.example/ab")],
            "i long, host string, url string",
        )
        rows = [
            robots_url_filter(urls, rules, "bot").collect()[0][
                "matched_pattern"
            ]
            for _ in range(3)
        ]
        # both 4-char disallows match; the reported winner must be the
        # same (lexicographically smaller) pattern every run
        assert rows == ["/a*b"] * 3


def test_crawl_delay_group_semantics(spark):
    """r12 Crawl-delay: exact group's delay wins; an exact group
    WITHOUT a delay hides the '*' delay too; '*' applies only when no
    exact group exists; max of multiple lines; junk values drop."""
    from datamancer_spark.operators.robots import robots_crawl_delays

    robots = spark.createDataFrame(
        [
            # exact group with delay + hidden '*' delay
            ("a.example",
             "User-agent: datamancer\nCrawl-delay: 2\nAllow: /\n"
             "\nUser-agent: *\nCrawl-delay: 9\n"),
            # exact group WITHOUT delay: '*' must NOT leak through
            ("b.example",
             "User-agent: datamancer\nAllow: /\n"
             "\nUser-agent: *\nCrawl-delay: 9\n"),
            # no exact group: '*' applies
            ("c.example", "User-agent: *\nCrawl-delay: 4\n"),
            # two delay lines in the exact group: max wins; junk drops
            ("d.example",
             "User-agent: datamancer\nCrawl-delay: 1\n"
             "Crawl-delay: 3\nCrawl-delay: soon\n"),
        ],
        "host string, robots_txt string",
    )
    got = {
        r["host"]: r["crawl_delay"]
        for r in robots_crawl_delays(robots, "datamancer").collect()
    }
    assert got == {"a.example": 2.0, "c.example": 4.0, "d.example": 3.0}
    assert "b.example" not in got  # hidden, not inherited


def test_politeness_schedule_delay_and_order(spark):
    from datamancer_spark.operators.robots import (
        politeness_schedule,
        robots_crawl_delays,
    )

    robots = spark.createDataFrame(
        [
            ("slow.example", "User-agent: bot\nCrawl-delay: 5\n"),
            # exact group WITHOUT a delay: '*' delay must not leak in,
            # so the schedule falls back to default_delay
            (
                "nodelay.example",
                "User-agent: bot\nAllow: /\n\nUser-agent: *\nCrawl-delay: 9\n",
            ),
        ],
        "host string, robots_txt string",
    )
    delays = robots_crawl_delays(robots, "bot")
    frontier = spark.createDataFrame(
        [
            (h, f"http://{h}/p/{i}")
            for h in ("slow.example", "nodelay.example", "unknown.example")
            for i in range(4)
        ],
        "host string, url string",
    )
    out = politeness_schedule(frontier, delays, default_delay=2.0)
    rows = {(r["host"], r["url"]): r for r in out.collect()}
    assert len(rows) == 12
    by_host = {}
    for (h, _), r in rows.items():
        by_host.setdefault(h, []).append(r)
    for h, rs in by_host.items():
        # dense per-host ranks and exact eta = (rank-1) * delay
        assert sorted(r["fetch_rank"] for r in rs) == [1, 2, 3, 4]
        d = {"slow.example": 5.0}.get(h, 2.0)
        for r in rs:
            assert r["eta_sec"] == (r["fetch_rank"] - 1) * d
    # deterministic order across runs
    again = {
        (r["host"], r["url"]): r["fetch_rank"]
        for r in politeness_schedule(
            frontier, delays, default_delay=2.0
        ).collect()
    }
    assert again == {k: r["fetch_rank"] for k, r in rows.items()}
