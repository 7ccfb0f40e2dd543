"""robots.txt parse + longest-match gating (round 5).

RFC 9309 semantics pinned independently of the implementation:
group formation (stacked user-agent lines, rules-before-any-agent
dropped, unknown directives skipped without ending the group),
empty-Disallow emitting no rule, wildcard/`$` pattern compilation,
longest-match precedence with allow winning ties, specific-agent
groups overriding `*`, and hosts with no rules defaulting to allow.
"""

import pytest

from recon_spark.operators.webops import parse_robots, robots_filter

ROBOTS_A = (
    "# policy\n"
    "Disallow: /orphan-rule-before-any-agent\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Crawl-delay: 10\n"
    "Disallow:\n"
    "\n"
    "User-agent: GPTBot\n"
    "User-agent: ccbot\n"
    "Disallow: /\n"
    "Allow: /pub*.html$\n"
)


@pytest.fixture(scope="module")
def rules(spark):
    robots = spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.com", "User-agent: *\nDisallow: /x*y\n")],
        ["host", "robots_txt"],
    )
    return parse_robots(robots).cache()


def test_parse_groups_and_directives(spark, rules):
    got = {
        (r["host"], r["agent"], r["rule"], r["path"]) for r in rules.collect()
    }
    assert got == {
        # orphan rule dropped; empty Disallow and Crawl-delay emit nothing
        ("a.com", "*", "disallow", "/private"),
        ("a.com", "*", "allow", "/private/ok"),
        # stacked agent lines share one group; agent lowercased
        ("a.com", "gptbot", "disallow", "/"),
        ("a.com", "gptbot", "allow", "/pub*.html$"),
        ("a.com", "ccbot", "disallow", "/"),
        ("a.com", "ccbot", "allow", "/pub*.html$"),
        ("b.com", "*", "disallow", "/x*y"),
    }


def _verdicts(spark, rules, agent):
    urls = spark.createDataFrame(
        [
            (1, "a.com", "/private/secret"),
            (2, "a.com", "/private/ok/page"),
            (3, "a.com", "/open"),
            (4, "a.com", "/pub-page.html"),
            (5, "a.com", "/pub-page.html?x"),  # $ anchor: must NOT match
            (6, "b.com", "/xAAAy"),
            (7, "b.com", "/no-match-but-host-has-rules"),
            (8, "c.com", "/anything"),  # no robots at all
        ],
        ["req_id", "host", "path"],
    )
    out = robots_filter(urls, rules, agent).collect()
    return {r["req_id"]: r["allowed"] for r in out}


def test_generic_agent_verdicts(spark, rules):
    v = _verdicts(spark, rules, "*")
    assert v == {
        1: False,  # longest disallow /private
        2: True,  # longer allow /private/ok beats /private
        3: True,  # no rule matches -> allow (regression: row must SURVIVE)
        4: True,  # '*' group has no /pub rule
        5: True,
        6: False,  # wildcard /x*y
        7: True,  # host has rules but none match
        8: True,  # no robots -> allow
    }
    assert len(v) == 8  # no URL dropped by the gate


def test_specific_agent_group_overrides_star(spark, rules):
    v = _verdicts(spark, rules, "GPTBot")  # case-insensitive agent
    assert v == {
        1: False,  # gptbot group: Disallow /
        2: False,
        3: False,
        4: True,  # Allow /pub*.html$ (longer than '/') matches
        5: False,  # $ anchor: query string breaks the match
        6: False,  # b.com has no gptbot group -> '*' applies
        7: True,
        8: True,
    }


def test_robots_gate_query_matches_oracle(spark, ddb):
    from recon_spark.queries.pipeline import _sql_robots_gate, q_robots_gate
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_robots_gate, _sql_robots_gate(), SF_ORACLE)


def test_robots_gate_verdict_variety(spark):
    """The synthesized corpus must exercise disagreement between the
    generic and the gptbot verdicts, plus live anchored-wildcard
    allows — otherwise the oracle proves less than it claims."""
    from recon_spark.queries.pipeline import q_robots_gate
    from tests.conftest import SF_ORACLE

    rows = q_robots_gate(spark, SF_ORACLE).collect()
    pairs = {(r["allowed_any"], r["allowed_gptbot"]) for r in rows}
    assert {(True, True), (False, False), (True, False)} <= pairs
    assert any(
        r["path"].startswith("/a") and r["allowed_any"] for r in rows
    )  # the Allow /a/*3$ rule fired


def test_rules_side_is_broadcast(spark, rules):
    urls = spark.createDataFrame([(1, "a.com", "/p")], ["req_id", "host", "path"])
    plan = robots_filter(urls, rules, "*")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# --------------------------------------------------------------------------
# sitemap.xml parse + frontier reconciliation
# --------------------------------------------------------------------------


def test_parse_sitemaps_real_xml_semantics(spark):
    """Entity unescape, loc whitespace trim, missing lastmod -> NULL,
    urlset/sitemapindex discrimination, garbage bodies -> zero rows."""
    from recon_spark.operators.webops import parse_sitemaps

    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.com/p?a=1&amp;b=2</loc>"
        "<lastmod>2026-01-02</lastmod></url>"
        "<url><loc>  https://a.com/q  </loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://b.com/s0.xml</loc></sitemap>"
        "<sitemap><loc>https://b.com/s1.xml</loc>"
        "<lastmod>2026-01-05</lastmod></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [
            ("a.com", urlset),
            ("b.com", index),
            ("c.com", "<urlset></urlset>"),
            ("d.com", "HTTP 404 not found"),
        ],
        ["host", "body"],
    )
    got = {
        (r["host"], r["kind"], r["loc"], r["lastmod"])
        for r in parse_sitemaps(df).collect()
    }
    assert got == {
        ("a.com", "url", "https://a.com/p?a=1&b=2", "2026-01-02"),
        ("a.com", "url", "https://a.com/q", None),
        ("b.com", "sitemap", "https://b.com/s0.xml", None),
        ("b.com", "sitemap", "https://b.com/s1.xml", "2026-01-05"),
    }


def test_sitemap_coverage_query_matches_oracle(spark, ddb):
    from recon_spark.queries.pipeline import SQL_SITEMAP_COVERAGE, q_sitemap_coverage
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_sitemap_coverage, SQL_SITEMAP_COVERAGE, SF_ORACLE)


def test_sitemap_coverage_variety(spark):
    """Hosts with listed-and-crawled pages, hosts with only frontier
    entries, and index publishers must all appear — and the lastmod
    range must survive the XML round trip where present."""
    from recon_spark.queries.pipeline import q_sitemap_coverage
    from tests.conftest import SF_ORACLE

    rows = q_sitemap_coverage(spark, SF_ORACLE).collect()
    assert any(r["n_in_crawl"] > 0 and r["min_lastmod"] for r in rows)
    assert any(r["n_in_crawl"] == 0 and r["min_lastmod"] is None for r in rows)
    assert any(r["n_index_children"] == 2 for r in rows)
    assert all(r["n_frontier"] == 2 for r in rows)


# --------------------------------------------------------------------------
# SURT keys + CDX capture index
# --------------------------------------------------------------------------


def test_surt_key_semantics(spark):
    """Label reversal, port carry, IPv6 passthrough, path lowercasing."""
    from pyspark.sql import functions as F

    from recon_spark.operators.webops import surt_key

    df = spark.createDataFrame(
        [
            ("sub.example.co.uk", "https://sub.example.co.uk/A/B?x=1"),
            ("example.com", "http://example.com:8081/p"),
            ("[2001:db8::1]", "http://[2001:db8::1]:8080/api"),
        ],
        ["host", "url_norm"],
    )
    got = [r[0] for r in df.select(surt_key(F.col("host"), F.col("url_norm"))).collect()]
    assert got == [
        "uk,co,example,sub)/a/b?x=1",
        "com,example:8081)/p",
        "[2001:db8::1]:8080)/api",
    ]


def test_cdx_index_query_matches_oracle(spark, ddb):
    from recon_spark.queries.pipeline import SQL_CDX_INDEX, q_cdx_index
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_cdx_index, SQL_CDX_INDEX, SF_ORACLE)


def test_cdx_latest_capture_and_domain_contiguity(spark):
    """One row per canonical URL (newest capture), and a domain's
    captures sort contiguously under SURT order — the property a
    range-partitioned index write relies on."""
    from recon_spark.queries.pipeline import q_cdx_index
    from tests.conftest import SF_ORACLE

    rows = q_cdx_index(spark, SF_ORACLE).collect()
    urls = [r["url_norm"] for r in rows]
    assert len(urls) == len(set(urls))
    surts = [r["surt"] for r in rows]  # query orders by surt
    prefixes = [s.split(")")[0].split(":")[0] for s in surts]
    seen, prev = set(), None
    for p in prefixes:
        if p != prev:
            assert p not in seen  # a domain never reappears after a gap
            seen.add(p)
            prev = p


def test_frontier_plan_query_matches_oracle(spark, ddb):
    """The composed chain — sitemap-discovered URLs gated by robots —
    against a SEMANTIC oracle that re-derives each variant's verdict
    from first principles (only the v2 total-ban group blocks a /new
    path), so a bug anywhere in parse->gate composition hash-fails."""
    from recon_spark.queries.pipeline import SQL_FRONTIER_PLAN, q_frontier_plan
    from tests.conftest import SF_ORACLE, compare_query

    compare_query(spark, ddb, q_frontier_plan, SQL_FRONTIER_PLAN, SF_ORACLE)


def test_frontier_plan_mixes_verdicts(spark):
    from recon_spark.queries.pipeline import q_frontier_plan
    from tests.conftest import SF_ORACLE

    rows = q_frontier_plan(spark, SF_ORACLE).collect()
    verdicts = {r["allowed"] for r in rows}
    assert verdicts == {True, False}
