"""Sitemap XML parsing + one-level index resolution (r12)."""

from datamancer_spark.operators.sitemap import (
    sitemap_entries,
    sitemap_url_frontier,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET_A = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url><loc>http://h.example/a</loc><lastmod>2026-01-02</lastmod></url>
  <url><loc> http://h.example/b </loc></url>
  <url><loc>http://h.example/q?x=1&amp;y=2</loc></url>
  <url><lastmod>2026-01-03</lastmod></url>
</urlset>"""

URLSET_B = f"""<urlset {NS}>
<url><loc>http://h.example/a</loc><lastmod>2026-01-05</lastmod></url>
<url><loc>http://h.example/c</loc></url>
</urlset>"""

INDEX = f"""<sitemapindex {NS}>
  <sitemap><loc>http://h.example/sm_a.xml</loc></sitemap>
  <sitemap><loc>http://h.example/sm_b.xml</loc>
    <lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>http://h.example/sm_nested.xml</loc></sitemap>
</sitemapindex>"""

# a child that is itself an index: its entries must NOT be followed
# (one-level bound)
NESTED_INDEX = f"""<sitemapindex {NS}>
<sitemap><loc>http://h.example/sm_a.xml</loc></sitemap>
</sitemapindex>"""


def _docs(spark):
    return spark.createDataFrame(
        [
            ("h.example", "http://h.example/sitemap_index.xml", INDEX),
            ("h.example", "http://h.example/sm_a.xml", URLSET_A),
            ("h.example", "http://h.example/sm_b.xml", URLSET_B),
            ("h.example", "http://h.example/sm_nested.xml", NESTED_INDEX),
        ],
        "host string, sitemap_url string, xml string",
    )


def test_entries_alignment_and_entities(spark):
    """Optional lastmod stays aligned per entry (the xpath-array
    failure mode), loc is trimmed + entity-decoded, loc-less entries
    drop, and <url> does not match <urlset>."""
    docs = _docs(spark).filter("sitemap_url like '%sm_a%'")
    rows = sorted(
        (r["kind"], r["loc"], r["lastmod"])
        for r in sitemap_entries(docs).collect()
    )
    assert rows == [
        ("url", "http://h.example/a", "2026-01-02"),
        ("url", "http://h.example/b", None),
        ("url", "http://h.example/q?x=1&y=2", None),
    ]


def test_index_entries(spark):
    docs = _docs(spark).filter("sitemap_url like '%index.xml'")
    rows = sorted(
        (r["kind"], r["loc"], r["lastmod"])
        for r in sitemap_entries(docs).collect()
    )
    assert rows == [
        ("sitemap", "http://h.example/sm_a.xml", None),
        ("sitemap", "http://h.example/sm_b.xml", "2026-02-01"),
        ("sitemap", "http://h.example/sm_nested.xml", None),
    ]


def test_frontier_one_level_and_dedup(spark):
    """Roots = the index only; children resolve one level; /a is listed
    by two sitemaps (n_sources=2, lastmod = max); the nested index
    child contributes nothing."""
    docs = _docs(spark)
    ep = spark.createDataFrame(
        [("h.example", "http://h.example/sitemap_index.xml")],
        "host string, sitemap_url string",
    )
    rows = {
        r["url"]: (r["lastmod"], r["n_sources"])
        for r in sitemap_url_frontier(docs, entry_points=ep).collect()
    }
    assert rows == {
        "http://h.example/a": ("2026-01-05", 2),
        "http://h.example/b": (None, 1),
        "http://h.example/q?x=1&y=2": (None, 1),
        "http://h.example/c": (None, 1),
    }


def test_frontier_without_entry_points_uses_all_docs(spark):
    docs = _docs(spark)
    rows = {
        r["url"]: r["n_sources"]
        for r in sitemap_url_frontier(docs).collect()
    }
    # same URL set (children are also roots now), same dedup
    assert set(rows) == {
        "http://h.example/a",
        "http://h.example/b",
        "http://h.example/q?x=1&y=2",
        "http://h.example/c",
    }
