"""URL canonicalization: each contract rule pinned, plus agreement with
an independent urllib-based reference over the synthesized crawl corpus
and the dedup-merge semantics the canonical key exists for."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ai_bangladesh_address_parser_spark.functions.url import (
    canonical_reference,
    canonical_url_expr,
    host_expr,
)

CASES = [
    # scheme + host lowercased, fragment dropped
    ("HTTPS://WWW.Example.COM/A/b#frag", "https://www.example.com/A/b"),
    # default ports stripped per scheme
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    # a NON-default port survives
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # :443 is only default for https
    ("http://example.com:443/x", "http://example.com:443/x"),
    # empty path -> /, trailing slashes stripped (root keeps its /)
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/a/b///", "https://example.com/a/b"),
    # params sorted, tracking dropped, empty query elided
    ("https://e.com/p?b=2&a=1", "https://e.com/p?a=1&b=2"),
    ("https://e.com/p?utm_source=x&a=1&utm_medium=y", "https://e.com/p?a=1"),
    ("https://e.com/p?gclid=1&fbclid=2&ref=h", "https://e.com/p"),
    # "utmX" is NOT a tracking prefix (the LIKE-wildcard trap)
    ("https://e.com/p?utmx=1", "https://e.com/p?utmx=1"),
    # empty params dropped; ?& noise collapses
    ("https://e.com/p?&&a=1&", "https://e.com/p?a=1"),
    ("https://e.com/p?#frag", "https://e.com/p"),
]


def _canon_spark(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r["c"] for r in df.select(canonical_url_expr("url").alias("c")).collect()
    ]


def test_canonicalization_rules(spark):
    got = _canon_spark(spark, [u for u, _ in CASES])
    for (url, want), g in zip(CASES, got):
        assert g == want, f"{url!r}: {g!r} != {want!r}"


def test_reference_agrees_on_rule_cases():
    for url, want in CASES:
        assert canonical_reference(url) == want, url


def test_spark_matches_reference_on_corpus(spark, sf_dir):
    """The expression and the urllib reference are independent
    implementations; they must agree on every synthesized crawl URL."""
    import __spark_entry__ as E

    u = E._synth_urls(spark, sf_dir)
    rows = u.select("url", canonical_url_expr("url").alias("c")).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["c"] == canonical_reference(r["url"]), r["url"]


def test_canonical_merges_crawl_variants(spark, sf_dir):
    """Variants 0/1 (case+port+tracking noise) and 2/3 (case+port+
    trailing slash) of the same article must collide on the canonical
    key; the asset URL stays distinct — so each full 5-variant article
    group yields exactly 3 canonical URLs."""
    import __spark_entry__ as E

    u = E._synth_urls(spark, sf_dir)
    g = (
        u.withColumn("art", F.expr("doc_id div 5"))
        .groupBy("art")
        .agg(F.countDistinct(canonical_url_expr("url")).alias("n_canon"),
             F.count("*").alias("n"))
        .filter(F.col("n") == 5)
    )
    bad = g.filter(F.col("n_canon") != 3).count()
    assert bad == 0
    assert g.count() > 0


def test_host_expr(spark):
    urls = ["HTTP://A.b.COM:80/x", "https://a.b.com:443/", "ftp://H.io:21/f"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r["h"] for r in df.select(host_expr("url").alias("h")).collect()]
    assert got == ["a.b.com", "a.b.com", "h.io:21"]
