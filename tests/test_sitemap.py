"""Sitemap discovery: robots `Sitemap:` extraction + <urlset> parse."""

from __future__ import annotations

import duckdb

from storm_focused_crawler_spark.plans.pipeline_ops import (
    parse_robots_sitemaps,
    parse_robots_txt,
    parse_sitemap_xml_op,
)


def test_robots_sitemaps_python_twin(spark, sf_dir):
    """Each robot body carries exactly two sitemap urls (one declared
    with a lowercase key); extraction is group-independent."""
    got = sorted(
        (r["robot_id"], r["sitemap_url"])
        for r in parse_robots_sitemaps(spark, sf_dir).collect()
    )
    want = sorted(
        (rid, u)
        for rid in range(7)
        for u in (
            f"https://r{rid}.example/s{rid}.xml",
            f"https://r{rid}.example/extra.xml",
        )
    )
    assert got == want


def test_sitemap_lines_parse_neutral(spark, sf_dir):
    """Appending Sitemap: lines must not change the parsed rule set
    (the classifier drops non-rule lines) — guards the shared bodies."""
    base = sorted(map(tuple, parse_robots_txt(spark, sf_dir).collect()))
    from pyspark.sql import functions as F

    from storm_focused_crawler_spark.operators import robots as RB
    from storm_focused_crawler_spark.plans.pipeline_ops import _robots_bodies

    rid = F.col("robot_id").cast("string")
    with_sm = _robots_bodies(spark, sf_dir).withColumn(
        "content",
        F.concat("content", F.lit("\nSitemap: https://r"), rid,
                 F.lit(".example/x.xml")),
    )
    parsed = RB.parse_robots(with_sm, "focused-crawler", host_col="robot_id")
    again = sorted(
        (r["host"], r["prefix"], int(r["allow"])) for r in parsed.collect()
    )
    assert again == base


def test_sitemap_regex_dialect_parity():
    """The extraction regexes behave identically in java.util.regex
    (engine) and RE2 (a DuckDB deployment parsing real bodies)."""
    body = ("<urlset><url><loc>https://a/1</loc><lastmod>2024-02-01"
            "</lastmod><priority>0.3</priority></url>"
            "<url><loc>https://a/2</loc></url></urlset>")
    con = duckdb.connect()
    locs = con.execute(
        "SELECT regexp_extract_all(?, '<url>(.*?)</url>', 1)", [body]
    ).fetchone()[0]
    assert len(locs) == 2 and "<loc>https://a/1</loc>" in locs[0]
    rb = "User-agent: *\nDisallow: /x\nSitemap: https://h/s.xml\nsitemap: https://h/t.xml\n"
    sm = con.execute(
        r"SELECT regexp_extract_all(?, '(?im)^sitemap:\s*(\S+)\s*$', 1)", [rb]
    ).fetchone()[0]
    assert sm == ["https://h/s.xml", "https://h/t.xml"]


def test_sitemap_xml_matches_duckdb_expected(spark, sf_dir):
    """DuckDB expected-output oracle: hosts doc_id%5, 3 urls each with
    the protocol defaults applied."""
    got = sorted(map(tuple, parse_sitemap_xml_op(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
      WITH h AS (SELECT DISTINCT doc_id % 5 AS h FROM documents),
      j AS (SELECT unnest(generate_series(0, 2)) AS j)
      SELECT 's' || h || '.example' AS host,
             'https://s' || h || '.example/u' || j AS loc,
             CASE WHEN j % 2 = 0 THEN '2024-02-0' || (j + 1) END AS lastmod,
             CASE WHEN j % 3 = 0 THEN CAST('0.' || (j + 3) AS DOUBLE)
                  ELSE CAST(0.5 AS DOUBLE) END AS priority
      FROM h CROSS JOIN j"""
            ).fetchall(),
        )
    )
    assert got == want
    assert any(r[2] is None for r in got)          # lastmod default
    assert any(abs(r[3] - 0.5) < 1e-12 for r in got)  # priority default


def test_sitemap_plan_no_shuffle(spark, sf_dir):
    """Dim-sized parsing: regexp + explode only — no Exchange beyond
    the distinct that builds the synthetic host dim."""
    plan = (
        parse_sitemap_xml_op(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Generate") == 1  # one explode of url blocks
