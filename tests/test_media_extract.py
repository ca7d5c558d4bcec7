"""extract_media_col on REAL crawl pages (the registry op's synthetic
twin is DuckDB-oracled in test_queries_duckdb): media refs come back in
document order with correct kinds, and pages without media yield []."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_focused_crawler_spark.operators.multimodal import extract_media_col


def test_extract_media_from_html(spark):
    pages = [
        (1, '<html><img src="https://a/x.jpg"><p>t</p>'
            '<video src="https://a/v.mp4"></video><img src="https://a/y.png"></html>'),
        (2, "<html><p>no media here</p></html>"),
    ]
    df = spark.createDataFrame(pages, "doc long, html string")
    rows = {r["doc"]: r["m"] for r in
            df.select("doc", extract_media_col(F.col("html")).alias("m")).collect()}
    assert [(m["media_url"], m["kind"]) for m in rows[1]] == [
        ("https://a/x.jpg", "image"),
        ("https://a/y.png", "image"),
        ("https://a/v.mp4", "video"),
    ]
    assert rows[2] == []


def test_extract_media_on_corpus_pages(spark, sf_dir):
    """Runs on the crawl corpus html (binary → decode) without error;
    the synthetic corpus has no media tags, so every page yields []."""
    from storm_focused_crawler_spark.fixtures import gen_pages

    paths = gen_pages.ensure(sf_dir)
    pages = spark.read.parquet(paths["pages"]).limit(50)
    got = pages.select(
        F.size(extract_media_col(F.decode(F.col("html"), "UTF-8"))).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert got == 0
