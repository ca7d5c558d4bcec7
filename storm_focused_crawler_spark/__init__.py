"""PySpark-native focused-crawler engine.

A from-scratch re-expression of the capabilities of
``socialsensor/storm-focused-crawler`` (a Storm topology: fetch →
extract → rank bolts with Redis URL-state) as an idiomatic Spark
engine.  See SURVEY.md for the blueprint; the reference directory was
empty in this sandbox (SURVEY.md §0), so all parity claims are against
the deterministic semantics pinned in SURVEY.md §2.1 and implemented
twice: once in Spark (this package) and once in a sequential oracle
(``storm_focused_crawler_spark.oracle.seqcrawler``).
"""

__version__ = "0.1.0"
