"""Sequential from-spec crawl oracle (SURVEY.md §0, §5.2-2).

Single-process, Spark-free implementation of the deterministic crawl
semantics in SURVEY.md §2.1 / ``spec.py``.  This is the parity
authority: the Spark engine must reproduce its ``ordering`` rows, its
URL-seen hash set, and byte-identical extracted ``text`` per URL, for
the same (seeds, robots, budgets, capacity, rounds).

Binding clarifications of §2.1 that both implementations follow:
  * seen(before round 0) = ∅; seen(after round r) = seen ∪ emitted(r),
    plus ALL seed hashes after round 0 (covers robots-blocked seeds —
    "or was in the seed list", §2.1-3).
  * robots-blocked frontier entries are dropped for the round (not
    marked seen); discovery may re-add them, harmlessly.
  * discovered links inherit the (round-6) relevance score of the page
    they were found on (focused crawling); seeds score 0.0.
  * frontier dedup keeps, per canonical url, the entry with
    (max score, min depth, min discovered_round).
  * fetch = latest capture by warc_ts per url; urls absent from the
    corpus produce no result row but still become seen.
  * per-host budget default for a host missing from host_budget: 2.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from storm_focused_crawler_spark import spec

DEFAULT_BUDGET = 2


@dataclass
class CrawlConfig:
    rounds: int = 3
    capacity: int = 64  # global round capacity C
    keywords: tuple[str, ...] = ()
    # §2.1-7: blend host link-graph authority into the dequeue priority
    # (0.0 = pure relevance ordering, the pre-round-3 behavior)
    host_rank_weight: float = 0.0
    host_rank_iters: int = 5
    # "keywords" (§2.1-4) or "topic_nb" (functions/topic_nb.score_text)
    scorer: str = "keywords"
    nb_target_topic: str = "databases"
    # crawl-delay round window (driver.CrawlConfig.round_ms twin)
    round_ms: int = 60_000
    # focused-crawl depth cap (driver.CrawlConfig.max_depth twin):
    # links deeper than this are observed but never enqueued
    max_depth: int | None = None
    # cumulative per-host page quota (driver max_pages_per_host twin)
    max_pages_per_host: int | None = None


@dataclass
class CrawlResult:
    # (round, seq, url) — the parity artifact
    ordering: list[tuple[int, int, str]] = field(default_factory=list)
    # (round, seq, url, score, text, lang, n_links)
    results: list[tuple[int, int, str, float, str, str, int]] = field(default_factory=list)
    seen_hashes: set[int] = field(default_factory=set)
    frontier: dict[str, tuple[float, int, int]] = field(default_factory=dict)
    # (src_host, dst_host) per extracted link, in discovery order
    host_edges: list[tuple[str, str]] = field(default_factory=list)
    # host → absolute ms of its last fetch (rounds on one continuous
    # clock: round r spans [r·round_ms, (r+1)·round_ms)) — the twin of
    # the engine's checkpointed ``host_sched`` snapshot; only delayed
    # hosts are tracked
    host_last_abs: dict[str, int] = field(default_factory=dict)
    # host → pages dequeued across all rounds — the twin of the
    # engine's checkpointed ``host_used`` quota snapshot
    host_used: dict[str, int] = field(default_factory=dict)


def latest_captures(pages_rows) -> dict[str, tuple]:
    """url -> (warc_ts, html, text, lang) for the max-warc_ts capture."""
    best: dict[str, tuple] = {}
    for url, ts, html, text, lang in pages_rows:
        cur = best.get(url)
        if cur is None or ts > cur[0]:
            best[url] = (ts, html, text, lang)
    return best


def _host(url: str) -> str:
    return url.split("://", 1)[1].partition("/")[0]


def _blocked(url: str, robots: dict[str, list[tuple[str, bool]]]) -> bool:
    """REP verdict (RFC 9309 §2.2.2 + §2.2.3): the matching rule with
    the most octets in its raw text wins (``*``/``$`` metacharacters
    included in the count), Allow wins a length tie, no match ⇒
    allowed — the exact twin of operators/robots.rep_allowed."""
    from storm_focused_crawler_spark.operators.robots import rep_match_py

    rest = url.split("://", 1)[1]
    host, _, path = rest.partition("/")
    path = "/" + path
    best: tuple[int, bool] | None = None
    for prefix, allow in robots.get(host, ()):
        if prefix and rep_match_py(prefix, path):
            cand = (len(prefix), allow)
            if best is None or cand > best:
                best = cand
    return best is not None and not best[1]


def crawl(
    pages_rows,
    seeds: list[str],
    robots: dict[str, str],
    budgets: dict[str, int],
    cfg: CrawlConfig,
    intervals: dict[str, int] | None = None,
    redirects: dict[str, str] | None = None,
    sitemap_entries: dict[str, float] | None = None,
) -> CrawlResult:
    """*sitemap_entries* maps canon(loc) → sitemaps.org priority
    (load_sitemaps): discovered urls enter the round-0 frontier with
    score = priority (seeds keep 0.0; a url that is both takes the
    BETTER entry, i.e. the priority one), and are seen-marked at round
    0 exactly like seeds — the twin of driver.run_crawl's sitemap
    seeding."""
    corpus = latest_captures(pages_rows)
    res = CrawlResult()
    # frontier: canon url -> (score, depth, discovered_round)
    for s in seeds:
        c = spec.canon(s)
        cur = res.frontier.get(c)
        cand = (0.0, 0, 0)
        if cur is None or _better(cand, cur):
            res.frontier[c] = cand
    mark = list(seeds)
    for u, pr in (sitemap_entries or {}).items():
        c = spec.canon(u)
        cand = (pr, 0, 0)
        cur = res.frontier.get(c)
        if cur is None or _better(cand, cur):
            res.frontier[c] = cand
        mark.append(c)
    crawl_rounds(res, corpus, mark, robots, budgets, cfg, 0, cfg.rounds,
                 intervals=intervals, redirects=redirects)
    return res


def crawl_rounds(
    res: CrawlResult,
    corpus: dict[str, tuple],
    seeds: list[str],
    robots: dict[str, str],
    budgets: dict[str, int],
    cfg: CrawlConfig,
    r_start: int,
    r_end: int,
    intervals: dict[str, int] | None = None,
    redirects: dict[str, str] | None = None,
) -> CrawlResult:
    """Advance an existing crawl state through rounds [r_start, r_end) —
    the resume/maintenance entry point (driver.run_crawl's loop twin).

    *intervals* maps host → min_interval_ms (the host_budget column):
    the per-round budget cap is min(budget, ceil(round_ms/interval)),
    computed with the same integer ceil as the engine.

    *redirects* is the CLOSED canonical (url → final_url) 3xx mapping
    (load_redirects): a dequeued url fetches its landing page instead,
    the result row carries the FINAL url, both urls become seen, and a
    final already seen — from an earlier round OR a lower-seq fetch of
    the same round — yields no result row (no double fetch), exactly
    the engine's window + seen-semi-join dedup (driver.run_round)."""
    for r in range(r_start, r_end):
        # --- §2.1-7: host authority over the graph discovered so far -------
        ranks: dict[str, int] | None = None
        if cfg.host_rank_weight > 0 and r > 0 and res.host_edges:
            ranks = spec.pagerank_py(res.host_edges, cfg.host_rank_iters)

        def _prio(url: str, sc: float) -> float:
            if ranks is None:
                return sc
            return spec.blended_priority(
                sc, ranks.get(_host(url), 0), cfg.host_rank_weight
            )

        # --- eligibility: frontier ∖ seen, minus robots-blocked -----------
        # rows carry (url, priority, score, depth); ordering uses the
        # blended priority, everything downstream keeps the pure score
        elig = [
            (url, _prio(url, sc), sc, dep)
            for url, (sc, dep, _dr) in res.frontier.items()
            if spec.xxh64(url) not in res.seen_hashes and not _blocked(url, robots)
        ]
        # --- per-host top-budget by (priority desc, url asc) ----------------
        by_host: dict[str, list[tuple[str, float, float, int]]] = {}
        for url, pr, sc, dep in elig:
            by_host.setdefault(_host(url), []).append((url, pr, sc, dep))
        picked: list[tuple[str, float, float, int]] = []
        # url → (host, interval, sched_ms) for delayed hosts' picks —
        # sched uses the per-host rank BEFORE the global capacity cut,
        # exactly like the engine's _rn2 (frontier.dequeue)
        sched: dict[str, tuple[str, int, int]] = {}
        for host, rows in by_host.items():
            rows.sort(key=lambda t: (-t[1], t[0]))
            b = budgets.get(host, DEFAULT_BUDGET)
            if cfg.max_pages_per_host is not None:
                b = min(b, max(0, cfg.max_pages_per_host - res.host_used.get(host, 0)))
            i = (intervals or {}).get(host) or 0
            carry = 0
            if i > 0:  # crawl-delay cap over the carry-shrunk window,
                # integer-exact ceil (engine twin, incl. cross-round
                # continuity: carry = politeness debt at round start)
                last = res.host_last_abs.get(host)
                if last is not None:
                    carry = max(0, last + i - r * cfg.round_ms)
                left = cfg.round_ms - carry
                b = 0 if left <= 0 else min(b, (left + i - 1) // i)
                for k, row in enumerate(rows[:b]):
                    sched[row[0]] = (host, i, carry + k * i)
            picked.extend(rows[:b])
        # --- global top-C, seq = rank ---------------------------------------
        picked.sort(key=lambda t: (-t[1], t[0]))
        dequeued = picked[: cfg.capacity]

        new_links: list[tuple[str, float, int]] = []
        for seq, (url, _pr, sc, dep) in enumerate(dequeued, start=1):
            res.ordering.append((r, seq, url))
            res.host_used[_host(url)] = res.host_used.get(_host(url), 0) + 1
            final = (redirects or {}).get(url, url)
            # seen BEFORE this fetch?  True only via an earlier round or
            # a lower-seq fetch landing on the same final this round —
            # the engine's two dedup layers (redirect-to-seen: skip)
            already = spec.xxh64(final) in res.seen_hashes
            res.seen_hashes.add(spec.xxh64(url))
            if url in sched:  # advance the host's continuous clock
                h, _i, s = sched[url]
                abs_ms = r * cfg.round_ms + s
                if abs_ms > res.host_last_abs.get(h, -1):
                    res.host_last_abs[h] = abs_ms
            del res.frontier[url]
            if already:
                continue  # no result row, no re-fetch
            res.seen_hashes.add(spec.xxh64(final))
            cap = corpus.get(final)
            if cap is None:
                continue  # fetch miss: seen, no result
            _ts, html, _text, lang = cap
            text = spec.extract_text(html)
            if cfg.scorer == "topic_nb":
                from storm_focused_crawler_spark.functions.topic_nb import score_text

                page_score = score_text(text, cfg.nb_target_topic)
            else:
                page_score = spec.relevance_score(text, cfg.keywords)
            links = [spec.canon(u) for u in spec.extract_links(html)]
            res.results.append((r, seq, final, page_score, text, lang, len(links)))
            for link in links:
                new_links.append((link, page_score, dep + 1))
                res.host_edges.append((_host(final), _host(link)))
        if r == 0:
            for s in seeds:
                res.seen_hashes.add(spec.xxh64(spec.canon(s)))
        # --- frontier union + dedup ------------------------------------------
        for link, sc, dep in new_links:
            if cfg.max_depth is not None and dep > cfg.max_depth:
                continue  # observed (host_edges above) but never enqueued
            if spec.xxh64(link) in res.seen_hashes:
                continue
            cand = (sc, dep, r + 1)
            cur = res.frontier.get(link)
            if cur is None or _better(cand, cur):
                res.frontier[link] = cand
    return res


def refresh_victims(
    res: CrawlResult, last_round: int, max_age_rounds: int
) -> list[str]:
    """Age-based refresh twin of ``driver.refresh_victims``: urls whose
    LAST result row is ≥ *max_age_rounds* rounds behind *last_round*
    (the latest committed round), sorted for determinism."""
    last_fetch: dict[str, int] = {}
    for t in res.results:  # (round, seq, url, score, text, lang, n_links)
        last_fetch[t[2]] = max(last_fetch.get(t[2], -1), t[0])
    cutoff = last_round - max_age_rounds
    return sorted(u for u, r in last_fetch.items() if r <= cutoff)


def recrawl(
    res: CrawlResult, victims: list[str], mnt_round: int, rescore: float = 0.0
) -> None:
    """Maintenance twin of ``driver.recrawl`` (§ recrawl commit): evict
    *victims* from the seen set and re-enqueue them at *rescore*
    (depth 0, discovered_round = the maintenance round), EXACTLY the
    engine's semantics — victims already in the frontier keep their
    existing entry (the engine anti-joins requeued rows against the
    stored frontier).  The maintenance consumes round number
    *mnt_round* with no ordering rows; continue with ``crawl_rounds``
    from ``mnt_round + 1``."""
    for u in victims:
        c = spec.canon(u)
        res.seen_hashes.discard(spec.xxh64(c))
        if c not in res.frontier:
            res.frontier[c] = (rescore, 0, mnt_round)


def _better(a: tuple[float, int, int], b: tuple[float, int, int]) -> bool:
    """Frontier merge order: max score, then min depth, then min round."""
    return (-a[0], a[1], a[2]) < (-b[0], b[1], b[2])


def load_fixture_inputs(fix_paths: dict[str, str], user_agent: str = "focused-crawler"):
    """Read fixture tables into plain-python structures.

    *user_agent* applies only when the robots table carries raw
    robots.txt bodies (host, content): RFC 9309 group selection runs
    through robots.parse_robots_py — the exact twin of the engine's
    relational parse in driver.run_crawl."""
    import json

    import pyarrow.parquet as pq

    pages = pq.read_table(fix_paths["pages"])
    pages_rows = list(
        zip(
            pages.column("url").to_pylist(),
            pages.column("warc_ts").to_pylist(),
            pages.column("html").to_pylist(),
            pages.column("text").to_pylist(),
            pages.column("lang").to_pylist(),
        )
    )
    with open(fix_paths["seeds"]) as f:
        seeds = json.load(f)
    rb = pq.read_table(fix_paths["robots"])
    robots: dict[str, list[tuple[str, bool]]] = {}
    hosts = rb.column("host").to_pylist()
    if "content" in rb.column_names:  # raw robots.txt bodies
        from storm_focused_crawler_spark.operators.robots import parse_robots_py

        for h, c in zip(hosts, rb.column("content").to_pylist()):
            robots[h] = parse_robots_py(c, user_agent)
    elif "allow" in rb.column_names:  # full REP rule table
        for h, p, a in zip(hosts, rb.column("prefix").to_pylist(),
                           rb.column("allow").to_pylist()):
            robots.setdefault(h, []).append((p, bool(a)))
    else:  # legacy single-Disallow format
        for h, p in zip(hosts, rb.column("disallow_prefix").to_pylist()):
            robots.setdefault(h, []).append((p, False))
    hb = pq.read_table(fix_paths["host_budget"])
    budgets = dict(zip(hb.column("host").to_pylist(), hb.column("budget").to_pylist()))
    return pages_rows, seeds, robots, budgets


def load_redirects(fix_paths: dict[str, str]) -> dict[str, str]:
    """canon(url) → canon(final_url) with chains closed — the exact
    twin of driver.run_crawl's redirect load (3xx filter, canonicalize,
    then functions/udfs.close_mapping's bounded cycle-safe chase: 16
    hops max, stop at the last url before a revisit)."""
    import pyarrow.parquet as pq

    if "redirects" not in fix_paths:
        return {}
    rd = pq.read_table(fix_paths["redirects"])
    urls = rd.column("url").to_pylist()
    finals = rd.column("final_url").to_pylist()
    statuses = (
        rd.column("status").to_pylist()
        if "status" in rd.column_names
        else [301] * len(urls)
    )
    rows = {
        spec.canon(u): spec.canon(f)
        for u, f, s in zip(urls, finals, statuses)
        if s is not None and 300 <= int(s) < 400  # engine filter drops nulls
    }
    closed: dict[str, str] = {}
    for short in rows:
        cur = rows[short]
        seen = {short}
        for _ in range(16):
            if cur not in rows or cur in seen:
                break
            seen.add(cur)
            cur = rows[cur]
        closed[short] = cur
    return closed


def load_intervals(fix_paths: dict[str, str],
                   user_agent: str = "focused-crawler") -> dict[str, int]:
    """host → min_interval_ms: the host_budget column merged (max, the
    engine's conservative rule) with any ``Crawl-delay:`` directive of
    the selected group when the robots table carries raw bodies —
    driver.run_crawl's twin.  {} when neither source exists."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    hb = pq.read_table(fix_paths["host_budget"])
    if "min_interval_ms" in hb.column_names:
        for h, i in zip(hb.column("host").to_pylist(),
                        hb.column("min_interval_ms").to_pylist()):
            if i is not None and int(i) > 0:
                out[h] = int(i)
    rb = pq.read_table(fix_paths["robots"])
    if "content" in rb.column_names:
        from storm_focused_crawler_spark.operators.robots import parse_crawl_delay_py

        for h, c in zip(rb.column("host").to_pylist(),
                        rb.column("content").to_pylist()):
            d = parse_crawl_delay_py(c, user_agent)
            if d is not None and d > 0:
                out[h] = max(out.get(h, 0), d)
    return out


def load_sitemaps(fix_paths: dict[str, str]) -> dict[str, float]:
    """canon(loc) → max sitemaps.org priority (default 0.5) across
    every <url> block of every sitemap body — the exact twin of
    driver.run_crawl's sitemap load (operators/sitemap.
    parse_sitemap_xml + driver-side max-priority dedup).

    Full discovery chain: when the robots fixture carries RAW bodies
    AND the sitemap table carries a ``sitemap_url`` column, only the
    sitemaps DECLARED by some robots ``Sitemap:`` directive are read —
    the twin of the engine's extract_sitemaps semi-join."""
    import re as _re

    import pyarrow.parquet as pq

    sm = pq.read_table(fix_paths["sitemaps"])
    declared: set[str] | None = None
    rb = pq.read_table(fix_paths["robots"])
    if "content" in rb.column_names and "sitemap_url" in sm.column_names:
        declared = set()
        for c in rb.column("content").to_pylist():
            declared |= set(_re.findall(r"(?im)^sitemap:\s*(\S+)\s*$", c))
    urls = (
        sm.column("sitemap_url").to_pylist()
        if "sitemap_url" in sm.column_names
        else [None] * sm.num_rows
    )
    out: dict[str, float] = {}
    for su, body in zip(urls, sm.column("body").to_pylist()):
        if declared is not None and su not in declared:
            continue
        # (?s): multi-line (pretty-printed) sitemap bodies — twin of
        # operators/sitemap.parse_sitemap_xml (ADVICE r05 #1)
        for block in _re.findall(r"(?s)<url>(.*?)</url>", body):
            m = _re.search(r"<loc>([^<]*)</loc>", block)
            if not m or not m.group(1):
                continue
            pm = _re.search(r"<priority>([^<]*)</priority>", block)
            pr = float(pm.group(1)) if pm and pm.group(1) else 0.5
            u = spec.canon(m.group(1))
            if out.get(u, -1.0) < pr:
                out[u] = pr
    return out
