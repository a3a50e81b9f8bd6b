"""The end-to-end crawl-frontier refresh plan: one composition of the
crawl-tier operator library that takes discovered URLs (sitemap seeds +
outlinks from fetched pages) to a polite, prioritized fetch schedule.

This is the loop the round-5 operators open and this plan closes:

    sitemap_entries / outlinks ─┐
                                ├─> canonicalize -> dedup -> filter ->
    fetched-set (checkpoint) ───┘    robots admit -> prioritize ->
                                     frontier_schedule

Stage layout is chosen by shuffle shape, not by concept (the
plans/curation.py discipline):

  A. canonicalize + features — RFC 3986 canonical form (urlnorm) and
     host/domain features (urlfilter) are pure per-row codegen; they
     fuse into ONE narrow pass over the feed, zero joins, zero shuffles.
  B. URL dedup — ONE shuffle on the canonical-URL key (uniform md5-like
     distribution, no skew); this is the frontier's intrinsic shuffle —
     the same URL discovered from two pages must schedule once.
  C. already-fetched anti-join — against the fetched-set checkpoint
     (operators/checkpoint.py convention); AQE picks broadcast when the
     fetched side is small, shuffle anti-join on the uniform key when
     it is not (at web scale it is billions of rows: never forced
     broadcast).
  D. blocklist gate — per-row suffix membership from stage A's
     features, zero extra work.
  E. robots admission — host-grain rules broadcast + one vectorized
     decision stage (operators/robots.py); the feed never shuffles.
  F. priority — host-grain rank join (e.g. pagerank_e9 over the
     outlink domain graph), broadcast by construction (hosts are ~1e8
     at full web scale, ranks are 16 bytes/row — still broadcastable
     per-executor; 'auto' lets AQE decide).
  G. schedule — frontier_schedule's two slim shuffles (host wave
     window, fetcher/wave dispatch order) over (url, host, priority)
     rows only.

Document payloads never enter this plan; every shuffle carries slim URL
rows. `report=True` materializes per-stage survivor counts, the
attrition convention shared with curate_corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import frontier as FR
from index_search_monorepo_spark.operators import robots as RB
from index_search_monorepo_spark.operators import urlfilter as UF
from index_search_monorepo_spark.operators import urlnorm as UN
from index_search_monorepo_spark.operators.dedup import (
    _maybe_broadcast,
    _persist,
    release_caches,
)


def refresh_frontier(
    discovered: DataFrame,
    fetched: DataFrame | None = None,
    robots: DataFrame | None = None,
    host_priority: DataFrame | None = None,
    blocked_domains: list[str] | None = None,
    agent: str = "graftbot",
    n_fetchers: int = 16,
    default_delay: int = 1,
    url_col: str = "url",
    report: bool = False,
    registry: list | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Discovered URL feed -> (schedule, attrition_report).

    `discovered`: any frame with `url_col` (sitemap entries' `loc`,
    weblinks outlinks, seed lists — union them upstream).
    `fetched`: optional frame with a `canon_url` column of already-
    fetched canonical URLs (anti-joined out).
    `robots`: optional (host, robots_body) — parsed once per host for
    `agent`; hosts absent from it are 404-allowed with `default_delay`.
    `host_priority`: optional (host, priority) — e.g. PageRank over the
    outlink domain graph; missing hosts get priority 0.

    Schedule columns: canon_url (as `url`), host, fetcher, wave,
    queue_pos, not_before_sec, plus robots' matched_pattern.
    """
    own_registry = registry if registry is not None else []
    stages: list[tuple[str, DataFrame]] = []

    # A: canonical form + per-row URL features, one fused narrow pass
    feed = UN.with_canonical_url(discovered, url_col=url_col)
    feed = UF.with_url_features(
        feed, url_col="canon_url", blocked=list(blocked_domains or [])
    )
    stages.append(("discovered", feed))

    # B: the frontier's intrinsic shuffle — one row per canonical URL
    deduped = feed.select(
        "canon_url", F.col("url_host").alias("host"), "url_blocked"
    ).dropDuplicates(["canon_url"])
    stages.append(("deduped", deduped))

    # C: drop what a previous cycle already fetched
    if fetched is not None:
        deduped = deduped.join(
            _maybe_broadcast(fetched.select("canon_url"), "auto"),
            "canon_url",
            "left_anti",
        )
        stages.append(("unfetched", deduped))

    # D: blocklist gate (flag computed in stage A, filter is free)
    if blocked_domains:
        deduped = deduped.filter(~F.col("url_blocked"))
        stages.append(("unblocked", deduped))
    deduped = deduped.drop("url_blocked")

    # E: robots admission — path+query is what RFC 9309 matches on
    path = F.regexp_replace(
        F.col("canon_url"), r"^[a-z][a-z0-9+.\-]*://[^/?]*", ""
    )
    candidates = deduped.withColumn(
        "path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    if robots is not None:
        rules = RB.host_rules(robots, agent=agent)
        admitted = RB.with_robots_allowed(candidates, rules).filter(
            F.col("allowed") == 1
        )
    else:
        admitted = candidates.withColumn(
            "matched_pattern", F.lit(None).cast("string")
        ).withColumn("crawl_delay", F.lit(None).cast("long"))
    admitted = admitted.withColumn(
        "_delay",
        F.coalesce(F.col("crawl_delay"), F.lit(default_delay)).cast("long"),
    ).drop("crawl_delay", "path")
    stages.append(("admitted", admitted))

    # F: priority (host-grain join; missing hosts fetch last)
    if host_priority is not None:
        admitted = admitted.join(
            _maybe_broadcast(host_priority, "auto"), "host", "left"
        )
        prio = F.coalesce(F.col("priority"), F.lit(0)).cast("long")
    else:
        prio = F.lit(0).cast("long")
    ranked = admitted.withColumn("_prio", prio)
    if host_priority is not None:
        ranked = ranked.drop("priority")

    # G: the schedule itself
    schedule = FR.frontier_schedule(
        ranked.withColumnRenamed("canon_url", "url"),
        n_fetchers=n_fetchers,
        priority_col="_prio",
        delay_col="_delay",
    ).drop("_prio", "_delay")

    if not report:
        return schedule, None

    rows = []
    prev = None
    for name, frame in stages:
        frame = _persist(frame, own_registry)
        n = frame.count()
        rows.append((name, prev if prev is not None else n, n))
        prev = n
    spark = schedule.sparkSession
    rep = spark.createDataFrame(
        [(s, n_in, n_out, n_in - n_out) for s, n_in, n_out in rows],
        "stage string, urls_in long, urls_out long, urls_dropped long",
    )
    if registry is None:
        release_caches(own_registry)
    return schedule, rep
