"""robots.txt (RFC 9309) parsing + crawl-permission decisions — the
politeness gate of the crawl/extraction tier.

The reference has no crawler (its ingest is pre-fetched library objects,
zip_file_handler.py); for the web-scale extraction tier the analogous
admission control is the Robots Exclusion Protocol: before a URL enters
the frontier it must pass the host's robots rules for our product token.

Parsing and matching follow RFC 9309 exactly where it is specified:

 - **Groups** (§2.1): consecutive `user-agent` lines share one group;
   rules before any user-agent line are ignored; group selection picks
   the LONGEST product-token match (case-insensitive substring-prefix of
   the agent), falling back to `*`; if a specific group matches, the `*`
   group does NOT also apply.
 - **Rule matching** (§2.2.2): path patterns are octet-wise prefix
   matches with `*` (any sequence) and `$` (end anchor); the rule with
   the LONGEST pattern wins; on a tie between allow and disallow, allow
   wins. No matching rule -> allowed. An empty `disallow:` value is a
   no-op (allow-all), per the RFC's grammar.
 - Unknown directives are skipped; keys are case-insensitive; `#`
   comments strip to end-of-line; a UTF-8 BOM on the first line is
   tolerated.

Scale shape: robots bodies are HOST-grain — a 100 TB corpus has ~1e8
hosts at most, and rules per host are tiny. `host_rules` parses each
body ONCE into a JSON rule list (Arrow-batched); the URL feed then
broadcast-joins the host-grain rules and `with_robots_allowed` evaluates
the longest-match decision in a vectorized pandas kernel — per-URL
control-plane logic stays in Python (regex per host-rule), the corpus
text never moves, and there is no shuffle beyond the (auto-broadcast)
host join.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# ----------------------------------------------------------- pure parsing ---


def parse_robots_groups(body: str) -> list[dict]:
    """RFC 9309 §2.1 group parse: [{'agents': [...], 'rules':
    [(allow: bool, pattern: str), ...], 'crawl_delay': int|None}].

    `crawl-delay` is a de-facto extension (not in the RFC) kept because
    real crawlers honor it; it rides the group it appears in.
    """
    groups: list[dict] = []
    cur: dict | None = None
    in_agent_run = False  # consecutive user-agent lines extend one group
    for raw in (body or "").split("\n"):
        line = raw.lstrip("﻿").split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agent_run:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
                in_agent_run = True
            cur["agents"].append(val.lower())
        elif key in ("allow", "disallow"):
            in_agent_run = False
            if cur is None:
                continue  # rules before any user-agent line: ignored
            if val == "":
                # empty disallow = allow-all no-op; empty allow likewise
                continue
            cur["rules"].append((key == "allow", val))
        elif key == "crawl-delay":
            in_agent_run = False
            if cur is not None and val.isdigit():
                cur["crawl_delay"] = int(val)
        else:
            in_agent_run = False
    return groups


def select_group(groups: list[dict], agent: str) -> dict | None:
    """Most-specific group for `agent` (RFC 9309 §2.2.1): the longest
    product token that case-insensitively prefixes the agent string wins;
    `*` only applies when no specific group matches. Groups matching via
    the SAME winning token are combined into one rule list in file order
    (§2.2.1 "matching groups' rules MUST be combined"); the `*` group
    never merges into a specific match. crawl_delay takes the first
    group's non-null value."""
    agent = (agent or "").lower()
    best_tok: str | None = None
    for g in groups:
        for tok in g["agents"]:
            if tok != "*" and agent.startswith(tok):
                if best_tok is None or len(tok) > len(best_tok):
                    best_tok = tok
    # two matching tokens of equal length are equal strings (both are
    # prefixes of `agent`), so the winning token is unique as a string
    want = best_tok if best_tok is not None else "*"
    merged: dict | None = None
    for g in groups:
        if want not in g["agents"]:
            continue
        if merged is None:
            merged = {
                "agents": [want],
                "rules": list(g["rules"]),
                "crawl_delay": g["crawl_delay"],
            }
        else:
            merged["rules"].extend(g["rules"])
            if merged["crawl_delay"] is None:
                merged["crawl_delay"] = g["crawl_delay"]
    return merged


def _pattern_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(p) for p in core.split("*"))
    return re.compile(rx + ("$" if anchored else ""))


def match_rules(
    rules: list[tuple[bool, str]], path: str
) -> tuple[bool, str | None]:
    """(allowed, matched_pattern) — longest-match wins, allow wins ties,
    no match -> allowed (RFC 9309 §2.2.2)."""
    best_len = -1
    best_allow = True
    best_pattern: str | None = None
    for allow, pattern in rules:
        if _pattern_regex(pattern).match(path or "/"):
            n = len(pattern)
            if n > best_len or (n == best_len and allow and not best_allow):
                best_len, best_allow, best_pattern = n, allow, pattern
    if best_len < 0:
        return True, None
    return best_allow, best_pattern


def robots_decision(
    body: str, path: str, agent: str
) -> tuple[bool, str | None, int | None]:
    """(allowed, matched_pattern, crawl_delay) for one URL path against
    one robots.txt body — the composed parse/select/match kernel."""
    g = select_group(parse_robots_groups(body), agent)
    if g is None:
        return True, None, None
    allowed, pattern = match_rules(g["rules"], path)
    return allowed, pattern, g["crawl_delay"]


# ------------------------------------------------------------ spark layer ---

RULES_SCHEMA = StructType(
    [
        StructField("rules_json", StringType()),
        StructField("crawl_delay", LongType()),
    ]
)

DECISION_SCHEMA = StructType(
    [
        StructField("allowed", LongType()),
        StructField("matched_pattern", StringType()),
    ]
)


def host_rules_udf(agent: str):
    """pandas UDF: robots body -> (rules_json, crawl_delay) for `agent`
    — the parse-once-per-host step. Marked nondeterministic so a filter
    on the derived struct cannot re-evaluate the parse (CLAUDE.md lesson
    #9)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(RULES_SCHEMA)
    def parse(bodies: pd.Series) -> pd.DataFrame:
        out = []
        for body in bodies:
            g = select_group(parse_robots_groups(body or ""), agent)
            if g is None:
                out.append((json.dumps([]), None))
            else:
                out.append(
                    (
                        json.dumps(
                            [[a, p] for a, p in g["rules"]],
                            separators=(",", ":"),
                        ),
                        g["crawl_delay"],
                    )
                )
        return pd.DataFrame(out, columns=["rules_json", "crawl_delay"])

    return parse.asNondeterministic()


def host_rules(
    robots: DataFrame,
    agent: str,
    host_col: str = "host",
    body_col: str = "robots_body",
) -> DataFrame:
    """(host, rules_json, crawl_delay): each host's robots body parsed
    ONCE for `agent`. Host-grain — tiny next to any URL feed, the
    broadcast side of the admission join."""
    parsed = robots.withColumn(
        "_r", host_rules_udf(agent)(F.col(body_col))
    )
    return parsed.select(
        F.col(host_col).alias("host"),
        F.col("_r.rules_json").alias("rules_json"),
        F.col("_r.crawl_delay").alias("crawl_delay"),
    )


def _decide_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DECISION_SCHEMA)
    def decide(paths: pd.Series, rules_json: pd.Series) -> pd.DataFrame:
        out = []
        cache: dict[str, list] = {}
        for path, rj in zip(paths, rules_json):
            if rj is None:
                out.append((1, None))
                continue
            rules = cache.get(rj)
            if rules is None:
                rules = [(bool(a), p) for a, p in json.loads(rj)]
                cache[rj] = rules
            allowed, pattern = match_rules(rules, path or "/")
            out.append((1 if allowed else 0, pattern))
        return pd.DataFrame(out, columns=["allowed", "matched_pattern"])

    return decide.asNondeterministic()


def with_robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """URL feed + host-grain `host_rules` output -> feed with
    `allowed` (1/0), `matched_pattern`, `crawl_delay` columns.

    The join is host-keyed with the rules side explicitly broadcast
    (host-grain, small by construction); an unknown host means no
    robots.txt -> allowed, matching crawler practice for 404 robots.
    The per-URL longest-match runs in one vectorized pandas stage with a
    per-batch rule-list cache keyed by the JSON payload."""
    joined = urls.join(
        F.broadcast(rules.withColumnRenamed("host", host_col)),
        host_col,
        "left",
    )
    d = _decide_udf()(F.col(path_col), F.col("rules_json"))
    return (
        joined.withColumn("_d", d)
        .withColumn("allowed", F.col("_d.allowed"))
        .withColumn("matched_pattern", F.col("_d.matched_pattern"))
        .drop("_d", "rules_json")
    )
