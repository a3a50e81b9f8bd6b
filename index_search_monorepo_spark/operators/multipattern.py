"""Aho-Corasick multi-pattern substring matching — the blocklist engine
for pattern sets too large for a regex union.

The C4 bad-words path (operators/c4rules.py) is token MEMBERSHIP — right
for word lists, blind to multi-word phrases and substrings. Real
blocklists (the "List of Dirty, Naughty ..." C4 actually used, spam
phrase lists, copyrighted-sequence markers) run to tens of thousands of
PATTERNS; a regex union compiles to a pathological alternation and a
per-pattern scan loop is O(len * n_patterns). Aho-Corasick (Aho &
Corasick 1975) matches the whole set in ONE pass: a trie with failure
links, O(len + matches) per document, independent of pattern count.

Spark shape (the 100 TB contract): the automaton is built ONCE on the
driver from the bounded pattern list (broadcast-dim pattern: blocklists
are dictionary-sized, corpora are not), SparkContext-broadcast, and a
single Arrow-batched struct pandas UDF streams each document through it
— zero shuffles, zero joins, one ArrowEvalPython stage (bound once
behind a Project boundary + nondeterministic per CLAUDE.md lessons
#1/#9, plan-pinned).

Semantics (the oracle contract): ALL match occurrences are counted —
every (pattern, end-position) pair, including overlaps within one
pattern ("aa" hits "aaa" twice) and across patterns (a pattern that is
a suffix of another fires at the same position via the output links).
Case-sensitive; callers lowercase upstream if wanted. That definition
is exactly replayable in SQL (per pattern: count of positions i with
substr(text, i, len(p)) = p), which is what the driver gate checks.

Reference: no counterpart in hathitrust/index_search_monorepo; built
per the brief's text-analysis / curation category.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MP_COLS = ("n_matches", "n_patterns", "first_pattern", "hit")


def build_automaton(patterns: tuple[str, ...] | list[str]):
    """Aho-Corasick automaton as plain picklable lists:
    (goto: list[dict[ch, state]], out: list[list[pattern_idx]],
    fail: list[int], patterns: tuple). Duplicate/empty patterns are
    rejected — they would double-count or match everywhere."""
    pats = tuple(patterns)
    if not pats:
        raise ValueError("patterns must be non-empty")
    if any(not p for p in pats):
        raise ValueError("empty pattern not allowed")
    if len(set(pats)) != len(pats):
        raise ValueError("duplicate patterns not allowed")
    goto: list[dict] = [{}]
    out: list[list[int]] = [[]]
    for idx, p in enumerate(pats):
        s = 0
        for ch in p:
            if ch not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][ch] = len(goto) - 1
            s = goto[s][ch]
        out[s].append(idx)
    fail = [0] * len(goto)
    q = deque()
    for ch, s in goto[0].items():
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
            out[s] = out[s] + out[fail[s]]
    return goto, out, fail, pats


def ac_find_all(text: str, automaton) -> list[tuple[int, int]]:
    """All (end_position_0based, pattern_idx) match pairs."""
    goto, out, fail, _pats = automaton
    s = 0
    hits = []
    for i, ch in enumerate(text):
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        for idx in out[s]:
            hits.append((i, idx))
    return hits


def with_pattern_matches(
    df: DataFrame,
    patterns: tuple[str, ...] | list[str],
    text_col: str = "text",
    prefix: str = "mp_",
) -> DataFrame:
    """Adds {prefix}n_matches (BIGINT total occurrences, overlaps
    included), {prefix}n_patterns (BIGINT distinct patterns hit),
    {prefix}first_pattern (lexicographically smallest matched pattern,
    '' when clean) and {prefix}hit (BIGINT 0/1) from ONE automaton
    pass. NULL text scores as clean."""
    taken = {f"{prefix}{c}" for c in MP_COLS}
    clash = taken.intersection(df.columns)
    if clash:
        raise ValueError(
            f"with_pattern_matches would overwrite input column(s)"
            f" {sorted(clash)}; rename them first"
        )
    automaton = build_automaton(patterns)
    spark = df.sparkSession
    bauto = spark.sparkContext.broadcast(automaton)

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_t = StructType(
        [
            StructField("n_matches", LongType()),
            StructField("n_patterns", LongType()),
            StructField("first_pattern", StringType()),
            StructField("hit", LongType()),
        ]
    )

    @F.pandas_udf(out_t)
    def scan(texts: pd.Series) -> pd.DataFrame:
        auto = bauto.value
        pats = auto[3]
        n_m, n_p, first, hit = [], [], [], []
        for t in texts:
            if t is None:
                n_m.append(0)
                n_p.append(0)
                first.append("")
                hit.append(0)
                continue
            hits = ac_find_all(t, auto)
            seen = {idx for _end, idx in hits}
            n_m.append(len(hits))
            n_p.append(len(seen))
            first.append(min((pats[i] for i in seen), default=""))
            hit.append(1 if hits else 0)
        return pd.DataFrame(
            {
                "n_matches": n_m,
                "n_patterns": n_p,
                "first_pattern": first,
                "hit": hit,
            }
        )

    # one evaluation per row: bound once behind a Project boundary AND
    # nondeterministic — predicate pushdown otherwise duplicates the
    # stage when callers filter on a result field (CLAUDE.md lesson #9)
    kernel = scan.asNondeterministic()
    bound = f"_{prefix}struct"
    out = df.withColumn(bound, kernel(F.col(text_col)))
    for c in MP_COLS:
        out = out.withColumn(f"{prefix}{c}", F.col(bound)[c])
    return out.drop(bound)


def pattern_matches_oracle_sql(
    patterns: tuple[str, ...] | list[str],
    source_cte: str = "documents",
    text_sql: str = "text",
    prefix: str = "mp_",
) -> str:
    """DuckDB replay of the all-occurrences semantics per pattern via an
    INDEPENDENT position-scan formulation (substr equality at every
    start offset — no automaton, no regex). Exposes {prefix}out:
    (doc_id, {prefix}n_matches, {prefix}n_patterns,
    {prefix}first_pattern, {prefix}hit). Pattern literals are embedded;
    single quotes are SQL-escaped."""
    build_automaton(patterns)  # reuse its validation
    p = prefix

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    per_pat = " UNION ALL ".join(
        f"SELECT doc_id, {lit(pat)} AS pat,"
        f" CAST(len(list_filter(generate_series(1,"
        f" greatest(len(s) - {len(pat)} + 1, 0)),"
        f" i -> substr(s, i, {len(pat)}) = {lit(pat)})) AS BIGINT) AS c"
        f" FROM {p}src"
        for pat in patterns
    )
    return f"""
    {p}src AS (
      SELECT doc_id, coalesce({text_sql}, '') AS s FROM {source_cte}
    ),
    {p}per AS ({per_pat}),
    {p}out AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS {p}n_matches,
             CAST(count(*) FILTER (WHERE c > 0) AS BIGINT)
               AS {p}n_patterns,
             coalesce(min(pat) FILTER (WHERE c > 0), '')
               AS {p}first_pattern,
             CAST(max(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS {p}hit
      FROM {p}per GROUP BY doc_id
    )"""
