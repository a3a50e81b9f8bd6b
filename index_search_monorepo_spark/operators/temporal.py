"""Temporal operators over event streams: gap sessionization and the
as-of (merge) join.

Reference: no counterpart in hathitrust/index_search_monorepo (its event
surface is request-log analytics, `apps/monitoring/`); built per the
brief's custom-operator category — the as-of join is the canonical
"operator Spark lacks" re-expressed as a composition of built-ins.

Scale shapes (the whole point of both designs):

 - `sessionize`: ONE hash exchange on the session key feeds BOTH window
   passes (lag + running sum reuse the same partitioning — Catalyst
   plans a single Exchange), and every derived quantity is integer
   microsecond arithmetic, bit-identical in DuckDB. No self-join, no
   range explosion: the 100 TB alternative people reach for (event ×
   event inequality join per user) is quadratic in the hot user's
   events; the window formulation is linear and spill-safe.
 - `asof_join`: the UNION-TAG merge technique. Joining "each left row
   to the latest right row at or before its timestamp" as an inequality
   join explodes into a range join (O(n·m) per key worst case, and
   Spark plans it as BroadcastNestedLoop when the equi-key is skewed).
   Instead: union both sides tagged, ONE window sorted by (ts, side,
   tie), and `last(right_value, ignorenulls=True)` carries the most
   recent right payload forward to each left row — one shuffle, linear
   per key, the same trick pandas.merge_asof / kdb aj execute natively.
   Determinism contract: right rows tie-broken by (ts, tie_col)
   ascending, so the match is the MAX tie_col among the latest
   eligible timestamp — mirrored exactly by the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "session_stats",
    "asof_join",
    "sessionize_oracle_sql",
    "asof_oracle_sql",
    "scd2_build",
    "scd2_lookup",
    "scd2_oracle_sql",
    "with_rolling_stats",
    "rolling_oracle_sql",
    "resample_ffill",
    "resample_oracle_sql",
    "with_anomaly_flags",
    "anomaly_oracle_sql",
]


def _us(col: str | Column) -> Column:
    """Epoch microseconds of a timestamp column, wall-clock-exact for
    TIMESTAMP_NTZ (parquet's default here): the NTZ wall time is pinned
    to UTC before unix_micros, matching DuckDB's epoch_us(naive) no
    matter the Spark session timezone."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(F.to_utc_timestamp(c, "UTC"))


def sessionize(
    df: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """df + (session_ord, session_event_ord): gap-based sessions — a new
    session starts when the time since the user's previous event exceeds
    `gap_seconds` (strictly greater, microsecond-exact). session_ord is
    the 1-based session ordinal within the user; session_event_ord the
    1-based event ordinal within the session. Total order inside a user
    is (ts, order_col) — order rides in data, never row order (repo
    convention). One Exchange on user_col serves every window pass."""
    if gap_seconds < 0:
        raise ValueError(f"gap_seconds must be >= 0, got {gap_seconds}")
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    gap_us = int(gap_seconds) * 1_000_000
    new_sess = (
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(1))
        .when(
            _us(ts_col) - F.lag(_us(ts_col)).over(w) > gap_us, F.lit(1)
        )
        .otherwise(F.lit(0))
    )
    out = df.withColumn("_new_sess", new_sess).withColumn(
        "session_ord",
        F.sum("_new_sess")
        .over(
            Window.partitionBy(user_col)
            .orderBy(ts_col, order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("long"),
    )
    w_sess = Window.partitionBy(user_col, "session_ord").orderBy(
        ts_col, order_col
    )
    return out.withColumn(
        "session_event_ord", F.row_number().over(w_sess).cast("long")
    ).drop("_new_sess")


def session_stats(
    df: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """(user, session_ord, n_events, duration_us): the per-session
    rollup — map-side-combinable aggregation after sessionize's single
    exchange (same key prefix, so no second shuffle of the fact rows)."""
    return (
        sessionize(df, gap_seconds, user_col, ts_col, order_col)
        .groupBy(user_col, "session_ord")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.max(_us(ts_col)) - F.min(_us(ts_col)))
            .cast("long")
            .alias("duration_us"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_cols: list[str],
    tie_col: str | None = None,
    allow_exact: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: every LEFT row + the selected columns of the
    latest RIGHT row with the same keys and right.ts <= left.ts (< when
    allow_exact=False); NULLs when no right row qualifies. Right rows
    carrying equal timestamps are tie-broken by tie_col ascending (the
    match is the max tie_col at the matched timestamp) — pass the
    right side's unique id for a deterministic result. Matched columns
    come back as f"{name}{suffix}" plus f"ts{suffix}" (epoch micros of
    the matched right row).

    Both inputs must share the key/ts column names; right_cols are
    right-side payload columns (must not collide with key/ts names).
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    for c in right_cols:
        if c in key_cols or c == ts_col:
            raise ValueError(f"right_col {c!r} collides with key/ts")
    tie = [tie_col] if tie_col and tie_col not in right_cols else []
    pay_cols = list(dict.fromkeys(right_cols + tie))
    # left rows pack their payload into one struct so the union schema
    # is just (keys, ts, side, right payload, _lrow)
    lrow_t = left.select(
        F.struct(*[left[c] for c in left.columns]).alias("s")
    ).schema["s"].dataType
    rhs = right.select(*key_cols, ts_col, *pay_cols)
    # a left row must see right rows at the SAME ts when allow_exact:
    # sort right (side 0) before left (side 1); strict mode puts right
    # rows AFTER (side 2) so equal-ts rows are invisible to the carry.
    uni = left.select(
        *key_cols,
        ts_col,
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(rhs.schema[c].dataType).alias(c)
            for c in pay_cols
        ],
        F.struct(*[left[c] for c in left.columns]).alias("_lrow"),
    ).unionByName(
        rhs.select(
            *key_cols,
            ts_col,
            F.lit(0 if allow_exact else 2).alias("_side"),
            *pay_cols,
            F.lit(None).cast(lrow_t).alias("_lrow"),
        )
    )
    order = [F.col(ts_col).asc(), F.col("_side").asc()] + [
        F.col(t).asc() for t in ([tie_col] if tie_col else [])
    ]
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_right = F.col("_side") != 1
    carried = uni
    for c in right_cols:
        carried = carried.withColumn(
            f"{c}{suffix}",
            F.last(F.when(is_right, F.col(c)), ignorenulls=True).over(w),
        )
    carried = carried.withColumn(
        f"ts{suffix}",
        F.last(F.when(is_right, _us(ts_col)), ignorenulls=True).over(w),
    )
    out_cols = (
        [F.col("_lrow")[c].alias(c) for c in left.columns]
        + [F.col(f"{c}{suffix}") for c in right_cols]
        + [F.col(f"ts{suffix}")]
    )
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def sessionize_oracle_sql(
    source_cte: str,
    gap_seconds: int,
    user_sql: str = "user_id",
    ts_sql: str = "ts",
    order_sql: str = "event_id",
) -> str:
    """DuckDB CTE chain mirroring sessionize; exposes sess_tbl with the
    source columns + session_ord + session_event_ord."""
    gap_us = int(gap_seconds) * 1_000_000
    return f"""
    sess_lag AS (
      SELECT *,
             CASE WHEN lag(epoch_us({ts_sql})) OVER w IS NULL THEN 1
                  WHEN epoch_us({ts_sql}) - lag(epoch_us({ts_sql})) OVER w
                       > {gap_us} THEN 1
                  ELSE 0 END AS _new_sess
      FROM {source_cte}
      WINDOW w AS (PARTITION BY {user_sql}
                   ORDER BY {ts_sql}, {order_sql})
    ),
    sess_ord AS (
      SELECT * EXCLUDE (_new_sess),
             CAST(sum(_new_sess) OVER (
               PARTITION BY {user_sql} ORDER BY {ts_sql}, {order_sql}
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_ord
      FROM sess_lag
    ),
    sess_tbl AS (
      SELECT *,
             CAST(row_number() OVER (
               PARTITION BY {user_sql}, session_ord
               ORDER BY {ts_sql}, {order_sql}) AS BIGINT)
               AS session_event_ord
      FROM sess_ord
    )"""


def asof_oracle_sql(
    left_cte: str,
    right_cte: str,
    key_sql: str,
    ts_sql: str = "ts",
    tie_sql: str = "event_id",
    allow_exact: bool = True,
) -> str:
    """DuckDB CTE mirroring asof_join via an INDEPENDENT formulation
    (correlated scalar subqueries, not the union-window technique — the
    two engines answer the same question two different ways); exposes
    asof_tbl: every left row + ts_asof (epoch micros of the matched
    right row, NULL when unmatched) + tie_asof (the tie_sql value of the
    matched row under the max-tie-at-matched-ts contract)."""
    cmp = "<=" if allow_exact else "<"
    return f"""
    asof_tbl AS (
      SELECT l.*,
             (SELECT max(epoch_us(r.{ts_sql})) FROM {right_cte} r
               WHERE r.{key_sql} = l.{key_sql}
                 AND epoch_us(r.{ts_sql}) {cmp} epoch_us(l.{ts_sql}))
               AS ts_asof,
             (SELECT max(r.{tie_sql}) FROM {right_cte} r
               WHERE r.{key_sql} = l.{key_sql}
                 AND epoch_us(r.{ts_sql}) =
                     (SELECT max(epoch_us(r2.{ts_sql}))
                        FROM {right_cte} r2
                       WHERE r2.{key_sql} = l.{key_sql}
                         AND epoch_us(r2.{ts_sql}) {cmp}
                             epoch_us(l.{ts_sql})))
               AS tie_asof
      FROM {left_cte} l
    )"""


def scd2_build(
    df: DataFrame,
    attr_cols: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Change log -> type-2 slowly-changing dimension: consecutive rows
    per key with identical tracked attributes collapse into ONE version
    row with a half-open validity interval `[valid_from_us,
    valid_to_us)`; the key's latest version has `valid_to_us` NULL and
    `is_current` true.

    The warehouse-canonical SCD2 build (Kimball type 2), expressed as
    two window passes over ONE hash exchange on the key: a lag pass
    flags version starts (first row, or any attribute `IS DISTINCT
    FROM` its predecessor — null-safe, so NULL->'x' and 'x'->NULL both
    open versions), a running sum numbers them, and after keeping only
    version-start rows a lead over the SAME partitioning closes each
    interval with the next version's start. No self-join, no range
    explosion; linear per key and spill-safe, which is what the daily
    100 TB change-log fold needs. Total order inside a key is
    (ts, order_col) — order rides in data, never row order.
    Returns (key, *attr_cols, version, valid_from_us, valid_to_us,
    is_current)."""
    if not attr_cols:
        raise ValueError("scd2_build requires at least one tracked attribute")
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    changed = F.lag(order_col).over(w).isNull()
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    ver = (
        F.sum(F.when(changed, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
    )
    starts = (
        df.withColumn("_new_ver", F.when(changed, 1).otherwise(0))
        .withColumn("version", ver)
        .filter(F.col("_new_ver") == 1)
    )
    w_ver = Window.partitionBy(key_col).orderBy("version")
    return (
        starts.withColumn("valid_from_us", _us(ts_col).cast("long"))
        .withColumn(
            "valid_to_us", F.lead("valid_from_us").over(w_ver).cast("long")
        )
        .withColumn("is_current", F.col("valid_to_us").isNull())
        .select(
            key_col, *attr_cols, "version", "valid_from_us", "valid_to_us",
            "is_current",
        )
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Point-in-time enrichment: each fact row joins the dimension
    version whose half-open interval contains the fact timestamp. The
    join is an EQUI-join on the key with the interval test as a cheap
    post-filter — per-key version counts are small by construction
    (versions, not events), so the fan-out is bounded and Spark plans a
    hash join, never the range-join nested loop."""
    d = dim.select(
        F.col(key_col).alias("_d_key"),
        *[c for c in dim.columns if c not in (key_col,)],
    )
    ts_us = _us(facts[ts_col])
    cond = (
        (facts[key_col] == d["_d_key"])
        & (d["valid_from_us"] <= ts_us)
        & (d["valid_to_us"].isNull() | (ts_us < d["valid_to_us"]))
    )
    return facts.join(d, cond, "left").drop("_d_key")


def scd2_oracle_sql(
    source_cte: str,
    attr_sqls: list[str],
    key_sql: str = "user_id",
    ts_sql: str = "ts",
    order_sql: str = "event_id",
) -> str:
    """DuckDB CTE chain mirroring scd2_build; exposes scd_tbl with
    (key, attrs, version, valid_from_us, valid_to_us, is_current)."""
    distinct = " OR ".join(
        f"({a} IS DISTINCT FROM lag({a}) OVER w)" for a in attr_sqls
    )
    attrs = ", ".join(attr_sqls)
    return f"""
    scd_lag AS (
      SELECT *,
             CASE WHEN lag({order_sql}) OVER w IS NULL THEN 1
                  WHEN {distinct} THEN 1 ELSE 0 END AS _new_ver
      FROM {source_cte}
      WINDOW w AS (PARTITION BY {key_sql}
                   ORDER BY {ts_sql}, {order_sql})
    ),
    scd_ver AS (
      SELECT *, CAST(sum(_new_ver) OVER (
               PARTITION BY {key_sql} ORDER BY {ts_sql}, {order_sql}
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
      FROM scd_lag
    ),
    scd_start AS (
      SELECT {key_sql}, {attrs}, version,
             CAST(epoch_us({ts_sql}) AS BIGINT) AS valid_from_us
      FROM scd_ver WHERE _new_ver = 1
    ),
    scd_tbl AS (
      SELECT *,
             CAST(lead(valid_from_us) OVER (
               PARTITION BY {key_sql} ORDER BY version) AS BIGINT)
               AS valid_to_us,
             lead(valid_from_us) OVER (
               PARTITION BY {key_sql} ORDER BY version) IS NULL
               AS is_current
      FROM scd_start
    )"""


def with_rolling_stats(
    df: DataFrame,
    window_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """df + (roll_cnt, roll_sum_e4): sliding time-RANGE window — for each
    event, the count and e4-fixed-point sum of the key's events in the
    trailing `window_seconds` (inclusive both ends: `RANGE BETWEEN w
    PRECEDING AND CURRENT ROW` over epoch microseconds).

    The RANGE frame is the part people get wrong at scale: a ROWS frame
    is order-dependent under timestamp ties and a self-join per event is
    quadratic in the hot key. Spark's range frame over the integer
    microsecond key is linear per key after ONE hash exchange, includes
    every tie deterministically, and matches DuckDB's RANGE semantics
    bit-for-bit on the integer sort key."""
    if window_seconds < 0:
        raise ValueError(f"window_seconds must be >= 0, got {window_seconds}")
    wus = int(window_seconds) * 1_000_000
    w = (
        Window.partitionBy(key_col)
        .orderBy(_us(ts_col))
        .rangeBetween(-wus, Window.currentRow)
    )
    v_e4 = F.round(F.col(value_col) * 10000, 0).cast("long")
    return df.withColumn(
        "roll_cnt", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn("roll_sum_e4", F.sum(v_e4).over(w).cast("long"))


def rolling_oracle_sql(
    source_cte: str,
    window_seconds: int,
    key_sql: str = "user_id",
    ts_sql: str = "ts",
    value_sql: str = "value",
) -> str:
    """DuckDB CTE mirroring with_rolling_stats; exposes roll_tbl with the
    source columns + roll_cnt + roll_sum_e4."""
    wus = int(window_seconds) * 1_000_000
    return f"""
    roll_tbl AS (
      SELECT *,
             CAST(count(*) OVER w AS BIGINT) AS roll_cnt,
             CAST(sum(CAST(round({value_sql} * 10000, 0) AS BIGINT))
                  OVER w AS BIGINT) AS roll_sum_e4
      FROM {source_cte}
      WINDOW w AS (PARTITION BY {key_sql} ORDER BY epoch_us({ts_sql})
                   RANGE BETWEEN {wus} PRECEDING AND CURRENT ROW)
    )"""


def resample_ffill(
    df: DataFrame,
    step_seconds: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
    max_slots_per_key: int = 10_000_000,
) -> DataFrame:
    """Irregular observations -> a regular per-key time grid with
    forward fill: one row per (key, slot) for every `step_seconds` slot
    between the key's first and last observation, carrying
    (slot_start_us, value_e4, is_gap) where value_e4 is the e4
    fixed-point LAST observation at or before the slot (within a slot,
    last = max (ts, order_col) — order rides in data) and is_gap marks
    slots with no observation of their own.

    The time-series resample/gap-fill primitive (pandas .resample().
    ffill(), TimescaleDB time_bucket_gapfill + locf) in relational
    form: per-slot last-observation rollup -> per-key bounds ->
    sequence() grid explode -> left join -> last(ignorenulls) window.
    Every exchange carries slim (key, slot, value) rows — the payload
    table is touched once, in the first rollup. The all-array
    alternative (one row per key holding the whole grid) is NOT
    spill-safe: a 10-year key at 1 s steps is 3e8 elements in one row;
    the relational grid spills per-partition like any other table.
    `max_slots_per_key` guards the sequence() explosion (raise_error,
    errors-are-rows does not apply to a resource guard)."""
    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be > 0, got {step_seconds}")
    p_us = int(step_seconds) * 1_000_000
    us = _us(ts_col)
    slot = ((us - F.pmod(us, F.lit(p_us))) / F.lit(p_us)).cast("long")
    last_obs = F.max(
        F.struct(
            us.alias("ts_us"),
            F.col(order_col).alias("ord"),
            F.round(F.col(value_col) * 10000, 0).cast("long").alias("v_e4"),
        )
    )
    obs = (
        df.groupBy(F.col(key_col).alias("_k"), slot.alias("_slot"))
        .agg(last_obs.getField("v_e4").alias("_obs_e4"))
    )
    bounds = obs.groupBy("_k").agg(
        F.min("_slot").alias("_mn"), F.max("_slot").alias("_mx")
    )
    span = F.col("_mx") - F.col("_mn") + 1
    grid = bounds.select(
        "_k",
        F.explode(
            F.when(
                span <= F.lit(max_slots_per_key),
                F.sequence("_mn", "_mx"),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("resample_ffill: grid of "),
                        span.cast("string"),
                        F.lit(f" slots exceeds max_slots_per_key="
                              f"{max_slots_per_key} for key "),
                        F.col("_k").cast("string"),
                    )
                )
            )
        ).alias("_slot"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["_k", "_slot"], "left")
        .select(
            F.col("_k").alias(key_col),
            F.col("_slot").alias("slot"),
            (F.col("_slot") * p_us).cast("long").alias("slot_start_us"),
            F.last("_obs_e4", ignorenulls=True).over(w).alias("value_e4"),
            F.col("_obs_e4").isNull().alias("is_gap"),
        )
    )


def resample_oracle_sql(
    source_cte: str,
    step_seconds: int,
    key_sql: str = "event_type",
    ts_sql: str = "ts",
    value_sql: str = "value",
    order_sql: str = "event_id",
) -> str:
    """DuckDB CTE chain mirroring resample_ffill; exposes resample_tbl
    with (key, slot, slot_start_us, value_e4, is_gap).

    PRECONDITION (ADVICE r05 #2): non-negative epoch micros only. This
    SQL buckets with DuckDB's `//`, which truncates toward zero
    (-7 // 2 = -3 there), while the Spark side floors via the
    pmod-aligned division — slot indices diverge for pre-1970
    timestamps (pagerank.py documents the same `//` constraint)."""
    p_us = int(step_seconds) * 1_000_000
    return f"""
    rs_o AS (
      SELECT {key_sql} AS rs_key,
             CAST(epoch_us({ts_sql}) AS BIGINT) // {p_us} AS slot,
             CAST(round({value_sql} * 10000, 0) AS BIGINT) AS v_e4,
             row_number() OVER (
               PARTITION BY {key_sql},
                            CAST(epoch_us({ts_sql}) AS BIGINT) // {p_us}
               ORDER BY {ts_sql} DESC, {order_sql} DESC) AS rn
      FROM {source_cte}
    ),
    rs_obs AS (
      SELECT rs_key, slot, v_e4 AS obs_e4 FROM rs_o WHERE rn = 1
    ),
    rs_grid AS (
      SELECT rs_key, unnest(generate_series(mn, mx)) AS slot
      FROM (SELECT rs_key, min(slot) AS mn, max(slot) AS mx
            FROM rs_obs GROUP BY rs_key)
    ),
    resample_tbl AS (
      SELECT g.rs_key, g.slot,
             CAST(g.slot * {p_us} AS BIGINT) AS slot_start_us,
             last_value(o.obs_e4 IGNORE NULLS) OVER (
               PARTITION BY g.rs_key ORDER BY g.slot) AS value_e4,
             o.obs_e4 IS NULL AS is_gap
      FROM rs_grid g LEFT JOIN rs_obs o
        ON o.rs_key = g.rs_key AND o.slot = g.slot
    )"""


def with_anomaly_flags(
    df: DataFrame,
    window_seconds: int,
    k: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    min_prior: int = 3,
) -> DataFrame:
    """df + (an_n_prior, an_is_anomaly): flag events whose e4 value
    deviates from the key's TRAILING window mean by more than k sample
    standard deviations — integer-exact via cross-multiplication, no
    division and no floats anywhere.

    The test (x - s/n)^2 > k^2 * (s2 - s^2/n)/n rearranges to
    (n*x - s)^2 > k^2 * (n*s2 - s^2) over the PRIOR window (the current
    event is excluded from its own baseline — a spike must not defend
    itself). Events with fewer than `min_prior` prior observations are
    never flagged. Overflow bound (documented): with e4 values < 1e7
    and windows < 1e4 events, n*s2 < 1e4 * 1e4*1e14 = 1e22 — EXCEEDS
    BIGINT for pathological inputs, so values are clamped to
    |v_e4| <= 10_000_000 and window counts are the caller's contract;
    at the gate's value range (< 5e6 e4, windows < 1e3) every term fits
    with 10^3 headroom. One hash exchange on the key serves all three
    window sums."""
    if window_seconds <= 0:
        raise ValueError(
            f"window_seconds must be > 0, got {window_seconds}"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w_us = int(window_seconds) * 1_000_000
    v = F.round(F.col(value_col) * 10000, 0).cast("long")
    v = F.greatest(
        F.least(v, F.lit(10_000_000)), F.lit(-10_000_000)
    )
    # RANGE frame over epoch micros, PRIOR events only (exclusive of
    # the current row's timestamp would also drop same-ts peers; the
    # contract is "strictly earlier timestamps", deterministic under
    # ties)
    w = (
        Window.partitionBy(key_col)
        .orderBy(_us(ts_col))
        .rangeBetween(-w_us, -1)
    )
    n = F.count(F.lit(1)).over(w).cast("long")
    s = F.coalesce(F.sum(v).over(w), F.lit(0)).cast("long")
    s2 = F.coalesce(F.sum(v * v).over(w), F.lit(0)).cast("long")
    lhs = (n * v - s) * (n * v - s)
    rhs = F.lit(int(k) * int(k)) * (n * s2 - s * s)
    return df.withColumn("an_n_prior", n).withColumn(
        "an_is_anomaly",
        F.when((n >= min_prior) & (lhs > rhs), F.lit(True)).otherwise(
            F.lit(False)
        ),
    )


def anomaly_oracle_sql(
    source_cte: str,
    window_seconds: int,
    k: int = 3,
    key_sql: str = "user_id",
    ts_sql: str = "ts",
    value_sql: str = "value",
    min_prior: int = 3,
) -> str:
    """DuckDB CTE mirroring with_anomaly_flags; exposes anom_tbl with
    the source columns + an_n_prior + an_is_anomaly."""
    w_us = int(window_seconds) * 1_000_000
    v = (f"greatest(least(CAST(round({value_sql} * 10000, 0) AS BIGINT),"
         f" 10000000), -10000000)")
    return f"""
    anom_tbl AS (
      SELECT *, an_n_prior,
             an_n_prior >= {min_prior}
             AND (an_n_prior * v_e4 - s_w) * (an_n_prior * v_e4 - s_w)
                 > {int(k) * int(k)} * (an_n_prior * s2_w - s_w * s_w)
               AS an_is_anomaly
      FROM (
        SELECT *, {v} AS v_e4,
               CAST(count(*) OVER w AS BIGINT) AS an_n_prior,
               CAST(coalesce(sum({v}) OVER w, 0) AS BIGINT) AS s_w,
               CAST(coalesce(sum({v} * {v}) OVER w, 0) AS BIGINT) AS s2_w
        FROM {source_cte}
        WINDOW w AS (PARTITION BY {key_sql}
                     ORDER BY epoch_us({ts_sql})
                     RANGE BETWEEN {w_us} PRECEDING AND 1 PRECEDING)
      )
    )"""
