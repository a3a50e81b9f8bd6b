"""Training-export operators: sequence packing and deterministic sampling.

The last mile of a training-data pipeline: after curation, documents are
(a) sampled into mixture proportions and (b) packed into fixed-token-budget
training sequences. Both are here as first-class, oracle-checkable ops.

`pack_sequences` implements GPT-style concat-and-chunk packing: within a
shard, documents are concatenated in a deterministic order and the token
stream is cut every `budget` tokens. Each document learns which sequence it
starts in (`seq_id`), at which offset (`seq_offset`), and whether it spans a
sequence boundary — exactly the bookkeeping a packed-dataset writer needs.
This semantics (concatenate-then-chunk, documents may straddle boundaries)
is the standard LM-pretraining packing; it is fully window-expressible, so
the whole op is one hash-partition shuffle + a linear per-shard scan — no
sequential driver loop, unlike first-fit bin packing.

`hash_sample_pmille` is deterministic content-hash sampling (mod-1000 on an
md5-derived key): stable across runs and cluster sizes, join-free, and
mirrorable bit-for-bit in the DuckDB oracle. Per-stratum rates compose as a
CASE over the stratum column.

Scale: the only exchange in packing is the repartition-by-shard implied by
the window; shard count is a parameter (thousands at 100 TB), budget
chunking within a shard is embarrassingly parallel afterwards. Sampling is
per-row, zero shuffle.

Hashes are md5-derived (identical lowercase hex in both engines), same
convention as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# number of leading md5 hex digits folded into the integer hash key:
# 6 digits = 24 bits, safely inside exact BIGINT arithmetic in both engines
HASH_HEX_DIGITS = 6


def hash_key_expr(key: Column, salt: str = "") -> Column:
    """Deterministic integer in [0, 16^HASH_HEX_DIGITS) from an md5 of the
    (salted) key — the shared primitive for sharding and sampling."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1,
                    HASH_HEX_DIGITS),
        16,
        10,
    ).cast("long")


def hash_key_sql(key_sql: str, salt: str = "") -> str:
    """DuckDB mirror of hash_key_expr (positional hex-digit fold, the
    dedup_simhash strpos convention). The salt is SQL-escaped; key_sql is
    a trusted SQL expression."""
    h = f"md5('{salt.replace(chr(39), chr(39) * 2)}'"
    h += f" || CAST({key_sql} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (HASH_HEX_DIGITS - 1 - i)}"
        for i in range(HASH_HEX_DIGITS)
    )
    return f"({terms})"


def hash_sample_pmille(
    key: Column, rate_pmille: Column | int, salt: str = "sample"
) -> Column:
    """True for a deterministic ~rate_pmille/1000 subset of keys. Stable
    across runs/cluster layouts; different salts give independent samples
    (held-out splits, A/B corpora)."""
    rate = F.lit(rate_pmille) if isinstance(rate_pmille, int) else rate_pmille
    return (hash_key_expr(key, salt) % 1000) < rate


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 16,
    order_col: str = "doc_id",
    shard_salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk packing bookkeeping per document (GPT-style):

      shard            : md5-hash shard in [0, n_shards) — the unit of
                         packing; token mass balances across shards by
                         hash uniformity
      seq_id           : index (within the shard) of the fixed-`budget`
                         sequence this document STARTS in
      seq_offset       : token offset of the document inside that sequence
      n_seqs_spanned   : how many sequences the document touches (1 unless
                         it straddles a boundary; 0-token docs touch 1)
      crosses_boundary : 1 when n_seqs_spanned > 1 (BIGINT for oracle
                         hashing, epd_matches convention)

    Deterministic given (order_col, budget, n_shards, salt): the stream
    order within a shard is ORDER BY order_col (callers must pass a
    tie-free key — doc_id — or the packing is partition-order dependent).
    One shuffle (the window's hash partition on shard); the cumulative
    sum is a single linear pass per shard. Input columns are preserved;
    a pre-existing column named like an output (or scratch) column would
    be silently clobbered, so that is an error."""
    taken = {"shard", "seq_id", "seq_offset", "n_seqs_spanned",
             "crosses_boundary", "_cum_prev", "_end_seq"}
    clash = taken.intersection(df.columns)
    if clash:
        raise ValueError(
            f"pack_sequences would overwrite input column(s) {sorted(clash)};"
            " rename them first"
        )
    toks = F.col(tokens_col).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard = (hash_key_expr(F.col(order_col), shard_salt) % n_shards).cast(
        "long"
    )
    out = (
        df.withColumn("shard", shard)
        .withColumn(
            "_cum_prev", F.coalesce(F.sum(toks).over(w), F.lit(0).cast("long"))
        )
        .select(
            "*",
            # integer DIV keeps the arithmetic exact at any cumulative
            # token count (float division drifts past 2^53)
            F.expr(f"CAST(_cum_prev DIV {budget} AS BIGINT)").alias("seq_id"),
            (F.col("_cum_prev") % budget).alias("seq_offset"),
            F.expr(
                f"CAST(CASE WHEN {tokens_col} > 0"
                f" THEN (_cum_prev + CAST({tokens_col} AS BIGINT) - 1)"
                f" DIV {budget}"
                f" ELSE _cum_prev DIV {budget} END AS BIGINT)"
            ).alias("_end_seq"),
        )
        .select(
            "*",
            (F.col("_end_seq") - F.col("seq_id") + 1).alias("n_seqs_spanned"),
            F.when(F.col("_end_seq") > F.col("seq_id"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("crosses_boundary"),
        )
    )
    return out.drop("_cum_prev", "_end_seq")
