#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.4 noop-sink
isolation). NOT part of the driver contract — bench.py stays frozen.

Modes:
  python bench_extra.py time [q1,q2,...]      # warmup + best-of-N per query
  python bench_extra.py plans OUTDIR [qs]     # dump .explain("formatted")
  python bench_extra.py ab NAME_A NAME_B      # interleaved A/B of two
                                              # queries (same JVM), best-of
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     BENCH_EXTRA_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))

DEFAULT_QS = (
    "ocr_concat,span_sequence,allfields_concat,pricing_summary,"
    "regional_customers,topk_orders_per_cust,event_sequence_concat,"
    "windowed_counts,dedup_minhash,dedup_lsh_pairs,similarity_topk,"
    "lang_id,doc_fingerprint"
)


def _mat(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _get_spark():
    from index_search_monorepo_spark.session import get_spark

    return get_spark(app_name="bench_extra")


def _queries():
    import __spark_entry__ as entry

    return entry.queries()


def cmd_time(qnames: list[str]) -> None:
    spark = _get_spark()
    qmap = _queries()
    out: dict[str, dict] = {}
    for name in qnames:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = qmap[name](spark, SF_DIR)
        _mat(df)  # warmup
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            _mat(df)
            samples.append(round(time.time() - t0, 3))
        out[name] = {"best": min(samples), "samples": samples}
        print(f"{name}: best={min(samples)} samples={samples}", flush=True)
    print(
        "BENCH_EXTRA "
        + json.dumps({"sf_dir": SF_DIR, "runs": RUNS, "queries": out})
    )
    spark.stop()


def cmd_plans(outdir: str, qnames: list[str], suffix: str) -> None:
    spark = _get_spark()
    qmap = _queries()
    od = Path(outdir)
    od.mkdir(parents=True, exist_ok=True)
    for name in qnames:
        df = qmap[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (od / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {od / f'{name}_{suffix}.txt'}", flush=True)
    spark.stop()


def cmd_ab(names: list[str]) -> None:
    """Interleaved A/B of two (or more) registered queries in ONE JVM:
    warmup each, then alternate timed runs so ambient load drift hits
    both variants equally. Best-of per variant is the estimator."""
    spark = _get_spark()
    qmap = _queries()
    dfs = {n: qmap[n](spark, SF_DIR) for n in names}
    for n in names:
        _mat(dfs[n])  # warmups
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(RUNS):
        for n in names:
            t0 = time.time()
            _mat(dfs[n])
            samples[n].append(round(time.time() - t0, 3))
    for n in names:
        print(f"{n}: best={min(samples[n])} samples={samples[n]}")
    print("BENCH_EXTRA_AB " + json.dumps({"sf_dir": SF_DIR, "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "time":
        qs = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT_QS).split(",")
        cmd_time([q for q in qs if q])
    elif mode == "plans":
        outdir = sys.argv[2]
        qs = (sys.argv[3] if len(sys.argv) > 3 else DEFAULT_QS).split(",")
        suffix = sys.argv[4] if len(sys.argv) > 4 else "before"
        cmd_plans(outdir, [q for q in qs if q], suffix)
    elif mode == "ab":
        cmd_ab(sys.argv[2].split(","))
    else:
        raise SystemExit(f"unknown mode {mode}")
