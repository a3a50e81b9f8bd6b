"""Multimodal plumbing: binary payload columns + mapInPandas kernels
(decode / resize / frame-sample / feature-extract). Kernels are stubs
(DECODE_IS_STUB); the plumbing under test — schemas, Arrow batching,
flatMap-shaped output, no-shuffle plans, similarity interop — is real."""

from __future__ import annotations

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import multimodal as MM
from index_search_monorepo_spark.operators.similarity import cosine_topk


def _payloads(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "x" * 100), (3, "short")],
        "doc_id long, text string",
    )
    return MM.with_binary_payload(docs)


def test_media_metadata_deterministic(spark):
    pl = _payloads(spark)
    out = {r["doc_id"]: r.asDict() for r in MM.extract_media_metadata(pl).collect()}
    assert out[2]["n_bytes"] == 100
    assert out[2]["width"] == 100 % 640 + 16
    assert out[2]["media_format"] == ("png", "jpg", "wav")[100 % 3]
    # stable across runs
    again = {r["doc_id"]: r.asDict() for r in MM.extract_media_metadata(pl).collect()}
    assert out == again


def test_resize_shape(spark):
    out = MM.resize_media(_payloads(spark), width=8, height=4).collect()
    for r in out:
        assert len(r["resized"]) == 8 * 4
        assert r["out_width"] == 8 and r["out_height"] == 4


def test_sample_frames_flatmap_shape(spark):
    frames = MM.sample_frames(_payloads(spark), every_ms=500, max_frames=4)
    rows = frames.collect()
    assert len(rows) > 3  # more output rows than input docs (flatMap shape)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, fs in by_doc.items():
        assert [f["frame_no"] for f in sorted(fs, key=lambda x: x["frame_no"])] == list(
            range(len(fs))
        )
        assert all(f["frame_ts_ms"] == f["frame_no"] * 500 for f in fs)


def test_extract_features_feeds_similarity(spark):
    emb = MM.extract_features(_payloads(spark), dim=8)
    rows = emb.collect()
    for r in rows:
        assert len(r["embedding"]) == 8
        norm = sum(x * x for x in r["embedding"]) ** 0.5
        assert abs(norm - 1.0) < 1e-5
    # interop: the embedding column drives the ANN operators unchanged
    topk = cosine_topk(
        emb.withColumnRenamed("doc_id", "vec_id"), query_ids=[1], k=1
    )
    got = topk.collect()
    assert len(got) == 1 and got[0]["query_id"] == 1


def test_no_shuffle_in_kernels(spark):
    pl = _payloads(spark)
    for df in (
        MM.extract_media_metadata(pl),
        MM.resize_media(pl, 4, 4),
        MM.sample_frames(pl),
        MM.extract_features(pl),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # scan -> mapInPandas, no shuffle
