"""S10/S11/S12 sinks: batched HTTP POST against a local stub server,
JSON-lines sink round-trip, and stdlib-SpreadsheetML XLSX structure."""

from __future__ import annotations

import http.server
import json
import threading
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.sinks import (
    post_json_batches,
    write_json,
    write_xlsx,
)


class _Collector(http.server.BaseHTTPRequestHandler):
    batches: list[list[dict]] = []
    batch_ids: list[str] = []
    lock = threading.Lock()

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with self.lock:
            type(self).batches.append(json.loads(body))
            type(self).batch_ids.append(self.headers.get("X-Batch-Id", ""))
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"{}")

    def log_message(self, *a):  # silence
        pass


def _serve():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


class TestHttpSink:
    def test_batched_post_100_docs_per_request(self, spark):
        """Reference operating constant: ~100 docs per Solr POST
        (document_indexer_service.py:45-80)."""
        _Collector.batches = []
        srv = _serve()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/update/json/docs"
            docs = spark.range(250).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("t"), F.col("id")).alias("text"),
            ).coalesce(1)
            status = post_json_batches(docs, url, batch_size=100)
            rows = status.collect()
            assert [r["status"] for r in rows] == [200, 200, 200]
            assert sorted(r["n_docs"] for r in rows) == [50, 100, 100]
            got = sorted(
                d["doc_id"] for batch in _Collector.batches for d in batch
            )
            assert got == list(range(250))
            assert all(len(b) <= 100 for b in _Collector.batches)
        finally:
            srv.shutdown()

    def test_posts_fire_once_across_multiple_actions(self, spark):
        """ADVICE r02: the sink must materialize exactly once per call —
        count() + collect() + a second collect() on the returned status
        frame must NOT re-send any batch."""
        _Collector.batches = []
        srv = _serve()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/update/json/docs"
            docs = spark.range(30).select(
                F.col("id").alias("doc_id")
            ).coalesce(1)
            status = post_json_batches(docs, url, batch_size=10)
            n_after_call = len(_Collector.batches)
            assert n_after_call == 3  # fired eagerly, inside the call
            status.count()
            status.collect()
            status.collect()
            assert len(_Collector.batches) == n_after_call  # no re-sends
        finally:
            srv.shutdown()

    def test_idempotency_key_is_stable_across_resends(self, spark):
        """At-least-once hardening: every request carries a deterministic
        X-Batch-Id (md5 of the JSON body) that also lands in the status
        rows — a retried/replayed send of the same rows produces the SAME
        id, so duplicate deliveries are detectable downstream."""
        import hashlib

        _Collector.batches = []
        _Collector.batch_ids = []
        srv = _serve()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/u"
            docs = spark.range(20).select(
                F.col("id").alias("doc_id")
            ).coalesce(1)
            reg: list = []
            first = post_json_batches(
                docs, url, batch_size=10, cache_registry=reg
            )
            ids_first = [r["batch_id"] for r in first.collect()]
            # server-observed header == status-row id == md5(body)
            assert sorted(_Collector.batch_ids) == sorted(ids_first)
            expect = [
                hashlib.md5(json.dumps(b).encode()).hexdigest()
                for b in _Collector.batches
            ]
            assert sorted(expect) == sorted(ids_first)
            # simulated re-delivery (same rows): identical ids
            second = post_json_batches(docs, url, batch_size=10)
            assert sorted(r["batch_id"] for r in second.collect()) == sorted(
                ids_first
            )
            # cache lifecycle: registry collected the persisted status RDD
            assert len(reg) == 1 and reg[0].is_cached
            from index_search_monorepo_spark.operators.dedup import (
                release_caches,
            )

            release_caches(reg)
            assert reg == []
        finally:
            srv.shutdown()

    def test_failed_batch_is_a_row_not_a_job_failure(self, spark):
        """DLQ semantics: an unreachable endpoint produces status=-1 rows
        (requeue is the caller's decision); the Spark job succeeds."""
        docs = spark.range(10).select(F.col("id").alias("doc_id")).coalesce(1)
        status = post_json_batches(
            docs, "http://127.0.0.1:9/unreachable", batch_size=4, timeout=2
        )
        rows = status.collect()
        assert len(rows) == 3
        assert all(r["status"] == -1 and r["error"] for r in rows)


class TestJsonSink:
    def test_round_trip(self, spark, tmp_path):
        df = spark.range(20).select(
            F.col("id").alias("doc_id"), F.concat(F.lit("x"), F.col("id")).alias("v")
        )
        write_json(df, str(tmp_path / "j"))
        back = spark.read.json(str(tmp_path / "j"))
        assert back.count() == 20
        assert {r["v"] for r in back.collect()} == {f"x{i}" for i in range(20)}


class TestXlsxSink:
    def test_workbook_structure_and_values(self, spark, tmp_path):
        stats = spark.createDataFrame(
            [("Q", 15, " Science"), ("I", 7, "I")],
            "first_letter string, total_count long, category string",
        )
        pct = spark.createDataFrame([("a&b <c>", 1.5)], "value string, pct double")
        path = str(tmp_path / "stats.xlsx")
        write_xlsx({"LC Class_dist": stats, "bad[name]?:*": pct}, path)

        with zipfile.ZipFile(path) as z:
            names = set(z.namelist())
            assert {
                "[Content_Types].xml",
                "_rels/.rels",
                "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels",
                "xl/worksheets/sheet1.xml",
                "xl/worksheets/sheet2.xml",
            } <= names
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
            sheet_names = [
                s.attrib["name"] for s in wb.iter(f"{ns}sheet")
            ]
            assert sheet_names[0] == "LC Class_dist"
            assert "[" not in sheet_names[1] and "?" not in sheet_names[1]
            s1 = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
            texts = [t.text for t in s1.iter(f"{ns}t")]
            assert "first_letter" in texts and " Science" in texts
            vals = [v.text for v in s1.iter(f"{ns}v")]
            assert "15" in vals
            s2 = ET.fromstring(z.read("xl/worksheets/sheet2.xml"))
            texts2 = [t.text for t in s2.iter(f"{ns}t")]
            assert "a&b <c>" in texts2  # XML-escaped on write, parses back

    def test_max_rows_guard(self, spark, tmp_path):
        big = spark.range(100).select(F.col("id"))
        try:
            write_xlsx({"s": big}, str(tmp_path / "x.xlsx"), max_rows=10)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "max_rows" in str(e)
