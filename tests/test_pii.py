"""PII detection/redaction — pattern behavior, fixed redaction order,
and ENGINE PARITY: the same adversarial inputs must count and redact
byte-identically in Spark (Java regex) and DuckDB (RE2), because the
driver oracle hashes the redacted strings."""

from __future__ import annotations

import duckdb

from index_search_monorepo_spark.operators import pii as P

CASES = [
    "plain text with no pii at all",
    "mail me at jane.doe+spam@sub.example.co.uk today",
    "see https://ex.org/a/b?q=1&r=2#frag and http://plain.net/x",
    "host 10.0.255.7 and 192.168.1.1.",
    "call +1 555-0142 or +441 555-0143 now",
    # a URL that CONTAINS an email-like and an IP-like substring: the
    # URL redacts first and swallows both
    "ref http://a.b/c@d.ee/10.0.0.1?x=1 end",
    # adjacent classes with punctuation boundaries
    "u42@example.com,10.1.2.3,+1 555-0001",
    # almost-matches that must NOT fire
    "not a phone 555-0142; not an ip 10.0.7; not a url htt://x",
    "trailing dot ip 1.2.3.4. and version v1.2.3.4000",
    # r4 review: URL must not swallow glued punctuation/next clause
    "read (http://ex.org/docs) now and http://x.io/p, end",
    # r4 review: octets bounded 0-255
    "octets 10.0.7.999 and 256.1.1.1 bad; 255.255.255.255 and 0.0.0.0 good",
]


def _spark_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict() for r in P.with_pii(df).collect()
    }


def _duck_rows():
    con = duckdb.connect()
    counts, redacted = P.oracle_pii_sql("text")
    rows = con.execute(
        f"""
        SELECT doc_id, {counts}, {redacted} AS pii_redacted
        FROM (SELECT * FROM (VALUES {",".join(
            f"({i}, '{t.replace(chr(39), chr(39) * 2)}')"
            for i, t in enumerate(CASES)
        )}) AS v(doc_id, text))
        """
    ).fetchall()
    cols = ["doc_id", "n_urls", "n_emails", "n_ipv4", "n_phones",
            "pii_redacted"]
    return {r[0]: dict(zip(cols, r)) for r in rows}


class TestPatterns:
    def test_counts_and_redaction(self, spark):
        out = _spark_rows(spark)
        assert out[0]["n_pii"] == 0 and out[0]["n_urls"] == 0
        assert out[0]["pii_redacted"] == CASES[0]
        assert out[1]["n_emails"] == 1
        assert "<EMAIL>" in out[1]["pii_redacted"]
        assert "jane" not in out[1]["pii_redacted"]
        assert out[2]["n_urls"] == 2
        assert out[2]["pii_redacted"] == "see <URL> and <URL>"
        assert out[3]["n_ipv4"] == 2
        assert out[4]["n_phones"] == 2
        # URL swallows the email-like / IP-like substrings inside it
        # (counts stay raw-text measures: both still count)
        assert out[5]["pii_redacted"] == "ref <URL> end"
        assert out[5]["n_emails"] == 1 and out[5]["n_ipv4"] == 1
        assert out[6]["n_pii"] == 3
        assert out[6]["pii_redacted"] == "<EMAIL>,<IP>,<PHONE>"
        assert out[7]["n_pii"] == 0 and out[7]["n_urls"] == 0
        # the \b boundary matches before the sentence-final dot; the
        # 4-digit last octet of the version string does not match
        assert out[8]["n_ipv4"] == 1
        assert "v1.2.3.4000" in out[8]["pii_redacted"]
        # URL redaction keeps the ')' and ',' glued to the URL
        assert out[9]["n_urls"] == 2
        assert out[9]["pii_redacted"] == "read (<URL>) now and <URL>, end"
        # out-of-range octets are not IPs; in-range ones are
        assert out[10]["n_ipv4"] == 2
        assert "10.0.7.999" in out[10]["pii_redacted"]
        assert "256.1.1.1" in out[10]["pii_redacted"]
        assert "255.255.255.255" not in out[10]["pii_redacted"]

    def test_engine_parity(self, spark):
        """Byte-identical counts and redacted strings across engines —
        the property the driver-gate hash depends on."""
        s = _spark_rows(spark)
        d = _duck_rows()
        for i in range(len(CASES)):
            for k in ("n_urls", "n_emails", "n_ipv4", "n_phones",
                      "pii_redacted"):
                assert s[i][k] == d[i][k], f"case {i} col {k}"

    def test_input_columns_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, "x", "mail a@b.cc")], "doc_id long, extra string, text string"
        )
        row = P.with_pii(df).collect()[0]
        assert row["extra"] == "x" and row["text"] == "mail a@b.cc"
        assert row["n_emails"] == 1 and row["n_pii"] == 1

    def test_plan_is_pure_codegen(self, spark):
        """No Python stage, no shuffle: per-row regex in codegen."""
        df = spark.createDataFrame([(1, "a@b.cc")], "doc_id long, text string")
        plan = (
            P.with_pii(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan
        assert "Exchange" not in plan
