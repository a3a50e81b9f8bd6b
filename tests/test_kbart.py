"""KBART export family (kbart_file_generator.py rebuilt as joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.kbart import (
    KBART_COLUMNS,
    generate_kbart,
    ordered_dedup_ids,
    strip_zeros_expr,
)


def _holdings(spark):
    # dup of 000123456, a blank, and order 123456 -> 99 -> 7777 -> missing
    rows = [("000123456",), ("  ",), ("000000099",), ("123456",),
            ("7777",), ("55555",)]
    return spark.createDataFrame(rows, ["catalog_id"])


def _catalog_meta(spark):
    rows = [
        (["000123456"], ["A Serial Title"], [], ["1234-5678"],
         ["Doe, Jane"], ["Pub A"], ["11111"]),
        (["99"], ["A Monograph"], ["978-3-16-148410-0", ""], [],
         ["Poe, Edgar"], ["Pub B"], ["22222"]),
        (["7777"], [""], [], [], [], [], []),  # empty title -> error row
    ]
    return spark.createDataFrame(
        rows,
        "id array<string>, title_display array<string>, isbn array<string>,"
        " issn array<string>, mainauthor array<string>,"
        " publisher array<string>, oclc array<string>",
    )


def _hf(spark):
    rows = [
        ("000123456", "SE", "1901"),
        ("000123456", "SE", "1950"),
        ("99", "BK", "1888"),
        ("99", "BK", "9999"),  # 9999 must filter to '' where emitted
    ]
    return spark.createDataFrame(rows, ["bib_num", "bib_fmt", "rights_date_used"])


def test_ordered_dedup_and_normalization(spark):
    ids = ordered_dedup_ids(_holdings(spark)).orderBy("seq").collect()
    # blank dropped; '000123456' and '123456' both kept as input ids (dedup is
    # on the raw id like the reference's setdefault; normalization happens at
    # the join key)
    assert [r["catalog_id"] for r in ids] == [
        "000123456", "000000099", "123456", "7777", "55555",
    ]
    norm = (
        spark.createDataFrame([("000123456",), ("0000",), ("42",)], ["x"])
        .select(strip_zeros_expr(F.col("x")).alias("n"))
        .collect()
    )
    assert [r["n"] for r in norm] == ["123456", "0", "42"]


def test_ordered_dedup_survives_shuffled_input(spark, tmp_path):
    """VERDICT r02 next #6: with a real line ordinal the first-occurrence
    order is shuffle-proof. The same input WITHOUT seq_col (derived
    monotonically_increasing_id) gets re-dealt by the repartition and
    would rank 'b' first — the old path's failure mode."""
    from index_search_monorepo_spark.operators.kbart import read_holdings_tsv

    path = tmp_path / "holdings.tsv"
    # 'a' first at line 1, duplicated later; 'b' second
    path.write_text(
        "catalog_id\toclc\n"
        + "a\t1\n"
        + "".join(f"b{i % 2}\t{i}\n" for i in range(20))
        + "a\t99\n"
    )
    holdings = read_holdings_tsv(spark, str(path))
    assert holdings.columns == ["catalog_id", "oclc", "_line_no"]
    # adversarial shuffle: re-deal rows across partitions in reverse
    shuffled = holdings.orderBy(F.desc("_line_no")).repartition(7)
    got = (
        ordered_dedup_ids(shuffled, seq_col="_line_no")
        .orderBy("seq")
        .collect()
    )
    assert [r["catalog_id"] for r in got] == ["a", "b0", "b1"]
    assert [r["seq"] for r in got] == [1, 2, 3]


def test_generate_kbart_rows_and_errors(spark):
    rows, errors = generate_kbart(_holdings(spark), _catalog_meta(spark), _hf(spark))
    got = {r["title_id"]: r.asDict() for r in rows.collect()}

    # serial: both dates emitted, min/max aggregated
    se = got["123456"]
    assert se["publication_title"] == "A Serial Title"
    assert se["date_first_issue_online"] == "1901"
    assert se["date_last_issue_online"] == "1950"
    assert se["print_identifier"] == "1234-5678"  # issn fallback
    assert se["title_url"] == "https://catalog.hathitrust.org/Record/123456"
    assert se["first author"] == "Doe, Jane"

    # monograph: date_last gated off by bib_fmt != 'SE'; first kept
    bk = got["99"]
    assert bk["date_first_issue_online"] == "1888"
    assert bk["date_last_issue_online"] == ""
    assert bk["print_identifier"] == "978-3-16-148410-0"  # first non-empty isbn

    # the two normalizations of the same record each produce a row (the
    # reference probes per input id), both resolving to the same metadata
    assert sorted(got) == ["123456", "99"]
    n_rows = rows.count()
    assert n_rows == 3  # 000123456 + 123456 (same key, two input ids) + 99

    err = {r["catalog_id"]: r["reason"] for r in errors.collect()}
    assert err == {
        "55555": "metadata not found",
        "7777": "required source fields missing",
    }
    assert set(rows.columns) == set(KBART_COLUMNS) | {"seq"}


def test_kbart_on_synthetic_corpus(spark, tables):
    """Shape compatibility with the generated corpus dims: catalog as
    metadata source, hf as the date source."""
    catalog = tables["catalog"]
    hf = tables["hf"]
    holdings = catalog.select(F.col("id").alias("catalog_id")).limit(50)
    rows, errors = generate_kbart(
        holdings, catalog.select(
            "id", "title_display", "isbn", "issn", "mainauthor",
            "publisher", "oclc",
        ), hf,
    )
    assert rows.count() + errors.count() == holdings.distinct().count()
    assert rows.filter(F.col("title_id") == "").count() == 0
