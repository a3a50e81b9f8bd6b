"""End-to-end curation plan: each stage drops exactly the planted
violators, the report accounts every document, and the stage-A rule pass
stays a single zero-shuffle scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import dedup as D
from index_search_monorepo_spark.plans import curation as CP

GOOD = (
    "the quick brown fox jumps over and over to reach the lazy dog "
    "that waited with patience of a saint and would not have moved. "
    + "good word " * 30
    + "the tale ends well and that is that so it does.\n"
    "A second proper sentence lands here.\n"
    "And a third one closes the page."
)


def _corpus(spark):
    rows = [
        # 0-3 clean keepers (unique tails)
        *[(i, GOOD + f"\nUnique closing line number {i}.",
           f"https://ok{i}.example.org/a") for i in range(4)],
        # 4: blocked domain
        (4, GOOD + "\nUnique closing line number 4.",
         "https://ads.blocked.com/x"),
        # 5: C4 violation (brace)
        (5, GOOD + "\ncode { brace", "https://ok5.example.org/a"),
        # 6: Gopher violation (no alpha words, too short)
        (6, "111 222 333.", "https://ok6.example.org/a"),
        # 7: exact duplicate of doc 0 (after rules/line stages)
        (7, GOOD + "\nUnique closing line number 0.",
         "https://ok7.example.org/a"),
        # 8: decontamination hit appended to clean text
        (8, GOOD + "\nUnique closing line number 8. "
            "alpha beta gamma delta epsilon zeta eta theta",
         "https://ok8.example.org/a"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "url"])


class TestCurationPlan:
    def test_stage_attrition(self, spark):
        eval_set = spark.createDataFrame(
            [(0, "alpha beta gamma delta epsilon zeta eta theta")],
            ["doc_id", "text"],
        )
        registry: list = []
        kept, rep = CP.curate_corpus(
            _corpus(spark),
            url_col="url",
            blocked_domains=["blocked.com"],
            strip_lines_min_docs=6,
            eval_set=eval_set,
            report=True,
            registry=registry,
        )
        stages = {r["stage"]: r for r in rep.collect()}
        kept_ids = sorted(r["doc_id"] for r in kept.collect())
        D.release_caches(registry)
        # rules: drops 4 (url), 5 (c4 brace), 6 (gopher) -> 9 - 3 = 6
        assert (stages["rules"]["docs_in"], stages["rules"]["docs_out"]) == (9, 6)
        # line strip: GOOD body lines appear in >= 6 docs -> stripped;
        # unique closing lines survive; no docs dropped
        assert stages["line_strip"]["docs_dropped"] == 0
        # exact dedup: doc 7 == doc 0 after stripping -> 1 dropped
        assert stages["exact_dedup"]["docs_dropped"] == 1
        # decontamination: doc 8 shares the planted 8-gram -> dropped
        assert stages["decontaminate"]["docs_dropped"] == 1
        assert kept_ids == [0, 1, 2, 3]

    def test_kept_schema_and_cleaned_text(self, spark):
        kept, _ = CP.curate_corpus(
            _corpus(spark),
            url_col="url",
            blocked_domains=["blocked.com"],
            strip_lines_min_docs=6,
        )
        assert set(["doc_id", "text", "url", "n_lines_dropped"]) == set(
            kept.columns
        )
        texts = {r["doc_id"]: r["text"] for r in kept.collect()}
        # the shared GOOD lines were stripped in place; the unique line kept
        assert texts[1].strip() == "Unique closing line number 1."

    def test_rule_stage_single_scan_no_shuffle(self, spark):
        flagged = CP.rule_flags(
            _corpus(spark),
            url_col="url",
            blocked_domains=["blocked.com"],
        )
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_no_optional_stages(self, spark):
        kept, rep = CP.curate_corpus(_corpus(spark), report=True)
        stages = [r["stage"] for r in rep.collect()]
        assert stages == ["rules", "exact_dedup"]
        assert kept.count() > 0

    def test_enforce_subset(self, spark):
        """OCR-style corpora fail the prose heuristics; enforce= keeps
        the flags but relaxes the verdict."""
        docs = spark.createDataFrame(
            [(i, f"scanned page tokens only {i}") for i in range(6)],
            ["doc_id", "text"],
        )
        strict, _ = CP.curate_corpus(docs)
        relaxed, _ = CP.curate_corpus(docs, enforce=())
        assert strict.count() == 0
        assert relaxed.count() == 6
        flagged = CP.rule_flags(docs, enforce=())
        assert {c for c in ("c4_keep", "g_keep", "rule_keep")} <= set(
            flagged.columns
        )

    def test_passage_stage(self, spark):
        """passage_k excises cross-document duplicated word runs before
        exact dedup, surfacing new exact duplicates downstream: docs 2/3
        share NO flagged run with each other (different passages, each
        shared with a different partner), but their residues after
        excision are identical — the exact-dedup stage must fold them,
        proving the excised text (not the original) feeds the content
        key."""
        shared_a = " ".join(f"a{i}" for i in range(6))
        shared_b = " ".join(f"b{i}" for i in range(6))
        docs = spark.createDataFrame(
            [
                (0, f"head0 {shared_a} tail0"),
                (1, f"head1 {shared_b} tail1"),
                # residue ('residue words here', 3 words < k) carries no
                # flagged grams of its own
                (2, f"{shared_a} residue words here"),
                (3, f"{shared_b} residue words here"),
                (4, "wholly unrelated document body"),
            ],
            ["doc_id", "text"],
        )
        kept, rep = CP.curate_corpus(
            docs, enforce=(), passage_k=5, report=True
        )
        stages = {r["stage"]: r for r in rep.collect()}
        texts = {r["doc_id"]: r["text"] for r in kept.collect()}
        assert stages["passage_excise"]["docs_dropped"] == 0
        assert texts[0] == "head0 tail0"
        assert texts[1] == "head1 tail1"
        # docs 2 and 3 both excised to the same residue -> exact dedup
        # keeps the smaller doc_id only
        assert stages["exact_dedup"]["docs_dropped"] == 1
        assert texts[2] == "residue words here"
        assert 3 not in texts
        assert texts[4] == "wholly unrelated document body"


class TestEncodingFix:
    def test_fix_encoding_repairs_and_normalizes(self, spark):
        rows = [
            (0, "cafÃ©"),   # mojibake 'cafÃ©'
            (1, "café"),         # NFC-decomposed e + combining acute
            (2, "café"),          # already clean precomposed
            (3, "plain ascii"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r["doc_id"]: r for r in CP.fix_encoding(df).collect()}
        assert all(out[i]["text"] == "café" for i in range(3))
        assert [out[i]["enc_fixed"] for i in range(4)] == [1, 1, 0, 0]
        assert set(out[0].asDict()) == {"doc_id", "text", "enc_fixed"}

    def test_zero_shuffle_two_arrow_stages(self, spark):
        df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
        plan = (
            CP.fix_encoding(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert plan.count("ArrowEvalPython") == 2, plan

    def test_stage0_collapses_variant_spellings(self, spark):
        """Three spellings of the same page (clean precomposed, mojibake,
        NFC-decomposed) must be ONE exact-dedup key with encoding_fix=True
        and three without — the reason stage 0 precedes every hash."""
        tail = "\nThe café closes the page now."
        rows = [
            (0, GOOD + tail),
            (1, GOOD + tail.replace("café", "cafÃ©")),
            (2, GOOD + tail.replace("café", "café")),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        kept, rep = CP.curate_corpus(df, encoding_fix=True, report=True)
        stages = {r["stage"]: r for r in rep.collect()}
        assert stages["encoding_fix"]["docs_dropped"] == 0
        assert stages["exact_dedup"]["docs_dropped"] == 2
        assert [r["doc_id"] for r in kept.collect()] == [0]

        kept_off, _ = CP.curate_corpus(df)
        assert kept_off.count() == 3
