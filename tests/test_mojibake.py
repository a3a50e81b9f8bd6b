"""Mojibake repair (functions/mojibake.py): hand-pinned repair battery,
the no-false-repair negatives, a hypothesis round-trip property, the
single-ArrowEvalPython plan pin, None safety, and the collision guard."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from index_search_monorepo_spark.functions import mojibake as MJ

# (input, expected_text, expected_passes) — every expected value is
# hand-derived from the byte tables, never from the implementation:
#   'café'  -> UTF-8 C3 A9       -> cp1252 'Ã©'   (one encoding layer)
#   'é'x2   -> C3 83 C2 A9       -> cp1252 'ÃƒÂ©' (two layers)
#   '€'     -> E2 82 AC          -> cp1252 'â‚¬'  (cp1252-only chars)
#   '’'     -> E2 80 99          -> cp1252 'â€™'  (0x80 euro + 0x99 TM)
#   'ā'     -> C4 81             -> sloppy 'Ä\x81' (cp1252 gap byte 0x81)
#   '大'    -> E5 A4 A7          -> cp1252 'å¤§'  (CJK through latin range)
PINNED = [
    ("", "", 0),
    ("ascii only", "ascii only", 0),
    ("cafÃ©", "café", 1),
    ("ÃƒÂ©", "é", 2),
    ("â‚¬10", "€10", 1),
    ("â€™", "’", 1),
    ("Ä\x81", "ā", 1),
    ("å¤§", "大", 1),
    ("The cafÃ© â€” done", "The café — done", 1),
    # negatives: genuine Latin text whose byte image is NOT valid UTF-8
    ("naïve", "naïve", 0),
    ("Åse", "Åse", 0),
    ("Grüße an Òscar", "Grüße an Òscar", 0),
    # negative: no single-byte pre-image at all
    ("文A", "文A", 0),
    ("emoji 🎉", "emoji 🎉", 0),
]


def test_pinned_battery():
    for raw, exp_text, exp_passes in PINNED:
        assert MJ.repair_text(raw) == (exp_text, exp_passes), raw


def test_max_passes_bounds_unwinding():
    triple = "é"
    for _ in range(3):
        triple = "".join(
            chr(b) if b in {0x81, 0x8D, 0x8F, 0x90, 0x9D}
            else bytes([b]).decode("cp1252")
            for b in triple.encode("utf-8")
        )
    text1, n1 = MJ.repair_text(triple, max_passes=1)
    assert n1 == 1 and text1 != "é"
    text3, n3 = MJ.repair_text(triple, max_passes=3)
    assert (text3, n3) == ("é", 3)


def _mojibakify(s: str) -> str:
    """One sloppy-cp1252 mis-decode of s's UTF-8 bytes (gap bytes read
    latin-1 style, as lenient decoders do)."""
    return "".join(
        chr(b) if b in {0x81, 0x8D, 0x8F, 0x90, 0x9D}
        else bytes([b]).decode("cp1252")
        for b in s.encode("utf-8")
    )


@settings(max_examples=30, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0x2FFF, exclude_categories=["Cs"]
        ),
        min_size=1,
        max_size=24,
    )
)
def test_single_layer_roundtrip(s):
    """Any string pushed through ONE mis-decode layer is recovered
    exactly by one repair pass (max_passes=1 isolates the layer: the
    original may itself look repairable, which is the documented
    double-encoding continuation, not a failure)."""
    moji = _mojibakify(s)
    if moji == s:  # pure ASCII: nothing to repair
        assert MJ.repair_text(s) == (s, 0)
        return
    assert MJ.repair_text(moji, max_passes=1) == (s, 1)


def test_with_mojibake_columns(spark):
    rows = [(i, raw) for i, (raw, _t, _p) in enumerate(PINNED)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in MJ.with_mojibake(df).collect()}
    for i, (_raw, exp_text, exp_passes) in enumerate(PINNED):
        assert out[i]["fix_text"] == exp_text
        assert out[i]["fix_passes"] == exp_passes


def test_none_safe(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = MJ.with_mojibake(df).collect()[0]
    assert r["fix_text"] is None and r["fix_passes"] is None


def test_single_arrow_stage(spark):
    """Both derived columns must share ONE kernel evaluation (CLAUDE.md
    lessons #1/#9: bound struct + nondeterministic marking)."""
    df = spark.createDataFrame([(1, "cafÃ©")], "doc_id long, text string")
    plan = (
        MJ.with_mojibake(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


def test_collision_guard(spark):
    df = spark.createDataFrame(
        [(1, "x", "y")], "doc_id long, text string, fix_text string"
    )
    with pytest.raises(ValueError, match="fix_text"):
        MJ.with_mojibake(df)


def test_gate_spikes_match_hardcoded_expectations():
    """The quality_score gate plants MOJI_SPIKES and asserts the
    hardcoded MOJI_EXPECTED literals — pin here that the kernel maps
    each spike to exactly those literals, so the contract constants are
    independently grounded."""
    from index_search_monorepo_spark import contract as C

    for raw, (exp_text, exp_passes) in zip(C.MOJI_SPIKES, C.MOJI_EXPECTED):
        assert MJ.repair_text(raw) == (exp_text, exp_passes), raw
