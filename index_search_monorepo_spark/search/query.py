"""Query construction (SURVEY.md §2.7 F12/F13, §3.2) — the ht_search
query-shaping surface, driver-side Python (not data-plane).

Golden-parity with the reference's own tests
(libs/ht_search/tests/ht_query_tests/ht_query_test.py:22-105):
boost strings 'field^boost', quoted-string and integer filter strings,
exact-phrase quoting, facet param dict. The builders here produce both the
Solr-style strings (API parity) and the structured SearchQuery consumed by
search.engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# P6 public-domain rights codes (ht_query.py:218-221)
RIGHTS_PUBLIC_DOMAIN = [25, 15, 18, 1, 21, 23, 19, 13, 11, 20, 7, 10, 24, 14, 17, 22, 12]

# config_query.yaml 'all' profile (qf/pf boosts), restricted to fields our
# extraction emits (§1.3); boosts preserved from the YAML
QF_ALL: list[tuple[str, float]] = [
    ("allfields", 1),
    ("title", 10),
    ("title_top", 5),
    ("title_rest", 2),
    ("author", 80),
    ("author2", 50),
    ("author_top", 30),
    ("oclc", 1),
    ("sdrnum", 1),
]
PF_ALL: list[tuple[str, float]] = [
    ("title_ab", 10000),
    ("title_a", 8000),
    ("author", 1600),
    ("author2", 800),
    ("author_top", 100),
]
QF_OCRONLY: list[tuple[str, float]] = [("ocr", 500000)]

# config_facet_filters.yaml 'all' profile
FACET_FIELDS = [
    "topicStr",
    "authorStr",
    "language008_full",
    "countryOfPubStr",
    "bothPublishDateRange",
    "format",
    "htsource",
    "callnoletters",
]
FACET_MINCOUNT = 1
FACET_LIMIT = 30


def boost_query_fields(query_fields: list) -> list[str]:
    """F12 (ht_query.py:67-73): [field, boost] -> 'field^boost'."""
    return ["^".join(map(str, f)) for f in query_fields]


def boost_phrase_fields(query_fields: list) -> str:
    """F12 (ht_query.py:75-81): space-joined boost strings."""
    return " ".join(boost_query_fields(query_fields))


def query_filter_creator_string(filter_name: str, filter_value) -> str:
    """P7 quoted-string filter (ht_query.py:87-99):
    id:("a" OR "b" OR "c")."""
    s = (
        '" OR "'.join(map(str, filter_value))
        if isinstance(filter_value, list)
        else filter_value
    )
    return f'{filter_name}:("{s}")'


def query_filter_creator_rights(filter_name: str, filter_value) -> str:
    """P6 integer filter (ht_query.py:101-111): rights:(25 OR 15 ...)."""
    s = (
        " OR ".join(map(str, filter_value))
        if isinstance(filter_value, list)
        else filter_value
    )
    return f"{filter_name}:({s})"


def exact_phrase_query(q_string: str) -> str:
    """F13 (ht_query.py:113-115)."""
    return '"'.join(("", q_string, ""))


def manage_string_query(input_phrase: str, operator: str | None = None) -> dict:
    """F13 (ht_query.py:119-136): None -> exact phrase; AND/OR -> tokens
    joined by the operator with q.op set."""
    if operator is None:
        return {"q": exact_phrase_query(input_phrase)}
    phrase = f" {operator} ".join(input_phrase.split())
    return {"q": phrase, "q.op": operator}


def facet_params() -> dict:
    """A6 facet dict (config_facet_filters.yaml via facet_creator)."""
    return {
        "facet.mincount": FACET_MINCOUNT,
        "facet": "on",
        "facet.limit": FACET_LIMIT,
        "facet.field": list(FACET_FIELDS),
    }


@dataclass
class SearchQuery:
    """Structured query consumed by search.engine — the engine-internal IR
    that make_solr_query's params dict (ht_query.py:157-222) becomes."""

    q: str | None = None  # None -> match-all
    operator: str | None = None  # None=exact phrase, 'AND', 'OR'
    qf: list[tuple[str, float]] = field(default_factory=lambda: list(QF_ALL))
    pf: list[tuple[str, float]] = field(default_factory=lambda: list(PF_ALL))
    tie: float = 0.5  # dismax tie breaker
    fl: list[str] | None = None  # P5 output projection
    rights: list[int] | None = None  # P6; None = no rights filter
    id_filter: list[str] | None = None  # P7
    start: int = 0  # W2 pagination
    rows: int = 100

    def terms(self) -> list[str]:
        return [t for t in (self.q or "").lower().split() if t]

    def params(self, fl: list[str] | None = None) -> dict:
        """Solr-style params dict for API parity (create_params_dict,
        ht_query.py:163-181)."""
        p = {
            "defType": "edismax",
            "start": self.start,
            "rows": self.rows,
            "fl": fl or self.fl or [],
            "indent": "on",
            "mm": "100%",
            "tie": self.tie,
            "qf": boost_phrase_fields([list(x) for x in self.qf]),
            "pf": boost_phrase_fields([list(x) for x in self.pf]),
        }
        if not self.q:
            p["q"] = "*:*"
        else:
            p.update(manage_string_query(self.q, self.operator))
        if self.id_filter:
            p["fq"] = query_filter_creator_string("id", self.id_filter)
        elif self.rights:
            p["fq"] = query_filter_creator_rights("rights", self.rights)
        return p
