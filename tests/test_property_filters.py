"""Property-based check of the filter predicate language (SURVEY §2.4).

The engine's claim is that the reference's filter strings are a subset
of Spark SQL boolean expressions, so `df.filter(cond)` implements them
exactly. Hypothesis generates random documents AND random predicate
trees (comparisons, IN lists, AND/OR/NOT) and cross-checks Spark's
row selection against a direct Python evaluation of the same tree.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TAGS = ["a", "b", "c", "d"]


docs_st = st.lists(
    st.tuples(
        st.sampled_from(TAGS),  # tag
        st.integers(min_value=0, max_value=20),  # page
    ),
    min_size=1,
    max_size=30,
)


def leaf_st():
    comparisons = st.tuples(
        st.sampled_from(["=", "!=", "<", "<=", ">", ">="]),
        st.integers(min_value=0, max_value=20),
    ).map(lambda t: ("cmp_page", *t))
    tag_eq = st.sampled_from(TAGS).map(lambda v: ("cmp_tag", "=", v))
    in_list = st.lists(
        st.sampled_from(TAGS), min_size=1, max_size=3, unique=True
    ).map(lambda vs: ("in_tag", vs))
    page_in = st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=4, unique=True
    ).map(lambda vs: ("in_page", vs))
    return st.one_of(comparisons, tag_eq, in_list, page_in)


pred_st = st.recursive(
    leaf_st(),
    lambda children: st.one_of(
        st.tuples(st.just("and"), children, children),
        st.tuples(st.just("or"), children, children),
        st.tuples(st.just("not"), children),
    ),
    max_leaves=4,
)


def to_sql(p) -> str:
    kind = p[0]
    if kind == "cmp_page":
        _, op, v = p
        return f"(page {op} {v})"
    if kind == "cmp_tag":
        _, op, v = p
        return f"(tag {op} '{v}')"
    if kind == "in_tag":
        vals = ", ".join(f"'{v}'" for v in p[1])
        return f"(tag IN ({vals}))"
    if kind == "in_page":
        vals = ", ".join(str(v) for v in p[1])
        return f"(page IN ({vals}))"
    if kind == "and":
        return f"({to_sql(p[1])} AND {to_sql(p[2])})"
    if kind == "or":
        return f"({to_sql(p[1])} OR {to_sql(p[2])})"
    if kind == "not":
        return f"(NOT {to_sql(p[1])})"
    raise AssertionError(kind)


def evaluate(p, tag: str, page: int) -> bool:
    kind = p[0]
    if kind == "cmp_page":
        _, op, v = p
        return {
            "=": page == v, "!=": page != v, "<": page < v,
            "<=": page <= v, ">": page > v, ">=": page >= v,
        }[op]
    if kind == "cmp_tag":
        return tag == p[2]
    if kind == "in_tag":
        return tag in p[1]
    if kind == "in_page":
        return page in p[1]
    if kind == "and":
        return evaluate(p[1], tag, page) and evaluate(p[2], tag, page)
    if kind == "or":
        return evaluate(p[1], tag, page) or evaluate(p[2], tag, page)
    if kind == "not":
        return not evaluate(p[1], tag, page)
    raise AssertionError(kind)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_st, pred=pred_st)
def test_filter_language_matches_python_eval(_spark, docs, pred):
    rows = [(str(i), tag, page) for i, (tag, page) in enumerate(docs)]
    df = _spark.createDataFrame(rows, "id string, tag string, page long")
    cond = to_sql(pred)
    got = {r.id for r in df.filter(cond).collect()}
    want = {i for i, tag, page in rows if evaluate(pred, tag, page)}
    assert got == want, cond


# ---------------------------------------------------------------------------
# Array-membership operators (include / exclude / include all) — the
# non-SQL part of the reference grammar, via the Filter helpers.
# ---------------------------------------------------------------------------


def test_filter_helpers_build_reference_strings():
    from aiotcvectordb_spark.functions.filters import Filter

    assert Filter.In("tag", ["a", "b"]) == 'tag in ("a", "b")'
    assert Filter.Include("tags", ["a"]) == 'tags include ("a")'
    assert Filter.IncludeAll("tags", ["a", "b"]) == 'tags include all ("a", "b")'
    f = Filter(Filter.In("tag", ["a"])).And("page > 3")
    assert f.cond == '(tag in ("a")) and (page > 3)'


def test_array_filter_translation_semantics(_spark):
    from aiotcvectordb_spark.functions.filters import Filter, translate

    rows = [
        ("d1", ["a", "b"]),
        ("d2", ["b", "c"]),
        ("d3", ["c"]),
        ("d4", []),
    ]
    df = _spark.createDataFrame(rows, "id string, tags array<string>")

    def ids(cond):
        return {r.id for r in df.filter(translate(cond)).collect()}

    assert ids(Filter.Include("tags", ["a", "c"])) == {"d1", "d2", "d3"}
    assert ids(Filter.Exclude("tags", ["a", "c"])) == {"d4"}
    assert ids(Filter.IncludeAll("tags", ["b", "c"])) == {"d2"}
    # composes with plain SQL connectives
    combo = Filter(Filter.Include("tags", ["b"])).AndNot("id = 'd2'").cond
    assert ids(combo) == {"d1"}
    # plain SQL passes through untouched
    assert translate("page > 3 and tag = 'x'") == "page > 3 and tag = 'x'"


def test_engine_array_filters_end_to_end(_spark, tmp_path):
    from aiotcvectordb_spark.catalog import IndexField
    from aiotcvectordb_spark.engine import VectorDBEngine
    from aiotcvectordb_spark.functions.filters import Filter

    eng = VectorDBEngine(_spark, str(tmp_path / "store"))
    eng.create_database("d")
    eng.create_collection(
        "d", "c",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(name="tags", kind="filter", field_type="array"),
        ],
    )
    eng.store.write(
        _spark.createDataFrame(
            [("x", ["red", "blue"]), ("y", ["blue"]), ("z", ["green"])],
            "id string, tags array<string>",
        ),
        "d", "c",
    )
    got = {r["id"] for r in eng.query("d", "c", filter=Filter.Include("tags", ["blue"]))}
    assert got == {"x", "y"}
    assert eng.count("d", "c", filter=Filter.IncludeAll("tags", ["red", "blue"])) == 1
    out = eng.delete("d", "c", filter=Filter.Exclude("tags", ["red", "blue"]))
    assert out["affectedCount"] == 1
    assert eng.count("d", "c") == 2


def test_search_paths_translate_array_filters(_spark, tmp_path):
    from aiotcvectordb_spark.catalog import IndexField
    from aiotcvectordb_spark.engine import VectorDBEngine
    from aiotcvectordb_spark.functions.filters import Filter

    eng = VectorDBEngine(_spark, str(tmp_path / "store"))
    eng.create_database("d")
    eng.create_collection(
        "d", "c",
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=2,
            ),
            IndexField(name="tags", kind="filter", field_type="array"),
        ],
    )
    eng.store.write(
        _spark.createDataFrame(
            [("x", [1.0, 0.0], ["red"]), ("y", [0.9, 0.1], ["blue"])],
            "id string, vector array<float>, tags array<string>",
        ),
        "d", "c",
    )
    hits = eng.search(
        "d", "c", [[1.0, 0.0]], limit=5, filter=Filter.Include("tags", ["blue"])
    )
    assert [h["id"] for h in hits[0]] == ["y"]
