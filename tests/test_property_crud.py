"""Property-based check of the write path (SURVEY §2.2, ops 19-21).

Hypothesis generates an initial corpus plus a random sequence of
upsert / update / delete operations; each sequence is applied both to
the engine (parquet rewrite protocol) and to a plain Python dict model
of insert-or-replace semantics. Final states must agree exactly —
the set model is the reference behavior (reference
tests/test_documents/test_documents_api.py round-trips, generalized)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aiotcvectordb_spark.catalog import IndexField

TAGS = ["a", "b", "c"]
_counter = itertools.count()


doc_st = st.tuples(
    st.integers(min_value=0, max_value=9),  # id
    st.sampled_from(TAGS),
    st.integers(min_value=0, max_value=50),  # page
)

docs_st = st.lists(doc_st, min_size=1, max_size=8)


def pred_st():
    return st.one_of(
        st.sampled_from(TAGS).map(lambda v: ("tag_eq", v)),
        st.integers(min_value=0, max_value=50).map(lambda v: ("page_lt", v)),
    )


op_st = st.one_of(
    docs_st.map(lambda d: ("upsert", d)),
    st.tuples(pred_st(), st.integers(min_value=0, max_value=99)).map(
        lambda t: ("update", *t)
    ),
    pred_st().map(lambda p: ("delete", p)),
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=3).map(
        lambda ids: ("delete_ids", ids)
    ),
)


def _to_doc(t):
    i, tag, page = t
    return {"id": f"d{i}", "vector": [0.1 * i, 0.2, 0.3], "tag": tag, "page": page}


def _sql(pred) -> str:
    kind, v = pred
    return f"tag = '{v}'" if kind == "tag_eq" else f"page < {v}"


def _matches(doc, pred) -> bool:
    kind, v = pred
    return doc["tag"] == v if kind == "tag_eq" else doc["page"] < v


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(init=docs_st, ops=st.lists(op_st, min_size=1, max_size=4))
def test_crud_sequences_match_set_model(engine, init, ops):
    coll = f"prop{next(_counter)}"
    if not engine.catalog.database_exists("pdb"):
        engine.create_database("pdb")
    engine.create_collection(
        "pdb",
        coll,
        indexes=[
            IndexField(name="id", kind="primary_key", field_type="string"),
            IndexField(
                name="vector", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="FLAT", dimension=3,
            ),
            IndexField(name="tag", kind="filter", field_type="string"),
            IndexField(name="page", kind="filter", field_type="uint64"),
        ],
    )
    model: dict[str, dict] = {}

    def model_upsert(docs):
        for d in docs:
            model[d["id"]] = dict(d)

    model_upsert([_to_doc(t) for t in init])
    engine.upsert("pdb", coll, [_to_doc(t) for t in init])

    for op in ops:
        if op[0] == "upsert":
            docs = [_to_doc(t) for t in op[1]]
            engine.upsert("pdb", coll, docs)
            model_upsert(docs)
        elif op[0] == "update":
            _, pred, new_page = op
            engine.update("pdb", coll, filter=_sql(pred), values={"page": new_page})
            for d in model.values():
                if _matches(d, pred):
                    d["page"] = new_page
        elif op[0] == "delete":
            engine.delete("pdb", coll, filter=_sql(op[1]))
            for k in [k for k, d in model.items() if _matches(d, op[1])]:
                del model[k]
        else:  # delete_ids
            ids = [f"d{i}" for i in op[1]]
            engine.delete("pdb", coll, document_ids=ids)
            for k in ids:
                model.pop(k, None)

    rows = engine.query("pdb", coll, output_fields=["tag", "page"], limit=1000)
    got = {r["id"]: (r["tag"], r["page"]) for r in rows}
    want = {k: (d["tag"], d["page"]) for k, d in model.items()}
    assert got == want
    engine.drop_collection("pdb", coll)
