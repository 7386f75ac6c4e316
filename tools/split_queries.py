"""One-time r12 refactor: split queries.py into family modules.

Mechanical, order-preserving split (r11 verdict item #8): the 11.5k-line
``queries.py`` becomes ``qfam/`` family modules re-exported (star-import
with generated ``__all__``, so underscore helpers keep their import
paths) through the same ``queries.py`` registry — the driver contract,
``rotate_registry``'s QUERIES-block regex, and every external
``Q.<name>`` reference are untouched.

Usage: python tools/split_queries.py   (writes qfam/* and queries.py)
"""

from __future__ import annotations

import ast
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QPATH = os.path.join(ROOT, "aiotcvectordb_spark", "queries.py")
PKG = os.path.join(ROOT, "aiotcvectordb_spark", "qfam")

# (module, first_line, last_line) — 1-based inclusive, section-comment
# boundaries of the current file. The registry tail (REG_START..EOF)
# stays in queries.py.
RANGES = [
    ("core", 1, 164),
    ("vector", 165, 1074),
    ("textdedup", 1075, 2977),
    ("relational", 2978, 3702),
    ("extracts", 3703, 5131),
    ("tpch", 5132, 6113),
    ("curation", 6114, 8350),
    ("analytics_media", 8351, 11042),
]
REG_START = 11043

DOCS = {
    "core": "Shared query-registry core: imports, load()/cache, constants.",
    "vector": "SURVEY §2.2-2.5: vector search, filtered reads, writes, "
              "full-text/sparse/hybrid.",
    "textdedup": "North-star text dedup: exact/minhash/simhash/jaccard, "
                 "components, semantic dedup, token counting, chunking.",
    "relational": "SURVEY §2.7 relational primitives, windowed event "
                  "aggregation, multimodal binary columns.",
    "extracts": "Document-format parser round trips (pdf/doc/ppt/xls/"
                "docx/pptx/xlsx/rtf/epub) and frozen-twin ANN lanes.",
    "tpch": "SURVEY §2.7 relational breadth: TPC-H-shaped joins/aggs, "
            "grouping sets, pivot/unpivot, subqueries.",
    "curation": "North-star training-data curation: clean/split/sample, "
                "decontamination, novelty, substring dedup, mixing.",
    "analytics_media": "Embedding-space extras, audio/video codec lanes, "
                       "quality filters, LM scoring, packing/shards/EWMA.",
}


def defined_names(body: list[ast.stmt]) -> list[str]:
    out: list[str] = []
    for node in body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            out.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    out.append(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            out.append(node.target.id)
    seen: set[str] = set()
    uniq = []
    for n in out:
        if n not in seen:
            seen.add(n)
            uniq.append(n)
    return uniq


def imported_names(body: list[ast.stmt]) -> list[str]:
    out = []
    for node in body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                out.append((a.asname or a.name).split(".")[0])
    return out


def used_names(src: str) -> set[str]:
    return {
        n.id
        for n in ast.walk(ast.parse(src))
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
    }


def main() -> int:
    lines = open(QPATH).read().splitlines(keepends=True)
    slices = {
        name: "".join(lines[a - 1 : b]) for name, a, b in RANGES
    }
    registry_tail = "".join(lines[REG_START - 1 :])

    # relocate _INCR_SPLIT (analytics_media -> core): it is referenced
    # from textdedup function bodies, the only backward module edge a
    # constant can close.
    moved = [
        ln for ln in slices["analytics_media"].splitlines(keepends=True)
        if ln.startswith("_INCR_SPLIT = ")
    ]
    assert len(moved) == 1, moved
    slices["analytics_media"] = slices["analytics_media"].replace(
        moved[0],
        "# (_INCR_SPLIT moved to qfam.core — shared with textdedup)\n",
    )
    slices["core"] = slices["core"].replace(
        "ROUND_DIGITS = 6\nDIM = 64\n",
        "ROUND_DIGITS = 6\nDIM = 64\n" + moved[0],
    )

    order = [r[0] for r in RANGES]
    mod_defs: dict[str, list[str]] = {}
    mod_src: dict[str, str] = {}
    provider: dict[str, str] = {}
    import builtins

    for name in order:
        body = ast.parse(slices[name]).body
        mod_defs[name] = defined_names(body)
        if name == "core":
            mod_defs[name] = imported_names(body) + mod_defs[name]
        for n in mod_defs[name]:
            if n in provider and provider[n] != name:
                print(f"WARN duplicate top-level name {n}: "
                      f"{provider[n]} and {name}")
            provider.setdefault(n, name)

    known_later: dict[str, list[str]] = {}
    for idx, name in enumerate(order):
        used = used_names(slices[name])
        own = set(mod_defs[name]) | set(
            imported_names(ast.parse(slices[name]).body)
        )
        needed = {
            n for n in used
            if n not in own and not hasattr(builtins, n) and n in provider
        }
        earlier = order[:idx]
        header = [
            '"""' + DOCS[name] + "\n\nSplit out of queries.py in r12 "
            "(mechanical, order-preserving); see queries.py for the "
            'registry."""\n',
            "\n",
        ]
        if name != "core":
            header.append(
                "from aiotcvectordb_spark.qfam.core import *  "
                "# noqa: F401,F403\n"
            )
        dep_imports: dict[str, list[str]] = {}
        later_refs = []
        for n in sorted(needed):
            p = provider[n]
            if p == name:
                continue
            if p == "core":
                continue  # the star import covers core
            if p in earlier:
                dep_imports.setdefault(p, []).append(n)
            else:
                later_refs.append((n, p))
        for p in order:
            if p in dep_imports:
                names = ", ".join(sorted(dep_imports[p]))
                header.append(
                    f"from aiotcvectordb_spark.qfam.{p} import "
                    f"{names}  # noqa: F401\n"
                )
        if later_refs:
            known_later[name] = later_refs
        header.append("\n")
        all_lines = ",\n    ".join(f'"{n}"' for n in mod_defs[name])
        footer = (
            "\n\n# auto-generated by tools/split_queries.py: star-import"
            "\n# re-export surface (underscore helpers included — tests"
            "\n# and the registry address them as queries.<name>)"
            f"\n__all__ = [\n    {all_lines},\n]\n"
        )
        src = "".join(header) + slices[name] + footer
        if name == "core":
            # core keeps its own imports; drop the generated docstring
            # (the original module docstring is inside the slice).
            src = slices[name].replace(
                '"""Driver-facing query registry: Spark implementation '
                "+ DuckDB oracle SQL.",
                '"""Shared query-registry core (r12 split): imports, '
                "load()/cache, constants.",
                1,
            ) + footer
        mod_src[name] = src

    for m, refs in known_later.items():
        print(f"NOTE {m} references later modules (fix with local "
              f"imports): {refs}")

    os.makedirs(PKG, exist_ok=True)
    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write(
            '"""Query-registry family modules (r12 split of queries.py).'
            '"""\n'
        )
    for name in order:
        with open(os.path.join(PKG, name + ".py"), "w") as f:
            f.write(mod_src[name])

    stars = "".join(
        f"from aiotcvectordb_spark.qfam.{n} import *  # noqa: F401,F403\n"
        for n in order
    )
    new_queries = (
        '"""Driver-facing query registry: Spark implementation + DuckDB '
        "oracle SQL.\n\nEvery entry corresponds to an operator from "
        "SURVEY.md §2 (or a\nnorth-star LLM-pipeline extension). Each "
        "Spark callable takes\n``(spark, sf_dir)`` and returns a "
        "DataFrame whose columns/aliases match\nthe oracle SQL exactly; "
        "the driver hash-compares them at sf0.01.\n\nr12: the query "
        "implementations live in ``qfam/`` family modules\n(core / "
        "vector / textdedup / relational / extracts / tpch / curation\n"
        "/ analytics_media), star-re-exported here through generated "
        "``__all__``\nlists so every existing ``queries.<name>`` "
        "reference — including the\nunderscore helpers the tests pin — "
        "keeps working and the QUERIES/ORACLES\nregistry (and "
        "``tools/rotate_registry.py``'s block rewrite) is unchanged.\n"
        '"""\n\nfrom __future__ import annotations\n\n'
        + stars
        + "\n"
        + registry_tail
    )
    with open(QPATH, "w") as f:
        f.write(new_queries)
    print("wrote", PKG, "and", QPATH)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
