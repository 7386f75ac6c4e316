"""Filter string helpers + translation of the non-SQL array operators.

The reference's filter language (vendor ``Filter`` class re-exported at
reference aiotcvectordb/model/__init__.py:22-28; SURVEY §2.4) is a SQL
boolean subset PLUS three array-membership operators standard SQL does
not have::

    tags include ("a", "b")        -- any listed value present
    tags exclude ("a", "b")        -- no listed value present
    tags include all ("a", "b")    -- every listed value present

``Filter`` builds those strings the way the public SDK does (helpers
composing ``and``/``or``/``not``/``in``/``include``...), and
``translate`` rewrites the array operators into Spark SQL
(``arrays_overlap`` / ``forall``) so the whole language lands in
Catalyst — parsed, validated, and pushed down like any expression.
Plain-SQL filters pass through untouched.
"""

from __future__ import annotations

import re
from collections.abc import Sequence


def _quote(v) -> str:
    if isinstance(v, str):
        return '"' + v.replace('"', '\\"') + '"'
    return str(v)


class Filter:
    """String-building helpers mirroring the public SDK surface."""

    def __init__(self, cond: str) -> None:
        self.cond = cond

    def And(self, cond: str) -> "Filter":
        self.cond = f"({self.cond}) and ({cond})"
        return self

    def Or(self, cond: str) -> "Filter":
        self.cond = f"({self.cond}) or ({cond})"
        return self

    def AndNot(self, cond: str) -> "Filter":
        self.cond = f"({self.cond}) and not ({cond})"
        return self

    def OrNot(self, cond: str) -> "Filter":
        self.cond = f"({self.cond}) or not ({cond})"
        return self

    @staticmethod
    def In(field: str, values: Sequence) -> str:
        return f"{field} in ({', '.join(_quote(v) for v in values)})"

    @staticmethod
    def NotIn(field: str, values: Sequence) -> str:
        return f"{field} not in ({', '.join(_quote(v) for v in values)})"

    @staticmethod
    def Include(field: str, values: Sequence) -> str:
        return f"{field} include ({', '.join(_quote(v) for v in values)})"

    @staticmethod
    def Exclude(field: str, values: Sequence) -> str:
        return f"{field} exclude ({', '.join(_quote(v) for v in values)})"

    @staticmethod
    def IncludeAll(field: str, values: Sequence) -> str:
        return f"{field} include all ({', '.join(_quote(v) for v in values)})"


_ARRAY_OP_RE = re.compile(
    r"(?P<field>[A-Za-z_][A-Za-z0-9_.]*)\s+"
    r"(?P<op>include\s+all|include|exclude)\s*"
    r"\((?P<vals>[^)]*)\)",
    re.IGNORECASE,
)


def translate(cond: str) -> str:
    """Rewrite include / exclude / include all into Spark SQL. The value
    list is substituted verbatim into ``array(...)`` — it is already a
    comma-separated literal list in the source grammar. Double-quoted
    strings become single-quoted (Spark reads double quotes as strings
    too, but normalizing keeps the output canonical)."""

    def repl(m: re.Match) -> str:
        field = m.group("field")
        op = re.sub(r"\s+", " ", m.group("op").lower())
        vals = m.group("vals")
        arr = f"array({vals})"
        if op == "include":
            return f"arrays_overlap({field}, {arr})"
        if op == "exclude":
            return f"(not arrays_overlap({field}, {arr}))"
        return f"forall({arr}, __v -> array_contains({field}, __v))"

    return _ARRAY_OP_RE.sub(repl, cond)
