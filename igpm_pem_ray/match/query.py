"""Query-graph model + parser for the reference's CLI mini-language.

Reference analog (M1, SURVEY.md 2.2): ``--vertex a b c --edge
x:a:b ... --path z:c:a --vertexlabel a:cyan --edgelabel x:yes
--directed --condition ... --groupby ... --orderby ... --aggregate
OP:sym.prop`` — parsed ~6x over in the reference
(/root/reference/patternmatching/gray/incremental/query_call.py:36-127
and clones); ONE implementation here, a plain driver-side object
broadcast into tasks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class QueryEdge:
    name: str
    a: str
    b: str
    label: str = ""
    is_path: bool = False


@dataclass
class Query:
    syms: list[str] = field(default_factory=list)
    vertex_labels: dict[str, str] = field(default_factory=dict)
    edges: list[QueryEdge] = field(default_factory=list)
    directed: bool = False
    condition: str | None = None
    group_by: list[str] = field(default_factory=list)
    order_by: list[str] = field(default_factory=list)
    aggregates: list[str] = field(default_factory=list)


def parse_query_args(args: list[str]) -> Query:
    """Same option surface as the reference (README.md:28-74)."""
    q = Query()
    edge_labels: dict[str, str] = {}
    i = 0
    mode = None
    while i < len(args):
        tok = args[i]
        if tok.startswith("--"):
            mode = tok[2:]
            if mode == "directed":
                q.directed = True
                mode = None
        else:
            if mode == "vertex":
                q.syms.append(tok)
            elif mode == "edge":
                name, a, b = tok.split(":")
                q.edges.append(QueryEdge(name, a, b))
            elif mode == "path":
                name, a, b = tok.split(":")
                q.edges.append(QueryEdge(name, a, b, is_path=True))
            elif mode == "vertexlabel":
                sym, lbl = tok.split(":")
                q.vertex_labels[sym] = lbl
            elif mode == "edgelabel":
                name, lbl = tok.split(":")
                edge_labels[name] = lbl
            elif mode == "condition":
                q.condition = (q.condition + " " if q.condition else "") + tok
            elif mode == "groupby":
                q.group_by.append(tok)
            elif mode == "orderby":
                q.order_by.append(tok)
            elif mode == "aggregate":
                q.aggregates.append(tok)
            else:
                raise ValueError(f"unexpected token {tok!r} (mode={mode})")
        i += 1
    for e in q.edges:
        e.label = edge_labels.get(e.name, "")
        for s in (e.a, e.b):
            if s not in q.syms:
                raise ValueError(f"edge {e.name!r} references undeclared symbol {s!r}")
    return q
