"""Plan-shape guards over the whole query registry.

Catalyst chooses physical operators from size estimates, so a seemingly
innocent edit (dropping a broadcast hint, filtering through a UDF) can
silently turn a bounded broadcast join into an unbounded CartesianProduct
or put row-at-a-time Python in the hot path — correct at sf0.01, fatal at
100 TB. This walks the PLANNED physical plan of every registered query
(no execution of the heavy stages) and rejects:

- ``CartesianProduct``: a non-broadcast cross join materializing |L|x|R|.
  Intentional cross joins in the registry (scaffold grids, IVF centroid
  assignment, global-stats fan-out) are all against broadcast-sized sides
  and must plan as BroadcastNestedLoopJoin.
- ``BatchEvalPython``: a row-at-a-time Python UDF. All Python in the
  registry is Arrow-batched (ArrowEvalPython / MapInArrow / mapInPandas).
"""

import pytest

FORBIDDEN = {
    "CartesianProduct": "non-broadcast cross join",
    "BatchEvalPython": "row-at-a-time Python UDF",
}

SF_DIR = "/root/testdata/sf0.001"


def _plans(spark):
    import __spark_entry__ as entrymod
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF_DIR)
        yield name, df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_or_row_python(spark):
    bad = {}
    for name, plan in _plans(spark):
        hits = [f"{node} ({why})" for node, why in FORBIDDEN.items()
                if node in plan]
        if hits:
            bad[name] = hits
    assert not bad, f"plan guard violations: {bad}"


# Driver-side actions a query builder must never run at plan-construction
# time: a .count()/.first() during construction forces a Spark job before
# the caller's action (and on a cluster, a full lineage execution) just to
# build the plan — global scalars belong in broadcast single-row aggregates
# (VERDICT r5 task 7). Zero-arg guard: `F.count(...)`/`F.first(col)` are
# Catalyst expressions, not actions, and always carry arguments.
DRIVER_ACTIONS = {"count", "collect", "first", "head", "toPandas"}


def test_no_driver_actions_in_query_builders():
    import ast
    import inspect

    from sen2rts_spark import queries, queries_docs, queries_ts
    from sen2rts_spark.operators import (extract, geo, gorilla_sink, grouped,
                                         pheno_tools, rollup, skew,
                                         timeseries)

    bad = []
    for mod in (queries, queries_docs, queries_ts, extract, geo,
                gorilla_sink, grouped, pheno_tools, rollup, skew,
                timeseries):
        src = inspect.getsource(mod)
        lines = src.splitlines()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr in DRIVER_ACTIONS
                    and not node.args and not node.keywords
                    and not (isinstance(node.func.value, ast.Name)
                             and node.func.value.id == "F")):
                # explicit opt-in escape hatch: the action sits behind a
                # raise-unless-allow_job gate and is marked on its line
                if "# plan-guard: allow_job" in lines[node.lineno - 1]:
                    continue
                bad.append(f"{mod.__name__}:{node.lineno} "
                           f".{node.func.attr}()")
    assert not bad, f"driver actions in query/operator modules: {bad}"
