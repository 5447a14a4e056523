"""fit_curves / extract_pheno evaluate their input lineage exactly once.

The global rescale (fit_curve.R:112) needs a min/max over the WHOLE filled
table before the per-cycle kernel runs. Without care that costs two full
evaluations of the upstream fill→smooth lineage per call; the operators now
persist the input (agg job populates the cache, the join reads it back) or
accept an explicit ``rescale=`` from catalog stats and skip the agg entirely.
"""

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def filled_and_cycles(spark):
    filled = spark.range(0, 120).select(
        F.lit("a").alias("id"),
        F.expr("date_add(date'2020-01-01', cast(id as int))").alias("date"),
        (0.2 + 0.6 * F.sin(F.col("id") / 20.0)).alias("value"))
    cycles = spark.createDataFrame(
        [("a", 2020, 1, "2020-01-10", "2020-04-01", "2020-02-15", 30.0)],
        "id string, year int, cycle int, begin string, end string, "
        "maxval string, weight double") \
        .select("id", "year", "cycle",
                F.col("begin").cast("date"),
                F.col("end").cast("date"),
                F.col("maxval").cast("date"), "weight")
    return filled, cycles


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fit_curves_caches_filled(spark, filled_and_cycles):
    from sen2rts_spark.operators.pheno_tools import fit_curves
    filled, cycles = filled_and_cycles
    out = fit_curves(filled, cycles, fit="no")
    n = out.count()
    assert n > 0
    # the join side must read the cached materialization, not re-run lineage
    assert "InMemoryTableScan" in _plan(out)


def test_fit_curves_explicit_rescale_skips_cache(spark, filled_and_cycles):
    from sen2rts_spark.operators.pheno_tools import fit_curves
    filled, cycles = filled_and_cycles
    # identical logical plans from the sibling test would otherwise be
    # substituted with its cached InMemoryRelation by the cache manager
    spark.catalog.clearCache()
    gmin, gmax = filled.agg(F.min("value"), F.max("value")).first()
    out = fit_curves(filled, cycles, fit="no",
                     rescale=(float(gmin), float(gmax) - float(gmin)))
    assert "InMemoryTableScan" not in _plan(out)
    # fit='no' output equals input values regardless of the rescale source
    rows = {r["date"]: r["value_fitted"] for r in out.collect()}
    orig = {r["date"]: r["value"] for r in filled.collect()}
    assert rows and all(abs(rows[d] - orig[d]) < 1e-12 for d in rows)


def test_extract_pheno_caches_filled(spark, filled_and_cycles):
    from sen2rts_spark.operators.timeseries import extract_pheno
    filled, cycles = filled_and_cycles
    out = extract_pheno(filled, cycles, fit="no", method="trs")
    assert out.count() == 1
    assert "InMemoryTableScan" in _plan(out)
