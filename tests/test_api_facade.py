"""Reference-shaped API facade: full pipeline through api.* names, plus
load_s2paths filename parsing and PhenoDeriv smoke."""

import numpy as np
import pyspark.sql.functions as F


def test_api_pipeline_end_to_end(spark):
    from sen2rts_spark import api
    from sen2rts_spark.sources.pages import synth_pages

    pages = synth_pages(spark, n_urls=10, n_slots=50)
    obs = api.extract_s2ts(pages)
    smoothed = api.smooth_s2ts(obs, min_qa=0.1)
    filled = api.fill_s2ts(smoothed)
    cycles = api.cut_cycles(filled)
    assert filled.count() > obs.count()  # daily grid densifies
    assert set(cycles.columns) == {"id", "year", "cycle", "begin", "end",
                                   "maxval", "weight"}
    if cycles.count() > 0:
        aggr = api.aggregate_pheno(filled, cycles)
        assert {"id", "year", "cycle", "value"} <= set(aggr.columns)


def test_load_s2paths_parsing(spark):
    from sen2rts_spark.api import load_s2paths
    paths = [
        "/data/S2A2A_20200104_022_sampleroi_NDVI_10.tif",
        "/data/S2B2A_20200109_022_sampleroi_NDVI_10.tif",
        "/data/S2A2A_20200104_022_sampleroi_SCL_10.tif",
        "/data/not_a_product.txt",
    ]
    df = load_s2paths(spark, paths, prod_type="NDVI")
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["sensor"] == "2A" and str(rows[0]["date"]) == "2020-01-04"
    assert rows[1]["sensor"] == "2B" and rows[1]["orbit"] == "022"
    win = load_s2paths(spark, paths, time_window=("2020-01-05", "2020-12-31"))
    assert win.count() == 1


def test_pheno_deriv_smoke():
    from sen2rts_spark.kernels.dlog import gu_curve
    from sen2rts_spark.kernels.pheno import pheno_deriv
    t = np.arange(1, 151, dtype=float)
    x = gu_curve(np.array([0.05, 1.0, 0.95, 40.0, 110.0, 6.0, 8.0, 1.0, 1.0]), t)
    m = pheno_deriv(x)
    # max-slope date before the peak, min-slope after, positive rates
    assert 30 < m["sos"] < 60 and 95 < m["eos"] < 130
    assert m["rsp"] > 0 > m["rau"]
    assert m["los"] == m["eos"] - m["sos"]
    assert abs(m["pop"] - float(np.argmax(x) + 1)) <= 1


def test_as_s2ts_and_print(spark):
    from sen2rts_spark.api import as_s2ts, print_s2ts
    import pytest
    df = spark.createDataFrame(
        [("u1", "2020-01-01", 0.5), ("u1", "2020-01-06", 0.6),
         ("u2", "2020-01-01", 0.2)],
        "url string, day string, ndvi double")
    ts = as_s2ts(df, id_col="url", date_col="day", value_col="ndvi")
    assert ts.columns[:3] == ["url", "day", "ndvi"] or \
        {"id", "date", "value"} <= set(ts.columns)
    rows = ts.collect()
    assert rows[0]["id"] == "u1" and str(rows[0]["date"]) == "2020-01-01"
    txt = print_s2ts(ts, n=2)
    assert "3 records, 2 series" in txt and "2020-01-06" in txt
    with pytest.raises(ValueError):
        as_s2ts(df.select("url"), id_col="url")


def test_pivot_values_accessor(spark):
    # $value dcast semantics (s2ts-class.R:289-308): date rows, id columns,
    # all-NA dates dropped
    from sen2rts_spark.api import pivot_values
    df = spark.createDataFrame(
        [("a", "2020-01-01", 0.1), ("a", "2020-01-02", 0.2),
         ("b", "2020-01-01", 0.9)],
        "id string, date string, value double")
    wide = pivot_values(df).orderBy("date")
    assert sorted(wide.columns) == ["a", "b", "date"]
    rows = wide.collect()
    assert [r["date"] for r in rows] == ["2020-01-01", "2020-01-02"]
    assert rows[0]["a"] == 0.1 and rows[0]["b"] == 0.9
    assert rows[1]["a"] == 0.2 and rows[1]["b"] is None
    # explicit ids: no discovery pass, absent series -> all-NA col,
    # dates where no requested id has data are dropped
    only_b = pivot_values(df, ids=["b"]).orderBy("date").collect()
    assert len(only_b) == 1 and only_b[0]["b"] == 0.9
