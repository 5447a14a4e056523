"""collect_series_sample: bounded, deterministic, stride-sampled collect."""

import pyspark.sql.functions as F


def test_sample_is_bounded_and_sorted(spark):
    from sen2rts_spark.plot import collect_series_sample
    df = spark.range(0, 50000).select(
        (F.col("id") % 50).cast("string").alias("id"),
        F.date_add(F.lit("2020-01-01").cast("date"),
                   (F.col("id") / 50).cast("int")).alias("date"),
        F.rand(7).alias("value"))
    pdf = collect_series_sample(df, n_ids=3, max_points_per_id=100)
    assert set(pdf["id"]) == {"0", "1", "10"}  # lexicographic lowest 3
    counts = pdf.groupby("id").size()
    # stride floor(1000/100)=10 over 1000 rows -> exactly 100 points per id
    assert (counts == 100).all()
    g = pdf[pdf["id"] == "0"]["date"].tolist()
    assert g == sorted(g)


def test_plot_raises_without_matplotlib(spark):
    import pytest

    from sen2rts_spark.plot import plot_s2ts
    df = spark.range(0, 10).select(
        F.lit("a").alias("id"),
        F.date_add(F.lit("2020-01-01").cast("date"),
                   F.col("id").cast("int")).alias("date"),
        F.rand(1).alias("value"))
    try:
        import matplotlib  # noqa: F401
        fig = plot_s2ts(df, n_ids=1)
        assert fig is not None
    except ImportError:
        with pytest.raises(ImportError, match="matplotlib"):
            plot_s2ts(df, n_ids=1)
