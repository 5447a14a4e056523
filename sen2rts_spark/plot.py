"""Plot helper for sampled time series (reference parity: plot.s2ts).

The reference's first-contact API is ``plot(ts)`` on an ``s2ts`` object
(/root/reference/R/plot.s2ts.R:1-200): raw points sized/colored by qa, the
smoothed line, and optional cycle-cut / pheno-date markers. A distributed
engine cannot (and should not) plot 10^12 rows — the Spark-side contract is
the SAMPLING: pick a bounded set of ids, collect only their rows, and hand a
small pandas frame to a local renderer.

``collect_series_sample`` is the distributed part (bounded collect, tested);
``plot_s2ts`` renders with matplotlib when it is installed — this container
does not ship it, so rendering raises a clear ImportError rather than being
silently stubbed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["collect_series_sample", "plot_s2ts"]


def collect_series_sample(df: DataFrame, n_ids: int = 4,
                          max_points_per_id: int = 2000,
                          id_col: str = "id", date_col: str = "date"):
    """Bounded driver-side sample: the first ``n_ids`` ids (deterministic:
    lowest ids), at most ``max_points_per_id`` rows each (evenly strided by
    row number, preserving endpoints-first ordering), sorted by (id, date).

    The collect is bounded by construction — ``n_ids * max_points_per_id``
    rows regardless of table size; the id pick is a sort-limit on the
    DISTINCT ids (tiny), then a broadcast semi-join back, so no full-table
    driver materialization at any scale.
    """
    ids = (df.select(id_col).distinct().orderBy(id_col).limit(n_ids))
    sub = df.join(F.broadcast(ids), id_col, "left_semi")
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(date_col)
    n = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    rn = F.row_number().over(w)
    # ceil, not floor: floor keeps every row for n just under
    # 2*max_points_per_id (stride 1 at n=3999, max=2000), breaking the
    # documented "at most max_points_per_id rows each" bound (ADVICE r5)
    stride = F.greatest(F.lit(1), F.ceil(n / max_points_per_id).cast("int"))
    sampled = (sub.withColumn("_rn", rn).withColumn("_stride", stride)
               .filter((F.col("_rn") - 1) % F.col("_stride") == 0)
               .drop("_rn", "_stride"))
    return sampled.orderBy(id_col, date_col).toPandas()


def plot_s2ts(df: DataFrame, n_ids: int = 4, value_col: str = "value",
              raw_col: str = "rawval", qa_col: str = "qa",
              id_col: str = "id", date_col: str = "date",
              cycles: DataFrame | None = None):
    """Render sampled series like plot.s2ts.R: raw points (alpha = qa),
    smoothed line, optional cycle begin/end vertical markers. Returns the
    matplotlib Figure. Requires matplotlib (not bundled in this sandbox)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - env without matplotlib
        raise ImportError(
            "plot_s2ts renders locally with matplotlib, which is not "
            "installed here; use collect_series_sample() to get the pandas "
            "frame and plot in your own environment") from exc

    pdf = collect_series_sample(df, n_ids=n_ids, id_col=id_col,
                                date_col=date_col)
    ids = list(pdf[id_col].drop_duplicates())
    fig, axes = plt.subplots(len(ids), 1, figsize=(10, 2.5 * len(ids)),
                             sharex=True, squeeze=False)
    cyc = (cycles.join(
        F.broadcast(df.sparkSession.createDataFrame(
            [(i,) for i in ids], [id_col])), id_col, "left_semi").toPandas()
        if cycles is not None else None)
    for ax, sid in zip(axes[:, 0], ids):
        g = pdf[pdf[id_col] == sid]
        if raw_col in g and qa_col in g:
            ax.scatter(g[date_col], g[raw_col], s=8,
                       alpha=(g[qa_col].fillna(0).clip(0.15, 1.0)),
                       color="tab:gray", label="raw")
        ax.plot(g[date_col], g[value_col], color="tab:green",
                label="smoothed")
        if cyc is not None:
            for _, r in cyc[cyc[id_col] == sid].iterrows():
                ax.axvline(r["begin"], color="tab:blue", lw=0.7, ls="--")
                if r.get("end") is not None:
                    ax.axvline(r["end"], color="tab:red", lw=0.7, ls=":")
        ax.set_title(str(sid), fontsize=9)
        ax.legend(loc="upper right", fontsize=7)
    fig.tight_layout()
    return fig
