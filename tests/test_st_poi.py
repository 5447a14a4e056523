"""polylabel kernel + st_poi operator (st_poi.R:19-47 semantics)."""

import math

import numpy as np
import pytest

from sen2rts_spark.kernels.polylabel import (parse_wkt_polygon, poi,
                                             polygon_area)


def test_square_center():
    x, y, d = poi([np.array([(0, 0), (4, 0), (4, 4), (0, 4)])],
                  precision=1e-4)
    assert abs(x - 2) < 1e-3 and abs(y - 2) < 1e-3
    assert abs(d - 2) < 1e-3


def test_square_with_center_hole():
    # POI must land inside the ring band, not in the hole
    outer = np.array([(0, 0), (10, 0), (10, 10), (0, 10)])
    hole = np.array([(4, 4), (6, 4), (6, 6), (4, 6)])
    x, y, d = poi([outer, hole], precision=1e-3)
    assert 0 < d
    # hole center is excluded
    assert not (4 < x < 6 and 4 < y < 6)
    # the widest band point: distance 2 from the boundary (e.g. (2, 2)-ish
    # corners of the band); polylabel reaches >= 1.9
    assert d >= 1.9


def test_l_shape_avoids_notch():
    # L-shape: the naive centroid falls outside; POI stays inside
    rings = [np.array([(0, 0), (6, 0), (6, 2), (2, 2), (2, 6), (0, 6)])]
    x, y, d = poi(rings, precision=1e-3)
    assert d > 0.9  # inside, near the thick corner (max inscribed ~1.0)
    inside_l = (0 <= x <= 6 and 0 <= y <= 2) or (0 <= x <= 2 and 0 <= y <= 6)
    assert inside_l


def test_area_with_hole_and_default_precision():
    outer = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)])  # closed
    hole = np.array([(4, 4), (6, 4), (6, 6), (4, 6)])
    assert abs(polygon_area([outer, hole]) - 96) < 1e-9
    # default precision = sqrt(area)/1e3 (st_poi.R:25-27)
    x, y, d = poi([outer])
    assert abs(d - 5) < math.sqrt(100) / 1e3 * 10


def test_wkt_parse_roundtrip():
    rings = parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert len(rings) == 2 and rings[0].shape == (5, 2)
    with pytest.raises(ValueError):
        parse_wkt_polygon("LINESTRING (0 0, 1 1)")


def test_st_poi_operator(spark):
    from sen2rts_spark.operators.geo import st_poi
    df = spark.createDataFrame(
        [("a", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
         ("b", "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))")],
        "pid string, geometry string")
    out = {r["pid"]: r for r in
           st_poi(df, "geometry", allow_job=True).collect()}
    assert abs(out["a"]["poi_x"] - 2) < 0.05
    assert abs(out["a"]["poi_y"] - 2) < 0.05
    assert out["b"]["poi_dist"] > 0.9
    # explicit precision skips the dataset-mean agg job
    out2 = st_poi(df, "geometry", precision=1e-3).collect()
    assert len(out2) == 2
    # default precision without opt-in must refuse to run a plan-time job
    import pytest
    with pytest.raises(ValueError, match="allow_job"):
        st_poi(df, "geometry")


def test_st_poi_stats_precision_no_probe(spark):
    """stats={'mean_sqrt_area': m} must reproduce the default-precision
    result without running the dataset-mean probe job (VERDICT r3 task 9)."""
    import numpy as np
    from sen2rts_spark.operators.geo import st_poi
    df = spark.createDataFrame(
        [("a", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
         ("b", "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))")],
        "pid string, geometry string")
    m = (np.sqrt(16.0) + np.sqrt(20.0)) / 2.0  # mean sqrt(area) by hand
    probe = {r["pid"]: r for r in
             st_poi(df, "geometry", allow_job=True).collect()}
    stats = {r["pid"]: r for r in
             st_poi(df, "geometry", stats={"mean_sqrt_area": m}).collect()}
    for pid in ("a", "b"):
        assert probe[pid]["poi_x"] == stats[pid]["poi_x"]
        assert probe[pid]["poi_y"] == stats[pid]["poi_y"]
        assert probe[pid]["poi_dist"] == stats[pid]["poi_dist"]
