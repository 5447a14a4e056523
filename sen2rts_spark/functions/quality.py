"""Quality-weight scalar functions (Catalyst expressions, JVM-side).

Re-create the reference's SCL class → weight decode, CLD% piecewise-linear
rescale and pixel-min combine:

- ``scl_weight``  ~ scl_weights() defaults (/root/reference/R/scl_weights.R:41-52)
- ``cld_weight``  ~ CLD rescale (/root/reference/R/extract_s2ts.R:338-360;
  default breaks derived from scl_weights() defaults: weight 1 at CLD 0,
  (w_med+w_uncl)/2 = (0+0.33)/2 = 0.165 at CLD 20,
  (w_high+w_med)/2 = (0+0)/2 = 0.0 at CLD 80, 0 at CLD 100, linear between)
- ``combine_weights`` ~ pixel-min (/root/reference/R/extract_s2ts.R:385-391)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["SCL_WEIGHTS", "scl_weight", "cld_weight", "combine_weights"]

# class index -> weight (scl_weights.R defaults; float32-rounded like the
# reference's raster math, FIXTURES.md §1)
SCL_WEIGHTS = {
    0: 0.0,    # no_data
    1: 0.0,    # saturated_or_defective
    2: 0.33,   # dark_area_pixels
    3: 0.17,   # cloud_shadows
    4: 1.0,    # vegetation
    5: 1.0,    # not_vegetated
    6: 1.0,    # water
    7: 0.33,   # unclassified
    8: 0.0,    # cloud_medium_probability
    9: 0.0,    # cloud_high_probability
    10: 0.33,  # thin_cirrus
    11: 1.0,   # snow
}


def scl_weight(cls: Column) -> Column:
    """12-class quality decode (CASE WHEN chain -> whole-stage codegen)."""
    expr = F.lit(None).cast("double")
    out = None
    for k, w in SCL_WEIGHTS.items():
        cond = cls == F.lit(k)
        out = F.when(cond, F.lit(w)) if out is None else out.when(cond, F.lit(w))
    return out.otherwise(expr)


def cld_weight(cld_pct: Column, w_max: float = 1.0, w_mid: float = 0.165,
               w_min: float = 0.0) -> Column:
    """Piecewise-linear cloud-probability weight (extract_s2ts.R:349-360).

    Breaks follow the reference derivation from SCL_WEIGHTS:
    CLD 0 -> w_max, CLD 20 -> w_mid = (w_med+w_uncl)/2 = 0.165,
    CLD 80 -> w_min = (w_high+w_med)/2 = 0.0, CLD 100 -> 0; linear between.
    """
    c = cld_pct.cast("double")
    seg1 = F.lit(w_max) + (c - 0.0) / (20.0 - 0.0) * (F.lit(w_mid) - F.lit(w_max))
    seg2 = F.lit(w_mid) + (c - 20.0) / (80.0 - 20.0) * (F.lit(w_min) - F.lit(w_mid))
    seg3 = F.lit(w_min) + (c - 80.0) / (100.0 - 80.0) * (F.lit(0.0) - F.lit(w_min))
    return (
        F.when(c <= 20.0, seg1)
        .when(c <= 80.0, seg2)
        .otherwise(seg3)
    )


def combine_weights(*ws: Column) -> Column:
    """Pixel-min combine of independent weight layers."""
    return F.least(*ws)
