"""Property tests for the Gorilla codec: roundtrip over adversarial inputs.

Hypothesis drives both encoder paths (per-point for n < 192, vectorized
above) across NaN/Inf payloads, negative and duplicate-free timestamps,
constant runs and sign flips — decode(encode(x)) must be bit-exact (NaN
compared on the uint64 view, so payload bits count too).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sen2rts_spark.kernels.gorilla import gorilla_decode, gorilla_encode


def _roundtrip(ts, vals):
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    dts, dvals = gorilla_decode(gorilla_encode(ts, vals))
    assert np.array_equal(dts, ts)
    assert np.array_equal(dvals.view(np.uint64), vals.view(np.uint64))


@given(
    n=st.integers(min_value=0, max_value=400),
    seed=st.integers(min_value=0, max_value=2**31),
    step_lo=st.integers(min_value=1, max_value=10),
    step_hi=st.integers(min_value=10, max_value=10**6),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_random_cadence(n, seed, step_lo, step_hi):
    rng = np.random.default_rng(seed)
    steps = rng.integers(step_lo, step_hi + 1, n)
    ts = np.cumsum(steps) - 10**9  # negative starts too
    vals = rng.normal(0, 1e3, n)
    # sprinkle special values
    for frac, v in ((0.1, np.nan), (0.05, np.inf), (0.05, -np.inf),
                    (0.1, 0.0), (0.1, -0.0)):
        idx = rng.random(n) < frac
        vals[idx] = v
    _roundtrip(ts, vals)


@given(n=st.integers(min_value=2, max_value=500),
       seed=st.integers(min_value=0, max_value=2**31))
@settings(max_examples=30, deadline=None)
def test_roundtrip_regular_cadence_fast_path(n, seed):
    rng = np.random.default_rng(seed)
    ts = np.arange(n, dtype=np.int64) * 86400 + 1_500_000_000
    vals = np.resize(np.repeat(rng.normal(0, 1, max(n // 5, 1)), 5), n)  # constant runs
    _roundtrip(ts, vals)


@given(vals=st.lists(st.floats(allow_nan=True, allow_infinity=True,
                               width=64), min_size=0, max_size=250))
@settings(max_examples=60, deadline=None)
def test_roundtrip_arbitrary_floats(vals):
    ts = np.arange(len(vals), dtype=np.int64)
    _roundtrip(ts, vals)


def test_roundtrip_dispatch_seam_sizes():
    rng = np.random.default_rng(7)
    for n in (190, 191, 192, 193, 400):
        ts = np.cumsum(rng.integers(1, 1000, n))
        vals = rng.normal(0, 1, n)
        _roundtrip(ts, vals)
