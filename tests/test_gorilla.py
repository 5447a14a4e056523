"""Property tests for the Gorilla codec: decode(encode(x)) bit-exact."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sen2rts_spark.kernels.gorilla import gorilla_decode, gorilla_encode


def _roundtrip(ts, vals):
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    ots, ovals = gorilla_decode(gorilla_encode(ts, vals))
    assert np.array_equal(ots, ts)
    assert np.array_equal(ovals.view(np.uint64), vals.view(np.uint64))


def test_empty_and_singleton():
    _roundtrip([], [])
    _roundtrip([1234567890], [3.14159])


def test_regular_cadence_constant():
    ts = np.arange(0, 86400 * 30, 86400, dtype=np.int64)
    _roundtrip(ts, np.full(len(ts), 0.25))


def test_typical_series():
    ts = np.int64(1577836800) + np.cumsum(
        np.array([0, 86400, 86400, 172800, 86400, 90000, 86400], dtype=np.int64))
    vals = np.array([0.1, 0.1, 0.15, np.nan, -0.3, 1e300, 0.0])
    _roundtrip(ts, vals)


def test_compression_ratio_on_smooth_series():
    ts = np.arange(0, 86400 * 365, 86400, dtype=np.int64)
    vals = np.round(np.sin(np.arange(365) / 58.0) * 0.4 + 0.5, 3)
    blob = gorilla_encode(ts, vals)
    raw = len(ts) * 16
    assert len(blob) < raw * 0.7, (len(blob), raw)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=200),
    st.data(),
)
def test_roundtrip_property(raw_ts, data):
    ts = np.sort(np.array(raw_ts, dtype=np.int64))
    vals = data.draw(st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        min_size=len(ts), max_size=len(ts)))
    _roundtrip(ts, vals)


def test_decode_fast_path_regular_cadence():
    """The tier layout (constant cadence) takes the vectorized timestamp
    path; irregular and mixed cadences take the general walk. All three
    must roundtrip bit-exactly and agree with each other at the seams."""
    rng = np.random.default_rng(3)
    vals = np.cumsum(rng.normal(0, 0.01, 500)) + 0.5
    regular = np.arange(500, dtype=np.int64) * 86400 + 1_577_836_800
    irregular = np.sort(rng.choice(10**8, 500, replace=False)).astype(np.int64)
    # regular except ONE late gap — must fall back to the general walk
    mixed = regular.copy()
    mixed[400:] += 3600
    for ts in (regular, irregular, mixed):
        rt, rv = gorilla_decode(gorilla_encode(ts, vals))
        assert (rt == ts).all()
        assert (rv == vals).all()
