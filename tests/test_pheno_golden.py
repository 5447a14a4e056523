"""Golden tests: cut_cycles, Gu fit, pheno extraction vs reference fixtures."""

import datetime
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from rda_reader import load_rda, rda_table  # noqa: E402

from sen2rts_spark.kernels.cycles import cut_cycles_series  # noqa: E402
from sen2rts_spark.kernels.dlog import fit_gu  # noqa: E402
from sen2rts_spark.kernels.pheno import pheno_trs  # noqa: E402

DATA = "/root/reference/data"
EPOCH = datetime.date(1970, 1, 1)
RESCALE = (0.046667686703721734, 0.8669273771881469)


def _days(dates):
    return np.array([(d - EPOCH).days for d in dates], dtype=np.int64)


def _named(o):
    names = [n for n in (o.attrs["names"].value if "names" in o.attrs else [])]
    return dict(zip(names, o.value))


@pytest.fixture(scope="module")
def ts_filled():
    return rda_table(f"{DATA}/ts_filled.rda", "ts_filled")


@pytest.fixture(scope="module")
def dt_cycles():
    return rda_table(f"{DATA}/dt_cycles.rda", "dt_cycles")


@pytest.fixture(scope="module")
def dt_pheno():
    return rda_table(f"{DATA}/dt_pheno.rda", "dt_pheno")


@pytest.fixture(scope="module")
def cf_fits():
    cfd = _named(load_rda(f"{DATA}/cf.rda")["cf"])
    out = {}
    for sid in cfd:
        for yr in _named(cfd[sid]):
            for cyc, node in _named(_named(cfd[sid])[yr]).items():
                nd = _named(node)
                out[(sid, yr, cyc)] = np.array(_named(nd["fit"])["predicted"].value)
    return out


def test_cut_cycles_exact(ts_filled, dt_cycles):
    got = []
    for sel in ("1", "2"):
        idx = [i for i, v in enumerate(ts_filled["id"]) if v == sel]
        days = _days([ts_filled["date"][i] for i in idx])
        vals = np.array([ts_filled["value"][i] for i in idx], dtype=np.float64)
        for r in cut_cycles_series(days, vals):
            got.append((sel, r["year"], r["cycle"],
                        EPOCH + datetime.timedelta(days=r["begin"]),
                        EPOCH + datetime.timedelta(days=r["end"]),
                        EPOCH + datetime.timedelta(days=r["maxval"]),
                        r["weight"]))
    gold = list(zip(dt_cycles["id"], dt_cycles["year"], dt_cycles["cycle"],
                    dt_cycles["begin"], dt_cycles["end"], dt_cycles["maxval"],
                    dt_cycles["weight"]))
    assert len(got) == len(gold) == 3
    for g, o in zip(gold, got):
        assert g[:6] == o[:6]
        assert abs(g[6] - o[6]) < 1e-9


def test_pheno_trs_exact_from_reference_curves(cf_fits, dt_pheno):
    """Extractor isolation: reference fitted curves -> exact dt_pheno."""
    for ci, key in enumerate([("1", "2020", "1"), ("2", "2020", "1"),
                              ("2", "2020", "2")]):
        pred = cf_fits[key]
        m = pheno_trs(pred, 0.5)
        begin = dt_pheno["begin"][ci]
        assert begin + datetime.timedelta(days=int(m["sos"]) - 1) == dt_pheno["sos"][ci]
        assert begin + datetime.timedelta(days=int(m["eos"]) - 1) == dt_pheno["eos"][ci]
        assert begin + datetime.timedelta(days=int(m["pop"]) - 1) == dt_pheno["pop"][ci]
        assert int(m["los"]) == dt_pheno["los"][ci]
        for k in ("mgs", "peak", "msp", "mau"):
            ours = RESCALE[0] + m[k] * RESCALE[1]
            assert abs(ours - dt_pheno[k][ci]) < 1e-12, (key, k)
        assert np.isnan(m["rsp"]) and np.isnan(m["rau"])


def test_gu_fit_end_to_end_dates(ts_filled, dt_cycles, dt_pheno):
    """Our optimizer: SSE <= reference fit, sos/eos/los dates exact.

    ``pop`` (argmax of the fitted curve) is allowed ±1 day: our multistart
    finds an equal-or-DEEPER SSE minimum than R optim's maxit-limited BFGS
    (e.g. 0.02785 vs 0.028027 on cycle 2/2), and on a flat peak the argmax of
    two equally-good fits can differ by one day. The extractor itself is
    bit-exact given the reference curve (test_pheno_trs_exact_...).
    """
    ref_sse = {("1", 1): 0.0330363, ("2", 1): 0.1148495, ("2", 2): 0.0280271}
    for ci in range(3):
        sid = dt_cycles["id"][ci]
        cyc = dt_cycles["cycle"][ci]
        idx = [i for i, v in enumerate(ts_filled["id"]) if v == sid]
        days = _days([ts_filled["date"][i] for i in idx])
        vals = np.array([ts_filled["value"][i] for i in idx], dtype=np.float64)
        relval = (vals - RESCALE[0]) / RESCALE[1]
        b = (dt_cycles["begin"][ci] - EPOCH).days
        e = (dt_cycles["end"][ci] - EPOCH).days
        sel = (days >= b) & (days < e)
        fit = fit_gu(relval[sel])
        assert fit is not None
        assert fit["sse"] <= ref_sse[(sid, cyc)] + 1e-4
        m = pheno_trs(fit["predicted"], 0.5)
        begin = dt_pheno["begin"][ci]
        assert begin + datetime.timedelta(days=int(m["sos"]) - 1) == dt_pheno["sos"][ci]
        assert begin + datetime.timedelta(days=int(m["eos"]) - 1) == dt_pheno["eos"][ci]
        pop_date = begin + datetime.timedelta(days=int(m["pop"]) - 1)
        assert abs((pop_date - dt_pheno["pop"][ci]).days) <= 1
        assert int(m["los"]) == dt_pheno["los"][ci]


def test_ground_mask_buffer_erosion():
    """W8 parity: ground runs eroded by ground_buffer days at both ends
    (cut_cycles.R:170-188)."""
    from sen2rts_spark.kernels.cycles import ground_mask
    days = np.arange(100)
    rv = np.concatenate([np.full(30, 0.1), np.full(40, 0.8), np.full(30, 0.1)])
    g, cg = ground_mask(days, rv, max_groundvalue=0.2, ground_buffer=10)
    assert g[:20].all()          # leading ground, eroded tail
    assert not g[20:30].any()    # 10 days before the rising edge eroded
    assert not g[30:70].any()    # the cycle itself
    assert not g[70:80].any()    # [date_l, date_r] inclusive erosion (R :184)
    assert g[80:].all()
    assert list(np.flatnonzero(cg)) == [20, 79]
    assert cg[20] == -1 and cg[79] == 1
