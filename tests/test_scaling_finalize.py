"""scaling_ckpt_finalize: re-aggregating a collector checkpoint must
reproduce the collector's own loop-exit formulas (pure python, no Spark)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from scaling_ckpt_finalize import finalize  # noqa: E402


def _pair(t, lo_secs, hi_sec, accepted=True, steal=(0.0, 0.0, 0.0),
          fixed=(2.0, 1.5), pts=24_030_019):
    s1 = {"cores": 4, "sec": lo_secs[0], "points": pts,
          "pps": pts / lo_secs[0], "steal_pct": steal[0],
          "cal_sec": 0.2, "busy_cpus": 3.9}
    s2 = {"cores": 4, "sec": lo_secs[1], "points": pts,
          "pps": pts / lo_secs[1], "steal_pct": steal[2],
          "cal_sec": 0.2, "busy_cpus": 3.9}
    sh = {"cores": 16, "sec": hi_sec, "points": pts,
          "pps": pts / hi_sec, "steal_pct": steal[1],
          "cal_sec": 0.2, "busy_cpus": 15.5}
    mean_sec = (lo_secs[0] + lo_secs[1]) / 2
    eff_raw = (mean_sec / hi_sec) / 4
    return {"t": t, "sandwich": 1, "lo_reps": [s1, s2], "hi_rep": sh,
            "drift_pct": 1.0, "accepted": accepted,
            "why": "OK" if accepted else "REJECT (x)",
            "fixed_sec": {"4": fixed[0], "16": fixed[1]},
            "eff_raw": round(eff_raw, 3), "eff_steal_adj": round(eff_raw, 3),
            "eff_scalable": round(
                ((mean_sec - fixed[0]) / (hi_sec - fixed[1])) / 4, 3)}


def test_finalize_matches_collector_formulas():
    ckpt = {"protocol": "auto_quiet_window_sandwich", "checkpoint": True,
            "concurrency": 1,
            "probes": [
                {"t": 1.0, "cals": {"4": 0.2, "16": 0.2},
                 "steal_idle_pct": 0.0, "accepted": True},
                _pair(100.0, (100.0, 104.0), 30.0),          # eff 0.85
                _pair(500.0, (96.0, 100.0), 30.0),           # eff ~0.8167
                _pair(900.0, (120.0, 130.0), 30.0, accepted=False),
            ]}
    out = finalize(ckpt)
    assert out["recovered_from_checkpoint"] is True
    assert out["all_pairs"]["n"] == 3
    assert out["all_pairs"]["n_accepted"] == 2
    # only ACCEPTED pairs enter the samples/efficiency fields
    assert len(out["per_pair_efficiency_4_to_16"]) == 2
    # pps-based per-pair formula: mean of lo pps, ratio/4
    pts = 24_030_019
    mean_pps_1 = (pts / 100.0 + pts / 104.0) / 2
    want_1 = round((pts / 30.0) / mean_pps_1 / 4, 3)
    assert out["per_pair_efficiency_4_to_16"][0] == want_1
    # median-of-medians headline
    assert out["scaling_efficiency_4_to_16"] == round(
        out["local[16]"]["median_pps"] / out["local[4]"]["median_pps"] / 4, 3)
    # decomposition fields present and medians over accepted pairs
    assert out["fixed_sec_median_4"] == 2.0
    assert out["fixed_sec_median_16"] == 1.5
    assert "per_pair_eff_scalable_4_to_16" in out


def test_finalize_no_accepted_pairs():
    ckpt = {"protocol": "auto_quiet_window_sandwich", "checkpoint": True,
            "probes": [_pair(10.0, (100.0, 104.0), 30.0, accepted=False)]}
    out = finalize(ckpt)
    assert out["note"] == "no accepted pairs in checkpoint"
    assert out["all_pairs"]["n"] == 1 and out["all_pairs"]["n_accepted"] == 0
    assert "per_pair_efficiency_4_to_16" not in out
