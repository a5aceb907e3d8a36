"""Parity-collector cluster routing (experiments/collect_results.py).

The round-4 per-cluster scheme (DESIGN.md §13) routes every sweep axis to
runs generated at its own calibration; a mis-parsed run name would silently
compare clusters apples-to-oranges again (the round-3 verdict's top issue),
so the name → cluster mapping is pinned here.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

from collect_results import CLUSTERS, in_cluster, parse_name, run_in_cluster

FLAG = ("ei_16_di_16_co_16_sl_90_ll_10_pl_5_f_5_dm_128_nh_8_el_[4, 3]_dl_3"
        "_df_64_do_0.05_at_full_em_fixed_ac_gelu_21")


def test_parse_cal_v30_fast_cluster():
    f = parse_name(FLAG + "_cal_v30_r4f")
    assert f["calibrated"] and f["speed"] == 30.0
    assert in_cluster(f, "seq_len") and in_cluster(f, "label_len")
    assert in_cluster(f, "attn")
    assert not in_cluster(f, "snr") and not in_cluster(f, "d_ff")
    assert not in_cluster(f, "d_model")


def test_parse_ss30_vfast_cluster():
    f = parse_name(FLAG + "_ss30_r4v")
    assert not f["calibrated"] and f["ss"] == 30 and f["speed"] == 30.0
    assert in_cluster(f, "d_model")
    assert not any(in_cluster(f, a) for a in
                   ("snr", "seq_len", "label_len", "attn", "d_ff", "distil"))


def test_parse_cal_v5_snr_cluster():
    f = parse_name(FLAG + "_cal_v5_r2cos")
    assert f["calibrated"] and f["speed"] == 5.0 and f["ss"] == 14
    assert in_cluster(f, "snr")
    assert not in_cluster(f, "seq_len")


def test_legacy_cal_name_defaults_to_5p5():
    # Round-2 calibrated runs carried no _v token; they parse as 5.5 km/h
    # and belong to NO parity cluster under the round-4 scheme.
    f = parse_name(FLAG + "_cal_r2a")
    assert f["calibrated"] and f["speed"] == 5.5
    assert not any(in_cluster(f, a) for a in CLUSTERS)


def test_ab_geometry_does_not_leak_between_clusters():
    # cal_v3 (smooth) rows must not satisfy the fast cluster and vice versa.
    assert run_in_cluster(FLAG + "_cal_v3_r3c", "d_ff")
    assert not run_in_cluster(FLAG + "_cal_v3_r3c", "seq_len")
    assert not run_in_cluster(FLAG + "_cal_v30_r4f", "d_ff")


def test_speed_token_anchored_to_cal_tag():
    # An unrelated _v token earlier in the name must not shadow the cal tag.
    f = parse_name(FLAG + "_v2_cal_v30_r4f")
    assert f["speed"] == 30.0
