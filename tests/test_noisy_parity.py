"""Noisy-backend parity assertions (r2 VERDICT item 2).

The committed artifact `noisy_parity.json` (benchmarks/noisy_parity.py)
records orig/cut noisy fidelities for all 8 reference configs on the
calibrated fake_kolkata_v2 model, both legs 1000-shot like the reference
(Utilities.py:154-226).  The assertions here are structural — orderings
and cut-vs-orig relations — because exact values depend on qiskit's full
pulse-level device model:

  * the readout/2q-error-dominated group (add/aqft/ghz/hwe) sits in
    0.7..1.0 and the shot-noise-collapsed supremacy group far below it,
    in the reference's order;
  * ghz-24 orig matches the reference to ~0.3% (0.733 vs 0.731);
  * cut >> orig holds on the supremacy-class rows where the reference
    shows it (knitting restores a sampleable distribution that the
    1000-shot uncut run cannot resolve over 2^n outcomes).

A small live leg re-runs syc-12 end-to-end so the pipeline itself (not
just the artifact) is exercised in-suite.
"""
import json
import pathlib

import pytest

ART = pathlib.Path(__file__).parent.parent / "noisy_parity.json"


@pytest.fixture(scope="module")
def table():
    data = json.loads(ART.read_text())
    assert len(data) == 8, f"expected all 8 configs, have {sorted(data)}"
    return data


def test_all_reference_configs_recorded(table):
    want = {
        "add_10_1_2_9", "aqft_6_2_2_5", "ghz_24_1_2_12", "hwe_10_1_2_5",
        "sup_12_1_2_10", "sup_20_1_2_10", "sup_25_1_2_13", "syc_12_2_2_10",
    }
    assert set(table) == want


def test_orig_fidelity_grouping_matches_reference(table):
    """High group (gate/readout-limited) well above the shot-noise-
    collapsed supremacy group, like the reference's table."""
    high = ["add_10_1_2_9", "aqft_6_2_2_5", "ghz_24_1_2_12", "hwe_10_1_2_5"]
    low = ["sup_12_1_2_10", "syc_12_2_2_10"]
    floor = ["sup_20_1_2_10", "sup_25_1_2_13"]
    for k in high:
        assert table[k]["fid_orig"] > 0.65, (k, table[k]["fid_orig"])
    for k in low:
        assert table[k]["fid_orig"] < 0.35, (k, table[k]["fid_orig"])
    for k in floor:
        assert table[k]["fid_orig"] < 1e-2, (k, table[k]["fid_orig"])
    assert min(table[k]["fid_orig"] for k in high) > max(
        table[k]["fid_orig"] for k in low
    )


def test_ghz24_orig_matches_reference_closely(table):
    assert table["ghz_24_1_2_12"]["fid_orig"] == pytest.approx(
        0.731, abs=0.05
    )


def test_cut_beats_orig_on_supremacy_class(table):
    """The reference shows cut >> orig for sup-12 (0.781 vs 0.126) and
    syc-12 (0.963 vs 0.181); the calibrated model reproduces both."""
    for k in ("sup_12_1_2_10", "syc_12_2_2_10"):
        row = table[k]
        assert row["fid_cut"] > 4 * row["fid_orig"], (k, row)
        assert row["fid_cut"] > 0.6, (k, row)
    # sup-20: reference cut 2.07e-3 vs orig 1.27e-5 — two orders better
    row = table["sup_20_1_2_10"]
    assert row["fid_cut"] > max(row["fid_orig"], 1e-5), row


def test_live_syc12_parity():
    """Pipeline-level (not artifact) check: syc-12 d2 through the full
    noisy stack lands in the recorded band."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    from benchmarks.noisy_parity import run_config

    res = run_config("syc", 12, 2, 2, 10, shots=1000, seed=7,
                     log=lambda *a: None)
    assert res["fid_orig"] < 0.35
    assert res["fid_cut"] > 0.6
