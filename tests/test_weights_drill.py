"""Weights-arrival drill dry-run (VERDICT r3 #9): the one-command chain —
HF-layout export -> load_model -> validate_published configs 1-2 (torch
cross-implementation parity, per-stage checksums, dual-backend PnP) —
must run end-to-end offline so checkpoint-arrival day is mechanical."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_weights_drill_dry_run_tiny(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import weights_drill

    out = tmp_path / "drill_report.json"
    rc = weights_drill.main(["--dry-run", "--tiny", "--size", "64",
                             "--out", str(out)])
    assert rc == 0
    with open(out) as f:
        report = json.load(f)
    assert report["overall"] == "pass"
    val = report["validation"]
    assert val["config1_two_view"]["status"] == "pass"
    assert val["config2_eight_view_pnp"]["status"] == "pass"
    assert "stage_checksums" in val
    # eval configs stay queued (no data in the environment) but must be
    # reported as skipped, not silently absent
    assert "skipped" in val["config3_re10k"]["status"]
