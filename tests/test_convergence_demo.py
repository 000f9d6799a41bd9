"""The convergence demo's round-3 machinery stays runnable: pool refresh
(fresh scenes/perturbations via set_epoch), amplitude curriculum, and the
held-out full-amplitude validation pool (docs/CONVERGENCE.md protocol).
"""

import sys

import pytest


@pytest.mark.slow
def test_demo_refresh_curriculum_heldout_val(tmp_path):
    sys.path.insert(0, "/root/repo")
    from examples.convergence_demo import main

    save = str(tmp_path / "agent_best")
    r = main(["--geo-steps", "4", "--agent-steps", "6", "--batch-size", "2",
              "--pool-size", "4", "--refresh-every", "2",
              "--geo-refresh-every", "2", "--curriculum", "0.5",
              "--val-size", "4", "--scene", "structured",
              # run-G machinery: mixture + DAgger floor + pose-aware obs +
              # explicit lr pacing + incremental best-snapshot persistence
              "--amp-mixture", "--expert-beta-floor", "0.2", "--pose-aware",
              "--lr-epoch-steps", "50", "--val-every", "2",
              # run-K/L machinery: bearing obs channels + median-based
              # snapshot selection
              "--obs-bearing", "--select-median",
              "--save-agent", save])
    # the best snapshot was persisted incrementally (not only at exit)
    import os
    assert os.path.isdir(save)
    # geo descended, BC raised expert agreement (asserted inside main too)
    assert r["geo_losses"][-1] < r["geo_losses"][0]
    u_agree, t_agree = r["agreement"]
    assert t_agree > u_agree
    # held-out eval produced finite full-amplitude metrics
    for k in ("untrained", "trained", "expert"):
        rte, rre = r[k]
        assert rte >= 0 and rre >= 0


@pytest.mark.slow
def test_demo_geo_curriculum_and_warm_start(tmp_path):
    """--geo-curriculum ramps the geo pool's yaw amplitude (validation
    stays at full amplitude) and --geo-warm-start continues stage-1
    training from a --save-geo snapshot — the two-phase amplitude
    curriculum machinery of docs/CONVERGENCE.md section 15."""
    sys.path.insert(0, "/root/repo")
    from examples.convergence_demo import main

    import os
    import numpy as np

    geo_dir = str(tmp_path / "geo_cur")
    r = main(["--geo-steps", "4", "--agent-steps", "0", "--batch-size", "2",
              "--pool-size", "4", "--val-size", "2", "--scene", "structured",
              "--geo-refresh-every", "2", "--geo-curriculum", "0.5",
              "--geo-r-start", "0.3", "--save-geo", geo_dir])
    assert os.path.isdir(geo_dir)
    assert np.isfinite(r["geo_losses"]).all()
    # warm-start: losses continue from the snapshot (a fresh list, still
    # finite), held-out eval runs at full amplitude
    r2 = main(["--geo-steps", "2", "--agent-steps", "0", "--batch-size", "2",
               "--pool-size", "4", "--val-size", "2", "--scene",
               "structured", "--load-geo", geo_dir, "--geo-warm-start"])
    assert len(r2["geo_losses"]) == 2
    assert np.isfinite(r2["geo_losses"]).all()
    # plain --load-geo (no warm start) still skips stage 1
    r3 = main(["--geo-steps", "2", "--agent-steps", "0", "--batch-size", "2",
               "--pool-size", "4", "--val-size", "2", "--scene",
               "structured", "--load-geo", geo_dir])
    assert len(r3["geo_losses"]) == 1  # the nan sentinel, no training


@pytest.mark.slow
def test_demo_embed_dim_override_geo_only(tmp_path):
    """--embed-dim/--mlp-dim (the CONVERGENCE §11 capacity probe) rebuild
    every model shape from the config; geo-only mode (--agent-steps 0)
    trains and reports held-out overlap accuracy at the wider width."""
    sys.path.insert(0, "/root/repo")
    from examples.convergence_demo import main

    import os

    geo_dir = str(tmp_path / "geo_best")
    r = main(["--geo-steps", "3", "--agent-steps", "0", "--batch-size", "2",
              "--pool-size", "4", "--val-size", "2", "--scene", "structured",
              "--embed-dim", "48", "--mlp-dim", "96",
              "--save-geo", geo_dir])
    assert len(r["geo_losses"]) == 3
    import numpy as np
    assert np.isfinite(r["geo_losses"]).all()
    # --save-geo with a held-out pool keeps the best snapshot (final
    # state here, since no val checkpoint fires in 3 steps)
    assert os.path.isdir(geo_dir)
