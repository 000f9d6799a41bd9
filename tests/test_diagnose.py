"""diagnose_agent CLI: replay arithmetic and end-to-end report."""

import re

import jax
import numpy as np
import pytest


def test_diagnose_agent_end_to_end(tmp_path, capsys):
    """The tool loads a saved geo snapshot, replays episodes and prints a
    per-step table whose step count and histogram totals are consistent."""
    from cmr_agent_tpu.data import SyntheticDataset, collate
    from cmr_agent_tpu.train import create_geo_state, save_checkpoint
    from cmr_agent_tpu.tools.diagnose_agent import main

    # the tool builds its own tiny/full config, so the snapshot must be
    # created at the same scale it will diagnose at
    from cmr_agent_tpu.config import tiny_config
    tcfg = tiny_config(train_batch_size=2)
    tds = SyntheticDataset(tcfg, length=2, seed=0)
    tbatch = {k: np.asarray(v)
              for k, v in collate([tds[0], tds[1]]).items()}
    tstate = create_geo_state(tcfg, tbatch, jax.random.key(0))
    tpath = str(tmp_path / "tgeo")
    save_checkpoint(tpath, {"params": tstate.params,
                            "batch_stats": tstate.batch_stats})

    main(["--geo-ckpt", tpath, "--pool-size", "2", "--batch-size", "2",
          "--scene", "random"])
    out = capsys.readouterr().out

    # the bearing-init replay path (Config.bearing_init): same report
    # shape, episodes start from the coarse bearing-aligned yaw
    main(["--geo-ckpt", tpath, "--pool-size", "2", "--batch-size", "2",
          "--scene", "random", "--pose-aware", "--bearing-init"])
    out_bi = capsys.readouterr().out
    rows_bi = re.findall(r"^\s*(\d+) \|", out_bi, flags=re.M)
    assert len(rows_bi) == tcfg.action_num + 1
    first_bi = re.search(r"^\s*0 \|\s+([\d.]+)\s+([\d.]+)", out_bi,
                         flags=re.M)
    assert first_bi and np.isfinite(float(first_bi.group(1)))

    # K+1 numbered rows in the error table
    rows = re.findall(r"^\s*(\d+) \|", out, flags=re.M)
    assert len(rows) == tcfg.action_num + 1
    # both histograms printed, one pol/exp pair per step
    assert out.count("pol ") == 2 * tcfg.action_num
    assert out.count("exp ") == 2 * tcfg.action_num
    # RTE/RRE cells are finite numbers
    first = re.search(r"^\s*0 \|\s+([\d.]+)\s+([\d.]+)", out, flags=re.M)
    assert first and np.isfinite(float(first.group(1)))


def test_diagnose_rejects_missing_ckpt(tmp_path):
    from cmr_agent_tpu.tools.diagnose_agent import main
    with pytest.raises(Exception):
        main(["--geo-ckpt", str(tmp_path / "nope"), "--pool-size", "2",
              "--batch-size", "2", "--scene", "random"])
