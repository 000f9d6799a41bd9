"""Multi-host entry point: 2-process CPU smoke test.

The TPU-native analog of testing multi-node without a cluster
(SURVEY.md §4): two local processes connect through
``jax.distributed.initialize`` over a localhost coordinator, build a
global dp mesh spanning both processes' devices, assemble global arrays
from per-process local batches and run a cross-process reduction.
"""

import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])

    from cmr_agent_tpu.parallel.distributed import (
        initialize, host_local_batch_to_global, shard_range)
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    from cmr_agent_tpu.parallel import make_mesh

    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == 2 * n_local, (n_global, n_local)

    mesh = make_mesh((n_global,), ("dp",))

    # per-process local batch: process i holds rows [i*n_local, ...)
    local = np.arange(n_local, dtype=np.float32) + pid * n_local
    batch = host_local_batch_to_global({"x": local[:, None]}, mesh)
    total = float(jax.jit(lambda b: b["x"].sum())(batch))
    want = sum(range(n_global))
    assert total == want, (total, want)

    sr = shard_range(10)
    assert len(sr) == 5 and (sr.start == 0) == (pid == 0)
    print(f"proc {pid} OK {total}")
""")


def _run_pair(port):
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo")
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        outs.append((p.returncode, out, err))
    return outs


def test_two_process_cpu_smoke():
    # bind-then-close port discovery is racy (another process can claim
    # the port before the coordinator binds it) — retry on a fresh port
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        outs = _run_pair(port)
        if (attempt < 2
                and any("address already in use" in err.lower()
                        or "failed to bind" in err.lower()
                        for _, _, err in outs)):
            continue
        break
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "OK" in out
