"""Multi-HOST bundle adjustment: real cross-process collectives.

The 8-device virtual mesh used everywhere else lives in ONE process, so its
collectives never leave XLA's intra-process runtime. This test launches two
coordinated processes (`jax.distributed.initialize`, 4 virtual CPU devices
each) that form one 8-device global mesh and run the FULL production
`lm_solve` observation-sharded across the process boundary — the gradient /
diagonal / Schur reductions travel over Gloo exactly as they would travel
DCN between pod-slice hosts. Each process must report the identical
converged cost, and that cost must match a plain single-process solve.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, {repo!r})
import numpy as np
from caliscope_tpu.parallel import make_obs_mesh
from caliscope_tpu.solvers.bundle import BAConfig, lm_solve
import __graft_entry__ as ge

problem, cam9, X, lam = ge._toy_problem(n_cams=3, n_frames=4, seed=2)
mesh = make_obs_mesh(jax.devices())
assert jax.process_count() == 2 and len(jax.devices()) == 8
result = lm_solve(
    problem, np.asarray(cam9), np.asarray(X),
    BAConfig(solver="schur", max_iter=12, shard="always"), mesh=mesh,
)
print("RESULT %d %d %.12e %.12e" % (pid, result.n_devices, result.cost_initial, result.cost_final), flush=True)
"""


def _single_process_cost():
    import jax

    import __graft_entry__ as ge
    from caliscope_tpu.solvers.bundle import BAConfig, lm_solve

    problem, cam9, X, lam = ge._toy_problem(n_cams=3, n_frames=4, seed=2)
    result = lm_solve(
        problem, np.asarray(cam9), np.asarray(X), BAConfig(solver="schur", max_iter=12, shard="never")
    )
    return result.cost_initial, result.cost_final


def test_two_process_sharded_solve_matches_single_process(tmp_path):
    worker = _WORKER.replace("{repo!r}", repr(str(REPO)))
    script = tmp_path / "worker.py"
    script.write_text(worker)
    port = "9931"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=str(tmp_path),
        )
        for pid in (0, 1)
    ]
    results = {}
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multi-process worker hung")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, nd, ci, cf = line.split()
                results[int(pid)] = (int(nd), float(ci), float(cf))
    assert set(results) == {0, 1}, f"missing worker results: {results}"

    (nd0, ci0, cf0), (nd1, ci1, cf1) = results[0], results[1]
    assert nd0 == nd1 == 8  # one global mesh spanning both processes
    # SPMD determinism: both processes hold the identical replicated state
    assert ci0 == ci1 and cf0 == cf1
    assert cf0 < ci0

    ci_s, cf_s = _single_process_cost()
    # same problem, same solver: cross-process reduction must agree with the
    # single-placement solve to collective-summation reordering precision
    assert ci0 == pytest.approx(ci_s, rel=1e-9)
    assert cf0 == pytest.approx(cf_s, rel=1e-4)
