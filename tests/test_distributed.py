"""True multi-process distributed test — the reference ddp_sim analogue.

The reference's ddp_sim trainer is 2 DDP *processes* on CPU
(/root/reference/configs/trainer/ddp_sim.yaml). The in-process 8-device CPU
mesh (conftest) covers sharding semantics but never exercises
parallel.distributed.initialize / cross-process collectives. This test
spawns 2 real processes, wires jax.distributed over a localhost
coordinator, runs one dp-sharded TG train step on a 4-device global mesh
(2 local CPU devices per process), and asserts the loss matches a
single-process run of the same global batch.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_tg_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nprocs: int, port: int, timeout: int = 600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env)
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def _parse(out: str) -> tuple[float, float]:
    m = re.search(r"LOSS ([-\d.]+) GNORM ([-\d.]+)", out)
    assert m, f"worker produced no LOSS line:\n{out[-2000:]}"
    return float(m.group(1)), float(m.group(2))


def test_two_process_dp_train_step_matches_single_process():
    port = _free_port()
    procs, outs = _run_workers(2, port)
    for p, out in zip(procs, outs):
        if "SKIP" in out:
            pytest.skip(out.split("SKIP", 1)[1].strip()[:200])
        assert p.returncode == 0, out[-2000:]
    loss0, gnorm0 = _parse(outs[0])
    loss1, gnorm1 = _parse(outs[1])
    # both processes hold the same replicated results
    assert loss0 == pytest.approx(loss1, rel=1e-6)
    assert gnorm0 == pytest.approx(gnorm1, rel=1e-6)

    # single-process reference on the identical global batch
    procs1, outs1 = _run_workers(1, _free_port())
    assert procs1[0].returncode == 0, outs1[0][-2000:]
    loss_ref, gnorm_ref = _parse(outs1[0])
    assert loss0 == pytest.approx(loss_ref, rel=1e-5)
    # grad-norm reduction order differs (4-way vs 2-way psum groups): f32
    # noise only
    assert gnorm0 == pytest.approx(gnorm_ref, rel=1e-3)
