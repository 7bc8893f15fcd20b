"""Multi-process runtime test — the analog of the reference's
NUM_MPI_PROCS>1 CTest runs actually spanning PROCESS boundaries
(SURVEY.md §2.8 row 1: MPI/Teuchos::Comm -> jax.distributed).

Two OS processes join a jax.distributed cluster over localhost, each
contributing 2 virtual CPU devices; the distributed CG over the resulting
4-device global mesh must reproduce the serial iteration count exactly.
This exercises feddlib_tpu.parallel.multihost end-to-end (coordinator
bring-up, global device axis spanning processes, replicated host setup,
collectives across the process boundary).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_cg_matches_serial():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"worker {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("MULTIHOST_RESULT")]
        assert lines, f"worker {pid} produced no result:\n{out[-2000:]}"
        results.append(lines[0])
    # both processes observed the same converged distributed solve
    f0 = dict(kv.split("=") for kv in results[0].split()[1:])
    f1 = dict(kv.split("=") for kv in results[1].split()[1:])
    assert f0["iters"] == f1["iters"] == f0["serial_iters"]
    assert f0["procs"] == "2" and f0["devices"] == "4"
    # production stack (pipeline assembly + two-level GDSW GMRES) also
    # crossed the process boundary with serial-equal iterations
    pipe_lines = []
    for pid, out in enumerate(outs):
        ln = [x for x in out.splitlines()
              if x.startswith("MULTIHOST_PIPELINE")]
        assert ln, f"worker {pid} ran no pipeline stage:\n{out[-2000:]}"
        pipe_lines.append(dict(kv.split("=") for kv in ln[0].split()[1:]))
    assert (pipe_lines[0]["iters"] == pipe_lines[1]["iters"]
            == pipe_lines[0]["serial_iters"])
