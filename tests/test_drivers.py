"""Driver (CLI layer) smoke tests — the analog of the reference's CTest
registrations of the per-physics mains."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/feddlib/problems/tests"


def _run(args, timeout=240):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_laplace_driver_with_reference_configs():
    r = _run(["drivers/laplace.py", "--cpu",
              "--mesh", "/root/reference/meshes/square.mesh",
              "--precfile", f"{REF}/laplace/parametersPrec.xml",
              "--solverfile", f"{REF}/laplace/parametersSolver.xml"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "GMRES iterations:" in r.stdout
    out = [l for l in r.stdout.splitlines() if "GMRES iterations" in l][0]
    iters = int(out.split(":")[1].split()[0])
    assert 0 < iters < 100


def test_laplace_driver_structured_3d():
    r = _run(["drivers/laplace.py", "--cpu", "--dim", "3", "--n", "8",
              "--subdomains", "8"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "GMRES iterations:" in r.stdout


@pytest.mark.slow
def test_navier_stokes_driver():
    r = _run(["drivers/navier_stokes.py", "--cpu"], timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    drag_line = [l for l in r.stdout.splitlines() if l.startswith("drag=")][0]
    drag = float(drag_line.split("=")[1].split()[0])
    assert abs(drag - 14.29) / 14.29 < 0.01


def test_stokes_driver_bfs():
    r = _run(["drivers/stokes.py", "--cpu", "--h", "0.25"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "GMRES iterations:" in r.stdout
    div_line = [l for l in r.stdout.splitlines() if "div u" in l][0]
    div_val = float(div_line.split("div u| (weak) =")[1].split()[0])
    assert div_val < 1e-6


def test_tpm_driver_consolidation():
    r = _run(["drivers/tpm.py", "--cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "consolidation:" in r.stdout


def test_geometry_driver():
    r = _run(["drivers/geometry.py", "--cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all positive: True" in r.stdout


def test_unsteady_elasticity_driver():
    r = _run(["drivers/unsteady_elasticity.py", "--cpu", "--t-end", "0.15",
              "--n", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "final max|d|" in r.stdout


@pytest.mark.slow
def test_fsi_driver_tube():
    r = _run(["drivers/fsi.py", "--cpu", "--scenario", "tube", "--n", "2",
              "--t-end", "0.04", "--dt", "0.02", "--prec", "Jacobi"],
             timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "max |d|" in r.stdout
