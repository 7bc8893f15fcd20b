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
    # golden: square.mesh with the reference laplace XMLs converges in 8
    # two-level-Schwarz GMRES iterations (f64, deterministic RCB)
    assert iters == 8, iters


def test_laplace_driver_structured_3d():
    r = _run(["drivers/laplace.py", "--cpu", "--dim", "3", "--n", "8",
              "--subdomains", "8"])
    assert r.returncode == 0, r.stderr[-2000:]
    # golden iteration count (f64, deterministic RCB, 8 subdomains)
    it_line = [l for l in r.stdout.splitlines()
               if "GMRES iterations:" in l][0]
    iters = int(it_line.split("GMRES iterations:")[1].split()[0])
    assert abs(iters - 10) <= 1, iters


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
    line = [l for l in r.stdout.splitlines() if "consolidation:" in l][0]
    # golden observables (f64): max|p| 1.4150e-01 -> 1.2751e-01,
    # settlement -1.07034e-02 (Terzaghi-like decay: pressure MUST drop)
    p0 = float(line.split("max|p|")[1].split("->")[0])
    p1 = float(line.split("->")[1].split(";")[0])
    settle = float(line.split("settlement =")[1])
    assert abs(p0 - 1.4150e-01) / 1.4150e-01 < 1e-3
    assert abs(p1 - 1.2751e-01) / 1.2751e-01 < 1e-3
    assert abs(settle - (-1.07034e-02)) / 1.07034e-02 < 1e-3
    assert p1 < p0


def test_geometry_driver():
    r = _run(["drivers/geometry.py", "--cpu"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "all positive: True" in r.stdout
    line = [l for l in r.stdout.splitlines() if "moved mesh" in l][0]
    # golden: max|g| = 0.1000 (the imposed boundary motion), min element
    # volume 1.159e-02 after motion
    gmax = float(line.split("max|g| =")[1].split(",")[0])
    vmin = float(line.split("min |elem vol| =")[1].split()[0])
    assert abs(gmax - 0.1) < 1e-6
    assert abs(vmin - 1.159e-02) / 1.159e-02 < 0.01


def test_unsteady_elasticity_driver():
    r = _run(["drivers/unsteady_elasticity.py", "--cpu", "--t-end", "0.15",
              "--n", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if "final max|d|" in l][0]
    # golden (f64 Newmark): final max|d| = 3.19400e-04
    dmax = float(line.split("final max|d| =")[1].split()[0])
    assert abs(dmax - 3.19400e-04) / 3.19400e-04 < 1e-3


@pytest.mark.slow
def test_fsi_driver_tube():
    r = _run(["drivers/fsi.py", "--cpu", "--scenario", "tube", "--n", "2",
              "--t-end", "0.04", "--dt", "0.02", "--prec", "Jacobi"],
             timeout=400)
    assert r.returncode == 0, r.stderr[-2000:]
    # golden observables (f64, deterministic): tube wall displacement and
    # interface traction after 2 steps
    d_line = [l for l in r.stdout.splitlines() if "max |d|" in l][0]
    dmax = float(d_line.split("max |d| =")[1].split()[0])
    lmax = float(d_line.split("max |lambda| =")[1].split()[0])
    assert abs(dmax - 1.13975e-03) / 1.13975e-03 < 1e-2, dmax
    assert abs(lmax - 2.28796e-01) / 2.28796e-01 < 1e-2, lmax
