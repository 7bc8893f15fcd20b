"""Checkpoint / resume of solution state.

The reference has NO restart capability (SURVEY.md §5: output-only
persistence) — this is an intentional capability ADD: time loops can save
(solution blocks + time-integrator history + time) and resume exactly.

Format: a single .npz per checkpoint (atomic rename), holding every block
of the solution plus named auxiliary arrays (velocity/acceleration history,
BDF history, mesh displacement) and scalar metadata."""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional

import numpy as np

from feddlib_tpu.la.block import BlockVector


def save_checkpoint(path: str, solution: BlockVector, t: float,
                    aux: Optional[Dict[str, np.ndarray]] = None,
                    meta: Optional[Dict[str, float]] = None) -> None:
    data = {f"block_{i}": np.asarray(b) for i, b in
            enumerate(solution.blocks)}
    data["_n_blocks"] = np.array(len(solution.blocks))
    data["_time"] = np.array(t)
    for k, v in (aux or {}).items():
        data[f"aux_{k}"] = np.asarray(v)
    for k, v in (meta or {}).items():
        data[f"meta_{k}"] = np.array(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **data)
        os.replace(tmp, path)  # atomic
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_checkpoint(path: str):
    """Returns (solution: BlockVector, t, aux dict, meta dict)."""
    with np.load(path) as z:
        n = int(z["_n_blocks"])
        sol = BlockVector([z[f"block_{i}"] for i in range(n)])
        t = float(z["_time"])
        aux = {k[4:]: z[k] for k in z.files if k.startswith("aux_")}
        meta = {k[5:]: float(z[k]) for k in z.files if k.startswith("meta_")}
    return sol, t, aux, meta
