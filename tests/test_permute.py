"""PermutationGather: windowed Pallas/XLA permutation plan vs numpy."""
import numpy as np
import jax.numpy as jnp
import pytest

from feddlib_tpu.la.permute import PermutationGather


@pytest.mark.parametrize("n_in,n_out,seed", [(1000, 700, 0), (5000, 5000, 1),
                                             (300, 900, 2)])
def test_permutation_gather_random(n_in, n_out, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_in, n_out)
    idx[rng.random(n_out) < 0.1] = -1  # pad slots -> 0
    pg = PermutationGather(idx, n_in)
    x = rng.standard_normal(n_in)
    y = np.asarray(pg(jnp.asarray(x)))
    expect = np.where(idx >= 0, x[np.clip(idx, 0, None)], 0.0)
    assert np.allclose(y, expect, atol=1e-12)


def test_permutation_gather_runs_spill():
    """Scattered targets (many blocks per chunk) exercise the 16-window
    auto-upgrade AND the spill path."""
    rng = np.random.default_rng(3)
    n_in = 300 * 128
    # each output jumps 23 blocks (coprime to the 300-block space):
    # >16 distinct blocks per 128-chunk
    idx = (np.arange(2000) * 2944 + rng.integers(0, 128, 2000)) % n_in
    pg = PermutationGather(idx, n_in)
    assert pg.n_win == 16 and pg.n_spill > 0
    x = rng.standard_normal(n_in)
    y = np.asarray(pg(jnp.asarray(x)))
    assert np.allclose(y, x[idx], atol=1e-12)
    # forced 8-window plan: same answer through the denser spill tail
    pg8 = PermutationGather(idx, n_in, n_win=8)
    assert pg8.n_spill > pg.n_spill
    y8 = np.asarray(pg8(jnp.asarray(x)))
    assert np.allclose(y8, x[idx], atol=1e-12)


def test_permutation_gather_f64_roundtrip():
    rng = np.random.default_rng(4)
    perm = rng.permutation(4096)
    pg = PermutationGather(perm, 4096)
    x = rng.standard_normal(4096)
    y = np.asarray(pg(jnp.asarray(x)))
    assert np.allclose(y, x[perm])
