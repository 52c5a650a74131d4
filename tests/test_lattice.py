"""PLT dynamical-matrix physics checks."""

import numpy as np
import pytest

from zeldovich_tpu.ops.lattice import (
    dynamical_matrix,
    generate_eigmodes_table,
    growing_mode,
)


def test_kohn_sum_rule():
    """tr eps(k) = 1 for all k != 0 (exact for 1/r^2 forces)."""
    rng = np.random.default_rng(0)
    ks = rng.uniform(-np.pi, np.pi, size=(30, 3))
    eps = dynamical_matrix(ks)
    np.testing.assert_allclose(np.trace(eps, axis1=-2, axis2=-1), 1.0, atol=1e-12)


def test_continuum_limit():
    """k -> 0: growing eigenvalue -> 1, eigenvector -> k_hat."""
    k = np.array([[0.02, -0.013, 0.007]])
    khat = k / np.linalg.norm(k)
    v, w = growing_mode(dynamical_matrix(k), khat)
    assert w[0] == pytest.approx(1.0, abs=1e-4)
    assert np.dot(v[0], khat[0]) == pytest.approx(1.0, abs=1e-6)


def test_brillouin_corner_isotropic():
    """At k = (pi,pi,pi) all axes are equivalent: eps = I/3."""
    eps = dynamical_matrix(np.array([[np.pi, np.pi, np.pi]]))[0]
    np.testing.assert_allclose(eps, np.eye(3) / 3, atol=1e-10)


def test_axis_symmetry():
    """k along x: eigenvectors are the coordinate axes."""
    eps = dynamical_matrix(np.array([[2.0, 0.0, 0.0]]))[0]
    offdiag = eps - np.diag(np.diag(eps))
    np.testing.assert_allclose(offdiag, 0, atol=1e-12)
    assert eps[1, 1] == pytest.approx(eps[2, 2], rel=1e-12)


def test_ewald_parameter_independence():
    k = np.array([[1.0, -0.7, 0.3], [3.0, 2.9, -0.1]])
    e1 = dynamical_matrix(k, alpha=2.0, rcut=3.6, mcut=4)
    e2 = dynamical_matrix(k, alpha=2.6, rcut=3.0, mcut=6)
    np.testing.assert_allclose(e1, e2, atol=1e-12)


def test_reciprocal_lattice_periodicity():
    k = np.array([[0.9, -0.4, 0.2]])
    e1 = dynamical_matrix(k)
    e2 = dynamical_matrix(k + 2 * np.pi * np.array([[1, -2, 1]]))
    np.testing.assert_allclose(e1, e2, atol=1e-11)


def test_table_generation_small():
    N = 8
    t = generate_eigmodes_table(N)
    assert t.shape == (N, N, N // 2 + 1, 4)
    # unit eigenvectors
    norms = np.linalg.norm(t[..., :3], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-10)
    # eigenvalues within the physical band (continuum 1, corner 1/3,
    # axis Nyquist ~1.1)
    assert t[..., 3].min() > -0.5
    assert t[..., 3].max() < 1.5
    # corner entry (index N/2 on each axis => k = (-pi,-pi,-pi), same D)
    assert t[N // 2, N // 2, N // 2, 3] == pytest.approx(1 / 3, abs=1e-9)
    # small-k plane: nearly continuum
    assert t[1, 0, 0, 3] == pytest.approx(1.0, abs=0.05)
    # eigenvector sign convention: e . khat >= 0
    half = N // 2
    ix = np.arange(N)
    wrap = np.where(ix > half, ix - N, ix)
    wrap = np.where(ix == half, -half, wrap)
    KX, KY, KZ = np.meshgrid(wrap, wrap, np.arange(half + 1), indexing="ij")
    dots = (
        t[..., 0] * KX + t[..., 1] * KY + t[..., 2] * KZ
    )
    assert (dots >= -1e-9).all()
