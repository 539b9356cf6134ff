"""First-party native (C++) components vs their scipy equivalents."""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
LIB = os.path.join(NATIVE_DIR, "libsame_native.so")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(LIB):
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            pytest.skip("no C++ toolchain available to build native lib")
    # Reset the loader cache in case an earlier test probed before the build.
    import same_tpu.utils.native as nat

    nat._TRIED = False
    nat._LIB = None


def test_native_delaunay_matches_qhull(rng):
    from scipy.spatial import Delaunay

    from same_tpu.utils.native import native_delaunay

    for n in (10, 100, 500):
        pts = rng.normal(size=(n, 2))
        ours = native_delaunay(pts)
        assert ours is not None
        qh = Delaunay(pts).simplices
        a = set(map(tuple, np.sort(ours, axis=1)))
        b = set(map(tuple, np.sort(qh, axis=1)))
        assert a == b


def test_native_delaunay_grid(rng):
    # Cocircular-prone grid input (degenerate cases for incircle tests).
    from same_tpu.utils.native import native_delaunay

    g = np.stack(np.meshgrid(np.arange(6), np.arange(6)), -1).reshape(-1, 2)
    g = g + rng.normal(0, 1e-6, g.shape)
    tris = native_delaunay(g.astype(float))
    assert tris is not None
    # Euler: triangulation of a convex region with n points, h hull points:
    # T = 2n - h - 2; for a 6x6 near-grid h == 20.
    assert len(tris) == 2 * 36 - 20 - 2


def test_native_hopcroft_karp_matches_scipy(rng):
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_bipartite_matching

    from same_tpu.utils.native import native_hopcroft_karp

    for trial in range(5):
        n_a, n_b = 40, 50
        n_e = 150
        ai = rng.integers(0, n_a, n_e)
        bi = rng.integers(0, n_b, n_e)
        ours = native_hopcroft_karp(ai, bi, n_a, n_b)
        assert ours is not None
        graph = csr_matrix((np.ones(n_e, np.int8), (ai, bi)), shape=(n_a, n_b))
        ref = maximum_bipartite_matching(graph, perm_type="column")
        # Same cardinality (matchings themselves may differ).
        assert (ours >= 0).sum() == (ref >= 0).sum()
        # Validity: matched edges exist, refs unique.
        edges = set(zip(ai.tolist(), bi.tolist()))
        used = [int(b) for b in ours if b >= 0]
        assert len(used) == len(set(used))
        for a, b in enumerate(ours):
            if b >= 0:
                assert (a, int(b)) in edges


def test_delaunay_backend_env(rng, monkeypatch):
    from same_tpu.geometry import delaunay_simplices

    pts = rng.normal(size=(50, 2))
    qh = delaunay_simplices(pts)
    monkeypatch.setenv("SAME_TPU_DELAUNAY", "native")
    nat = delaunay_simplices(pts)
    a = set(map(tuple, np.sort(qh, axis=1)))
    b = set(map(tuple, np.sort(nat, axis=1)))
    assert a == b
