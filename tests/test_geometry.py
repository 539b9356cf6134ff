import numpy as np
import pytest

from same_tpu.geometry import (
    calculate_signed_area,
    delaunay_simplices,
    filter_triangles_by_radius,
    filter_triangles_collapse,
    orientation_signs_np,
    triangle_edge_lengths,
    triangle_min_angles_deg,
)


def test_signed_area_closed_form():
    # CCW unit right triangle -> +0.5
    assert calculate_signed_area((0, 0), (1, 0), (0, 1)) == pytest.approx(0.5)
    # CW -> -0.5
    assert calculate_signed_area((0, 0), (0, 1), (1, 0)) == pytest.approx(-0.5)
    # Collinear -> 0
    assert calculate_signed_area((0, 0), (1, 1), (2, 2)) == pytest.approx(0.0)


def test_orientation_signs_batched():
    pts = np.array([[0, 0], [1, 0], [0, 1], [2, 2]], dtype=float)
    tris = np.array([[0, 1, 2], [0, 2, 1], [0, 1, 3]])
    signs = orientation_signs_np(pts, tris)
    assert signs[0] == 1
    assert signs[1] == -1
    # (0,0),(1,0),(2,2): cross = 1*2 - 0*2 = 2 -> CCW
    assert signs[2] == 1


def test_orientation_rounding_matches_reference_rule():
    # Cross product of 0.0004 rounds to 0.000 at 3 decimals -> degenerate.
    pts = np.array([[0, 0], [1, 0], [2, 0.0004]], dtype=float)
    tris = np.array([[0, 1, 2]])
    assert orientation_signs_np(pts, tris, round_decimals=3)[0] == 0
    assert orientation_signs_np(pts, tris)[0] == 1


def test_edge_lengths_and_angles():
    pts = np.array([[0, 0], [3, 0], [0, 4]], dtype=float)
    tris = np.array([[0, 1, 2]])
    e = triangle_edge_lengths(pts, tris)[0]
    assert sorted(e.tolist()) == pytest.approx([3.0, 4.0, 5.0])
    # 3-4-5 right triangle: min angle = atan(3/4) ~= 36.87 deg
    assert triangle_min_angles_deg(pts, tris)[0] == pytest.approx(36.8699, abs=1e-3)


def test_delaunay_square():
    pts = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=float)
    tris = delaunay_simplices(pts)
    assert tris.shape == (2, 3)
    # Together the two triangles cover all four vertices.
    assert set(tris.ravel().tolist()) == {0, 1, 2, 3}


def test_filter_by_radius_strict():
    pts = np.array([[0, 0], [1, 0], [0, 1], [10, 10]], dtype=float)
    tris = np.array([[0, 1, 2], [1, 2, 3]])
    kept = filter_triangles_by_radius(pts, tris, radius=5, min_angle_deg=None)
    assert kept.shape == (1, 3)
    assert kept[0].tolist() == [0, 1, 2]
    # Radius test is strict <: an edge exactly equal to radius is dropped.
    kept2 = filter_triangles_by_radius(
        pts, np.array([[0, 1, 2]]), radius=1.0, min_angle_deg=None
    )
    assert kept2.shape[0] == 0


def test_filter_min_angle():
    # Thin sliver triangle gets dropped at min_angle 15.
    pts = np.array([[0, 0], [10, 0], [5, 0.1]], dtype=float)
    tris = np.array([[0, 1, 2]])
    assert filter_triangles_by_radius(pts, tris, 100, min_angle_deg=15).shape[0] == 0
    assert filter_triangles_by_radius(pts, tris, 100, min_angle_deg=None).shape[0] == 1


def test_same_type_filter_with_addback():
    # Two triangles: one mixed-type, one same-type. Node 3 only appears in the
    # same-type triangle, so that triangle is added back for it.
    pts = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=float)
    tris = np.array([[0, 1, 2], [1, 2, 3]])
    types = np.array(["a", "b", "b", "b"])
    kept, unconstrained = filter_triangles_by_radius(
        pts,
        tris,
        radius=10,
        cell_types=types,
        ignore_same_type_triangles=True,
        remove_unconstrained_nodes=True,
        min_angle_deg=None,
    )
    assert [t.tolist() for t in kept] == [[0, 1, 2], [1, 2, 3]]
    assert unconstrained == set()

    # Without the add-back, node 3 keeps no triangle but is NOT unconstrained
    # (it has a geometrically valid triangle).
    kept2 = filter_triangles_by_radius(
        pts,
        tris,
        radius=10,
        cell_types=types,
        ignore_same_type_triangles=True,
        ensure_min_triangle_per_node=False,
        min_angle_deg=None,
    )
    assert [t.tolist() for t in kept2] == [[0, 1, 2]]


def test_unconstrained_nodes_reported():
    pts = np.array([[0, 0], [1, 0], [0, 1], [100, 100]], dtype=float)
    tris = np.array([[0, 1, 2], [1, 2, 3]])
    kept, unconstrained = filter_triangles_by_radius(
        pts, tris, radius=5, remove_unconstrained_nodes=True, min_angle_deg=None
    )
    assert unconstrained == {3}


def test_collapse_filter_uses_inclusive_rmax():
    # Metacell-collapse filter keeps edges == r_max (reference uses > r_max to drop).
    pts = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
    tris = np.array([[0, 1, 2]])
    assert filter_triangles_collapse(pts, tris, r_max=np.sqrt(2), min_angle_deg=None).shape[0] == 1
    assert filter_triangles_collapse(pts, tris, r_max=1.0, min_angle_deg=None).shape[0] == 0


def test_orient_jax_matches_numpy(rng):
    import jax.numpy as jnp

    from same_tpu.ops.orient import triangle_orientation

    pts = rng.normal(size=(50, 2))
    tris = delaunay_simplices(pts)
    np_signs = orientation_signs_np(pts, tris)
    jx_signs = np.asarray(triangle_orientation(jnp.asarray(pts), jnp.asarray(tris)))
    assert (np_signs == jx_signs).all()


def test_matched_triangle_flips():
    import jax.numpy as jnp

    from same_tpu.ops.orient import matched_triangle_flips, triangle_orientation

    pts = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]])
    # Reference coords: swap points 0 and 1 -> first triangle flips.
    ref = pts[[1, 0, 2, 3]]
    match = np.array([0, 1, 2, 3])
    src = triangle_orientation(jnp.asarray(pts), jnp.asarray(tris))
    checked, flipped = matched_triangle_flips(
        jnp.asarray(ref),
        jnp.asarray(tris),
        jnp.ones(2, bool),
        jnp.asarray(match),
        src,
    )
    assert np.asarray(checked).all()
    assert np.asarray(flipped).tolist() == [True, False]

    # Unmatched vertex -> not checked.
    match2 = np.array([-1, 1, 2, 3])
    checked2, flipped2 = matched_triangle_flips(
        jnp.asarray(ref), jnp.asarray(tris),
        jnp.ones(2, bool), jnp.asarray(match2), src,
    )
    assert np.asarray(checked2).tolist() == [False, True]
    assert np.asarray(flipped2).tolist() == [False, False]
