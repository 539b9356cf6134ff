import numpy as np
import pandas as pd
import pytest

from same_tpu import (
    add_dirichlet_mixture_noise,
    check_alignment,
    check_triangle_violations,
    verify_spatial_preservation,
)
from same_tpu.eval import precompute_triangle_info


def test_verify_spatial_preservation_counts():
    aligned = pd.DataFrame({"X": [0.0, 1.0, 0.0], "Y": [0.0, 0.0, 1.0]})
    ref = pd.DataFrame({"X": [0.0, 1.0, 0.0], "Y": [0.0, 0.0, 1.0]})
    tris = np.array([[0, 1, 2]])
    info = precompute_triangle_info(aligned, tris)
    # Order-preserving matching: no violations.
    matches = pd.DataFrame({"aligned_idx": [0, 1, 2], "ref_idx": [0, 1, 2]})
    v = verify_spatial_preservation(aligned, ref, matches, info)
    assert v["violation_summary"]["total_violations"] == 0
    # Swap refs of points 0 and 1: only the (0,1) pair's X-order flips —
    # pairs involving point 2 compare equal-X coordinates on both sides.
    matches2 = pd.DataFrame({"aligned_idx": [0, 1, 2], "ref_idx": [1, 0, 2]})
    v2 = verify_spatial_preservation(aligned, ref, matches2, info)
    assert v2["violation_summary"]["violated_triangles"] == 1
    assert set(v2["points_with_violations"]) == {0, 1}
    assert len(v2["x_order_violations"]) == 1


def test_triangle_info_extreme_vertices():
    aligned = pd.DataFrame({"X": [0.0, 2.0, 1.0], "Y": [0.0, 0.0, 3.0]})
    info = precompute_triangle_info(aligned, np.array([[0, 1, 2]]))
    t = info[0]
    assert t["max_x_vertex"] == 1
    assert t["min_x_vertex"] == 0
    assert t["max_y_vertex"] == 2
    assert t["bounds"] == {"min_x": 0.0, "max_x": 2.0, "min_y": 0.0, "max_y": 3.0}


def test_check_alignment_k1():
    template = pd.DataFrame(
        {"X": [0.0, 10.0], "Y": [0.0, 0.0], "cell_type": ["a", "b"]}
    )
    query = pd.DataFrame(
        {"X": [0.1, 9.9, 0.2], "Y": [0.0, 0.0, 0.0], "cell_type": ["a", "b", "b"]}
    )
    qdf, score = check_alignment(query, template, "X", "Y")
    assert qdf["_1NN_match"].tolist() == [True, True, False]
    assert score == pytest.approx(2 / 3)


def test_check_alignment_k3():
    template = pd.DataFrame(
        {"X": [0.0, 1.0, 2.0], "Y": [0.0] * 3, "cell_type": ["a", "b", "c"]}
    )
    query = pd.DataFrame({"X": [0.5], "Y": [0.0], "cell_type": ["c"]})
    _q, score = check_alignment(query, template, "X", "Y", kNN=3)
    assert score == 1.0  # 'c' appears among the 3 nearest


class _FakeMC:
    def __init__(self, df, tris):
        self.metacell_df = df
        self.metacell_delaunay = tris


def test_check_triangle_violations_flip():
    src = pd.DataFrame({"X": [0.0, 1.0, 0.0, 1.0], "Y": [0.0, 0.0, 1.0, 1.0]})
    tris = np.array([[0, 1, 2], [1, 3, 2]])
    mc = _FakeMC(src, tris)
    # Mapped positions mirror X for nodes 0,1 -> first triangle flips.
    out = pd.DataFrame(
        {
            "aligned_metacell_index": [0, 1, 2, 3],
            "matched_ref_index": [0, 1, 2, 3],
            "mapped_x": [1.0, 0.0, 0.0, 1.0],
            "mapped_y": [0.0, 0.0, 1.0, 1.0],
            "cell_type": ["a", "b", "a", "b"],
        }
    )
    odf, stats = check_triangle_violations(
        out, mc, ignore_same_type_triangles=False
    )
    assert stats["triangles_with_all_matched"] == 2
    assert stats["triangles_flipped"] >= 1
    assert odf["in_violating_triangle"].sum() >= 3


def test_check_triangle_violations_node_local():
    src = pd.DataFrame({"X": [0.0, 1.0, 0.0, 1.0], "Y": [0.0, 0.0, 1.0, 1.0]})
    tris = np.array([[0, 1, 2], [1, 3, 2]])
    mc = _FakeMC(src, tris)
    out = pd.DataFrame(
        {
            "aligned_metacell_index": [0, 1, 2, 3],
            "matched_ref_index": [0, 1, 2, 3],
            "mapped_x": [1.0, 0.0, 0.0, 1.0],
            "mapped_y": [0.0, 0.0, 1.0, 1.0],
            "cell_type": ["a", "b", "a", "b"],
        }
    )
    _odf, stats = check_triangle_violations(
        out, mc, ignore_same_type_triangles=False, node_local=True,
        majority_threshold=0.9,
    )
    # Node 3 is only in the unflipped triangle -> not violating node-locally.
    assert stats["nodes_in_violating_triangles"] < 4


def test_dirichlet_noise_limits(rng):
    df = pd.DataFrame(
        {"a": [80.0, 10.0], "b": [15.0, 70.0], "c": [5.0, 20.0]}
    )
    out0 = add_dirichlet_mixture_noise(df, ["a", "b", "c"], 0.0, rng=rng)
    assert np.allclose(out0[["a", "b", "c"]].to_numpy(), df[["a", "b", "c"]])
    out1 = add_dirichlet_mixture_noise(df, ["a", "b", "c"], 1.0, rng=rng)
    assert np.allclose(out1[["a", "b", "c"]].sum(axis=1), 100.0)
    assert not np.allclose(out1[["a", "b", "c"]].to_numpy(), df[["a", "b", "c"]])
    # inplace=False leaves the original untouched
    assert df["a"].iloc[0] == 80.0
    with pytest.raises(ValueError):
        add_dirichlet_mixture_noise(df, ["a", "b", "c"], 1.5)


def test_dirichlet_noise_monotone_degradation(rng):
    # Accuracy of argmax labels should degrade as noise grows.
    n = 500
    true = rng.integers(0, 3, n)
    probs = np.full((n, 3), 5.0)
    probs[np.arange(n), true] = 90.0
    df = pd.DataFrame(probs, columns=["a", "b", "c"])
    accs = []
    for eta in [0.0, 0.5, 1.0]:
        out = add_dirichlet_mixture_noise(
            df, ["a", "b", "c"], eta, rng=np.random.default_rng(0)
        )
        accs.append((out[["a", "b", "c"]].to_numpy().argmax(1) == true).mean())
    assert accs[0] == 1.0
    assert accs[0] >= accs[1] >= accs[2]
    assert accs[2] < 0.8


class TestTopkTypeMatch:
    """topk_type_match reproduces reference LUAD notebook cells 12-13."""

    def _fixture(self):
        import pandas as pd

        matches = pd.DataFrame(
            {
                "Aligned_cell_id": [0, 1, 2, 3],
                "Ref_cell_id": ["r0", "r1", "r2", "r_missing"],
            }
        )
        aligned_types = pd.Series(["a", "b", "c", "a"], index=[0, 1, 2, 3])
        # r0: a dominant; r1: a > b > c (b only matches at k=2);
        # r2: a > b > c (c only matches at k=3); r_missing absent.
        ref_probs = pd.DataFrame(
            {
                "a": [0.9, 0.5, 0.5],
                "b": [0.05, 0.3, 0.3],
                "c": [0.05, 0.2, 0.2],
            },
            index=["r0", "r1", "r2"],
        )
        return matches, aligned_types, ref_probs

    def test_scores(self):
        from same_tpu.eval import topk_type_match

        matches, types, probs = self._fixture()
        out, scores = topk_type_match(matches, types, probs, ["a", "b", "c"])
        # k=1: only row 0 (a vs top-1 a). Missing ref row counts in denom.
        assert scores[1] == pytest.approx(1 / 4)
        # k=2: rows 0 and 1 (b in {a,b}).
        assert scores[2] == pytest.approx(2 / 4)
        # k=3: rows 0, 1, 2; missing-ref row still False.
        assert scores[3] == pytest.approx(3 / 4)
        for k in (1, 2, 3):
            assert f"top_{k}_match" in out.columns
        assert not out["top_1_match"].iloc[3]

    def test_missing_aligned_type_counts_false(self):
        import pandas as pd

        from same_tpu.eval import topk_type_match

        matches, types, probs = self._fixture()
        types = types.drop(0)  # row 0's aligned id now has no type label
        out, scores = topk_type_match(matches, types, probs, ["a", "b", "c"])
        assert scores[1] == 0.0
        assert scores[3] == pytest.approx(2 / 4)

    def test_reference_parity_vectorization(self):
        """Against a direct transcription of the reference's notebook code."""
        import pandas as pd

        rng = np.random.default_rng(5)
        cts = ["t0", "t1", "t2", "t3", "t4"]
        n = 200
        matches = pd.DataFrame(
            {
                "Aligned_cell_id": np.arange(n),
                "Ref_cell_id": rng.integers(0, 150, n),
            }
        )
        types = pd.Series(rng.choice(cts, n), index=np.arange(n))
        probs = pd.DataFrame(
            rng.random((120, len(cts))), columns=cts, index=np.arange(120)
        )
        from same_tpu.eval import topk_type_match

        out, scores = topk_type_match(matches, types, probs, cts)

        # Reference transcription (reproduce_figures.ipynb cell 13).
        valid = matches["Ref_cell_id"].isin(probs.index)
        ref_rows = probs[cts].astype(float).loc[
            matches.loc[valid, "Ref_cell_id"]
        ].values
        ct_array = np.array(cts)
        dom_types = (
            matches["Aligned_cell_id"].map(types).to_numpy()[valid.to_numpy()]
        )
        for k in [1, 2, 3]:
            expect = np.zeros(len(matches), dtype=bool)
            top_k_idx = np.argpartition(ref_rows, -k, axis=1)[:, -k:]
            top_k_types = ct_array[top_k_idx]
            expect[valid.values] = np.any(
                top_k_types == dom_types[:, np.newaxis], axis=1
            )
            np.testing.assert_array_equal(
                out[f"top_{k}_match"].to_numpy(), expect
            )
            assert scores[k] == pytest.approx(expect.mean())
