import numpy as np
import pandas as pd
import pytest

from same_tpu import MetaCell, greedy_triangle_collapse, unpack_metacell_matches


def _cells(rng, n_side=12):
    g = np.stack(np.meshgrid(np.arange(n_side), np.arange(n_side)), -1).reshape(
        -1, 2
    ).astype(float)
    g += rng.normal(0, 0.05, g.shape)
    df = pd.DataFrame({"X": g[:, 0], "Y": g[:, 1]})
    # Half-plane split ensures plenty of same-type triangles to merge.
    df["cell_type"] = np.where(g[:, 0] < n_side / 2, "a", "b")
    df["Cell_Num_Old"] = np.arange(len(df))
    df["prob_a"] = np.where(df["cell_type"] == "a", 90.0, 10.0)
    return df


def test_ms1_is_no_merge(rng):
    df = _cells(rng)
    mc = greedy_triangle_collapse(
        df, max_metacell_size=1, r_max=2, min_angle_deg=5,
        return_object=True, verbose=False,
    )
    assert len(mc.metacell_df) == len(df)
    assert (mc.metacell_df["size"] == 1).all()
    assert len(mc.metacell_delaunay) > 0  # filtered Delaunay still built


def test_collapse_reduces_and_preserves_members(rng):
    df = _cells(rng)
    mc = greedy_triangle_collapse(
        df, max_metacell_size=3, r_max=2, min_angle_deg=10,
        return_object=True, verbose=False,
    )
    mdf = mc.metacell_df
    assert len(mdf) < len(df)
    assert mdf["size"].max() <= 3
    # Members partition the original IDs.
    all_members = [m for ms in mdf["members"] for m in ms]
    assert sorted(all_members) == sorted(df["Cell_Num_Old"].tolist())
    # Sizes consistent with member counts.
    assert (mdf["size"] == mdf["members"].apply(len)).all()
    # Merged metacells are same-type and centroids are member means.
    big = mdf[mdf["size"] > 1]
    assert len(big) > 0
    src = df.set_index("Cell_Num_Old")
    for _, row in big.head(5).iterrows():
        mem = src.loc[row["members"]]
        assert (mem["cell_type"] == row["cell_type"]).all()
        assert row["X"] == pytest.approx(mem["X"].mean())
        assert row["prob_a"] == pytest.approx(mem["prob_a"].mean())


def test_sequential_metacell_ids(rng):
    df = _cells(rng)
    mdf, tris = greedy_triangle_collapse(
        df, max_metacell_size=3, r_max=2, verbose=False
    )
    assert mdf["metacell_id"].tolist() == list(range(len(mdf)))
    if len(tris):
        assert tris.max() < len(mdf)


def test_duplicate_ids_raise(rng):
    df = _cells(rng)
    df.loc[1, "Cell_Num_Old"] = df.loc[0, "Cell_Num_Old"]
    with pytest.raises(ValueError, match="must be unique"):
        greedy_triangle_collapse(df, verbose=False)


def test_unpack_distribute_ref_individual():
    mc_df = pd.DataFrame({"members": [[10, 11], [12]]})
    matches = pd.DataFrame(
        {"Aligned_metacell_id": [0, 1], "Ref_metacell_id": [5, 7]}
    )
    out = unpack_metacell_matches(matches, mc_df, pd.DataFrame({"X": [0]}))
    assert out.to_dict("records") == [
        {"Aligned_cell_id": 10, "Ref_cell_id": 5},
        {"Aligned_cell_id": 11, "Ref_cell_id": 5},
        {"Aligned_cell_id": 12, "Ref_cell_id": 7},
    ]


def test_unpack_distribute_round_robin():
    mc_a = pd.DataFrame({"members": [[1, 2, 3, 4, 5]]})
    mc_r = pd.DataFrame({"members": [[100, 200]]})
    matches = pd.DataFrame({"Aligned_metacell_id": [0], "Ref_metacell_id": [0]})
    out = unpack_metacell_matches(matches, mc_a, mc_r, strategy="distribute")
    assert out["Ref_cell_id"].tolist() == [100, 200, 100, 200, 100]


def test_unpack_nearest_with_tiling():
    # 3 aligned members, 2 ref members -> tiling; nearest pairs win.
    mc_a = pd.DataFrame({"members": [[0, 1, 2]]})
    mc_r = pd.DataFrame({"members": [[0, 1]]})
    matches = pd.DataFrame({"Aligned_metacell_id": [0], "Ref_metacell_id": [0]})
    aligned = pd.DataFrame({"X": [0.0, 10.0, 0.1], "Y": [0.0, 0.0, 0.0]})
    ref = pd.DataFrame({"X": [0.0, 10.0], "Y": [0.0, 0.0]})
    out = unpack_metacell_matches(
        matches, mc_a, mc_r, aligned_df=aligned, ref_df=ref, strategy="nearest"
    )
    got = dict(zip(out["Aligned_cell_id"], out["Ref_cell_id"]))
    assert got[1] == 1          # far point pairs with far ref
    assert got[0] == 0 and got[2] == 0  # both near points reuse ref 0 via tiling


def test_unpack_accepts_metacell_objects(rng):
    # Passing MetaCell collapse results directly (the notebook / sweep
    # calling convention) must supply metacell_df + original_df + id col.
    df = _cells(rng)
    mc_a = greedy_triangle_collapse(
        df, max_metacell_size=3, r_max=2, return_object=True, verbose=False
    )
    mc_r = greedy_triangle_collapse(
        df, max_metacell_size=3, r_max=2, return_object=True, verbose=False
    )
    n = min(len(mc_a.metacell_df), len(mc_r.metacell_df), 20)
    matches = pd.DataFrame(
        {"Aligned_metacell_id": np.arange(n), "Ref_metacell_id": np.arange(n)}
    )
    out = unpack_metacell_matches(matches, mc_a, mc_r, strategy="nearest")
    assert {"Aligned_cell_id", "Ref_cell_id"} <= set(out.columns)
    # Every aligned member of the matched metacells appears exactly once.
    expect = sorted(
        m for ms in mc_a.metacell_df.iloc[:n]["members"] for m in ms
    )
    assert sorted(out["Aligned_cell_id"].tolist()) == expect
    # Ref ids are drawn from the matched ref metacells' members.
    allowed = {m for ms in mc_r.metacell_df.iloc[:n]["members"] for m in ms}
    assert set(out["Ref_cell_id"]) <= allowed


def test_metacell_roundtrip_helpers(rng):
    df = _cells(rng)
    mc = greedy_triangle_collapse(
        df, max_metacell_size=3, r_max=2, return_object=True, verbose=False
    )
    xy = mc.metacell_delaunay_to_xy()
    assert xy.shape[1:] == (3, 2)
    rows = mc.original_delaunay_to_row_indices()
    assert rows.shape[1] == 3
    summary = mc.to_summary_dict()
    assert summary["n_original"] == len(df)
    assert summary["n_metacells"] == len(mc.metacell_df)
