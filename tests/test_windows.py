import numpy as np
import pandas as pd
import pytest

from same_tpu import (
    create_full_benchmark,
    merge_window_matches_unique_ref,
    sliding_window_matching,
    subset_data,
)
from same_tpu.windows import get_unprocessed_windows


@pytest.fixture(scope="module")
def benchmark():
    return create_full_benchmark(seed=8899)


def _window_params():
    return dict(
        window_size=7, overlap=2, min_cells_per_window=20, max_matches=2,
        radius=5, knn=8, no_match_penalty=10000, dist_ct_coeff=1,
        min_angle_deg=5, penalty_coeff=100, delaunay_penalty=10,
        cell_id_col="cell_idx", ignore_same_type_triangles=False,
    )


def test_subset_data_half_open():
    df = pd.DataFrame({"X": [0.0, 1.0, 2.0], "Y": [0.0, 1.0, 2.0]})
    sub = subset_data(df, 0, 2, 0, 2)
    assert len(sub) == 2  # upper bound exclusive


@pytest.fixture(scope="module")
def windowed_run(benchmark, tmp_path_factory):
    ref_df, query_df, _q, _gt, _e = benchmark
    out = tmp_path_factory.mktemp("windows")
    matches = sliding_window_matching(
        ref_df, query_df, commonCT=["c1", "c2", "c3"],
        outprefix=str(out), optim_params=_window_params(),
        verbose=False,
    )
    return matches, out, ref_df, query_df


def test_windowed_matches_cover_tissue(windowed_run):
    matches, _out, ref_df, query_df = windowed_run
    assert len(matches) >= 0.9 * len(query_df)
    assert "window_id" in matches.columns
    assert matches["window_id"].nunique() >= 2  # multiple windows solved
    # cell-type accuracy across windows stays high
    acc = (
        query_df["cell_type"].to_numpy()[matches["Aligned_cell_idx"].to_numpy()]
        == ref_df["cell_type"].to_numpy()[matches["Ref_cell_idx"].to_numpy()]
    ).mean()
    assert acc >= 0.95


def test_checkpoint_written(windowed_run):
    _m, out, *_ = windowed_run
    assert (out / "matchedDF.csv").exists()
    df = pd.read_csv(out / "matchedDF.csv")
    assert "window_id" in df.columns


def test_resume_skips_processed(windowed_run, benchmark):
    matches, out, ref_df, query_df = windowed_run
    params = _window_params()
    step = params["window_size"] - params["overlap"]
    x_min = min(ref_df["X"].min(), query_df["X"].min())
    x_max = max(ref_df["X"].max(), query_df["X"].max())
    y_min = min(ref_df["Y"].min(), query_df["Y"].min())
    y_max = max(ref_df["Y"].max(), query_df["Y"].max())
    xs = list(range(int(x_min), int(x_max), step))
    ys = list(range(int(y_min), int(y_max), step))
    todo, existing = get_unprocessed_windows(
        query_df, str(out / "matchedDF.csv"), xs, ys,
        params["window_size"], params["overlap"], cell_id_col="cell_idx",
    )
    assert existing is not None
    processed = set(existing["window_id"].unique())
    # every processed window decodes back to a coordinate not in todo
    for wid in processed:
        assert (wid % len(xs), wid // len(xs)) not in todo

    # Re-running with the same outprefix should do no new work and return
    # the same match count.
    matches2 = sliding_window_matching(
        ref_df, query_df, commonCT=["c1", "c2", "c3"],
        outprefix=str(out), optim_params=params, verbose=False,
    )
    assert len(matches2) == len(matches)


def test_merge_unique_ref(windowed_run):
    matches, *_ = windowed_run
    merged = merge_window_matches_unique_ref([matches], cell_id_col="cell_idx")
    assert merged["Aligned_cell_idx"].is_unique
    assert merged["Ref_cell_idx"].is_unique
    # maximum cardinality >= naive dedup
    assert len(merged) >= matches["Aligned_cell_idx"].nunique() * 0.9


def test_merge_prefers_non_violating():
    rows = pd.DataFrame(
        {
            "window_id": [1, 0],
            "Aligned_cell_idx": [10, 10],
            "Ref_cell_idx": [20, 20],
            "X": [0.0, 0.0],
            "Y": [0.0, 0.0],
            "filtered_violation": [False, True],
        }
    )
    merged = merge_window_matches_unique_ref([rows], cell_id_col="cell_idx")
    assert len(merged) == 1
    # non-violating row (window 1) wins over violating (window 0)
    assert merged.iloc[0]["window_id"] == 1
    assert merged.iloc[0]["filtered_violation"] == False


def test_cell_type_mismatch_raises(benchmark):
    ref_df, query_df, *_ = benchmark
    bad_ref = ref_df.copy()
    bad_ref["cell_type"] = "other"
    with pytest.raises(ValueError, match="Cell type categories differ"):
        sliding_window_matching(
            bad_ref, query_df, commonCT=["c1", "c2", "c3"],
            optim_params=_window_params(), verbose=False,
        )


def test_commonct_inference(benchmark):
    ref_df, query_df, *_ = benchmark
    # cell_type values are c1/c2/c3 which ARE probability columns -> inferable
    params = _window_params()
    params["window_size"] = 20
    params["overlap"] = 0
    matches = sliding_window_matching(
        ref_df, query_df, commonCT=None, optim_params=params, verbose=False,
    )
    assert len(matches) > 0


def test_bipartite_matching_backends_identical():
    """The Python Hopcroft-Karp fallback selects the IDENTICAL edge set as
    the native C++ backend (not just the same cardinality), so merged
    outputs do not depend on whether libsame_native.so is built
    (SURVEY §7.3 item 6 tie-break determinism)."""
    from same_tpu.utils.native import native_hopcroft_karp
    from same_tpu.windows import _hopcroft_karp_py

    rng = np.random.default_rng(7)
    checked = 0
    for trial in range(40):
        n_a = int(rng.integers(1, 60))
        n_b = int(rng.integers(1, 60))
        n_e = int(rng.integers(1, 4 * max(n_a, n_b)))
        ai = rng.integers(0, n_a, n_e)
        bi = rng.integers(0, n_b, n_e)
        native = native_hopcroft_karp(ai, bi, n_a, n_b)
        if native is None:
            pytest.skip("native library not built")
        py = _hopcroft_karp_py(ai, bi, n_a, n_b)
        np.testing.assert_array_equal(np.asarray(native), np.asarray(py))
        checked += 1
    assert checked == 40


def test_python_hk_is_maximum():
    """The fallback finds a true maximum-cardinality matching (vs scipy)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_bipartite_matching

    from same_tpu.windows import _hopcroft_karp_py

    rng = np.random.default_rng(11)
    for trial in range(25):
        n_a = int(rng.integers(1, 80))
        n_b = int(rng.integers(1, 80))
        n_e = int(rng.integers(1, 5 * max(n_a, n_b)))
        ai = rng.integers(0, n_a, n_e)
        bi = rng.integers(0, n_b, n_e)
        py = _hopcroft_karp_py(ai, bi, n_a, n_b)
        graph = csr_matrix(
            (np.ones(len(ai), dtype=np.int8), (ai, bi)), shape=(n_a, n_b)
        )
        sp = maximum_bipartite_matching(graph, perm_type="column")
        assert (py >= 0).sum() == (np.asarray(sp) >= 0).sum()


def test_pipelined_matches_sequential(benchmark):
    """The threaded window pipeline (tpu_pipeline_windows>=2, the default)
    returns the same matches, in the same order, as the strictly
    sequential path. dp=0 keeps the per-window solves deterministic (no
    wall-clock-budgeted repair), isolating the orchestration."""
    ref_df, query_df, _q, _gt, _e = benchmark
    optim = _window_params() | {"delaunay_penalty": 0}
    seq = sliding_window_matching(
        ref_df, query_df, commonCT=["c1", "c2", "c3"], optim_params=optim,
        solver_params=dict(tpu_pipeline_windows=1), verbose=False,
    )
    pipe = sliding_window_matching(
        ref_df, query_df, commonCT=["c1", "c2", "c3"], optim_params=optim,
        solver_params=dict(tpu_pipeline_windows=3), verbose=False,
    )
    key = ["Aligned_cell_idx", "Ref_cell_idx", "window_id"]
    pd.testing.assert_frame_equal(
        seq[key].reset_index(drop=True), pipe[key].reset_index(drop=True)
    )
