"""Regeneration parity: create_full_benchmark(seed=8899) == committed paper data.

The committed CSVs (reference examples/synthetic/data/) were produced by
``np.random.seed(8899); create_full_benchmark()`` (reference
reproduce_figures.ipynb cell 27). Everything except the GP-displaced query
coordinates reproduces bit-exactly; query X/Y carry a <=~2e-3 residual
because numpy's multivariate_normal transform takes an SVD of the
near-degenerate RBF kernel and the degenerate-subspace basis depends on the
LAPACK build (verified: svd path 1.8e-3, eigh/cholesky paths 0.4 — the
draw path itself is right).
"""

import os

import numpy as np
import pandas as pd
import pytest

from same_tpu.synthetic import create_full_benchmark

DATA = "/root/reference/examples/synthetic/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{DATA}/ref.csv"),
    reason="committed paper dataset not available",
)


@pytest.fixture(scope="module")
def regen():
    return create_full_benchmark(seed=8899)


def test_ref_frame_bit_exact(regen):
    ref_df = regen[0]
    committed = pd.read_csv(f"{DATA}/ref.csv", index_col=0)
    assert ref_df.shape == committed.shape
    for col in ["X", "Y", "c1", "c2", "c3"]:
        np.testing.assert_allclose(
            ref_df[col].values, committed[col].values, rtol=0, atol=1e-12
        )
    assert (ref_df["cell_type"].values == committed["cell_type"].values).all()
    assert (ref_df["quadrant"].values == committed["quadrant"].values).all()
    assert (ref_df["cell_idx"].values == committed["cell_idx"].values).all()


def test_query_frame_matches(regen):
    query_df = regen[1]
    committed = pd.read_csv(f"{DATA}/query.csv", index_col=0)
    assert query_df.shape == committed.shape
    # Probabilities are bit-exact; coordinates carry the LAPACK residual.
    for col in ["c1", "c2", "c3"]:
        np.testing.assert_allclose(
            query_df[col].values, committed[col].values, rtol=0, atol=1e-12
        )
    for col in ["X", "Y"]:
        np.testing.assert_allclose(
            query_df[col].values, committed[col].values, rtol=0, atol=5e-3
        )
    assert (query_df["cell_type"].values == committed["cell_type"].values).all()
    assert (query_df["quadrant"].values == committed["quadrant"].values).all()


def test_ground_truth_exact(regen):
    gt = regen[3]
    committed = pd.read_csv(f"{DATA}/ground_truth.csv", index_col=0)
    assert gt.shape == committed.shape
    assert (gt["query_idx"].values == committed["query_idx"].values).all()
    assert (gt["ref_idx"].values == committed["ref_idx"].values).all()
    # The committed-data quirk: unmatched bottom-left rows point at
    # ref_offset - 1 (= 299), not -1.
    assert (committed["ref_idx"].values == 299).sum() > 0


def test_quadrant_structure(regen):
    quadrants = regen[2]
    assert set(quadrants) == {
        "top_left", "top_right", "bottom_right", "bottom_left"
    }
    br = quadrants["bottom_right"]
    assert len(br["swapped_pairs"]) == 3
    gt = br["ground_truth_ref_idx"]
    assert (gt != np.arange(len(gt))).sum() == 6  # 3 swapped pairs
