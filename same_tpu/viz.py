"""Visualization utilities for benchmarks and matchings.

Counterparts to the reference's plotting helpers
(src/synthetic_datagen.py:646-1239): benchmark overview panels, match-line
overlays, and triangle-violation maps. Figures only — no solver coupling.
All functions return the matplotlib Figure for saving/notebook display.
"""

from __future__ import annotations

import numpy as np

CLASS_COLORS = {"c1": "#FF692A", "c2": "#9810FA", "c3": "#31C950"}


def _colors_for(types):
    uniq = sorted(set(types))
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("tab10")
    lookup = {
        t: CLASS_COLORS.get(t, cmap(i % 10)) for i, t in enumerate(uniq)
    }
    return [lookup[t] for t in types], lookup


def visualize_benchmark(ref_df, query_df, figsize=(14, 4)):
    """Three-panel overview: reference, query, and overlay."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=figsize)
    for ax, df, title in [
        (axes[0], ref_df, "reference / template"),
        (axes[1], query_df, "query / moving"),
    ]:
        colors, _ = _colors_for(df["cell_type"])
        ax.scatter(df["X"], df["Y"], c=colors, s=12)
        ax.set_title(title)
        ax.set_aspect("equal")
    axes[2].scatter(ref_df["X"], ref_df["Y"], c="lightgray", s=12, label="ref")
    colors, _ = _colors_for(query_df["cell_type"])
    axes[2].scatter(query_df["X"], query_df["Y"], c=colors, s=8, label="query")
    axes[2].set_title("overlay")
    axes[2].set_aspect("equal")
    fig.tight_layout()
    return fig


def visualize_matches(
    matches_df, ref_df=None, query_df=None, max_lines=5000, figsize=(7, 7)
):
    """Match-line plot: segments from query positions to matched ref positions.

    Violating matches (``triangle_violation``) drawn in red.
    """
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize)
    if ref_df is not None:
        ax.scatter(ref_df["X"], ref_df["Y"], c="lightgray", s=8)
    sub = matches_df.head(max_lines)
    viol = (
        sub["triangle_violation"].to_numpy()
        if "triangle_violation" in sub.columns
        else np.zeros(len(sub), bool)
    )
    for flag, color, alpha in [(False, "steelblue", 0.4), (True, "crimson", 0.8)]:
        rows = sub[viol == flag]
        for _, row in rows.iterrows():
            ax.plot(
                [row["X"], row["ref_X"]],
                [row["Y"], row["ref_Y"]],
                color=color,
                alpha=alpha,
                linewidth=0.6,
            )
    ax.scatter(sub["X"], sub["Y"], c="black", s=4)
    ax.set_aspect("equal")
    ax.set_title(
        f"{len(matches_df)} matches, "
        f"{int(viol.sum())} in flipped triangles"
    )
    fig.tight_layout()
    return fig


def visualize_triangulation(
    coords, triangles, flipped=None, figsize=(7, 7)
):
    """Triangulation wireframe; flipped triangles filled red."""
    import matplotlib.pyplot as plt

    coords = np.asarray(coords, dtype=float)
    triangles = np.asarray(triangles, dtype=int).reshape(-1, 3)
    fig, ax = plt.subplots(figsize=figsize)
    ax.triplot(
        coords[:, 0], coords[:, 1], triangles, color="gray", linewidth=0.5
    )
    if flipped is not None and np.asarray(flipped).any():
        flipped = np.asarray(flipped, bool)
        for tri in triangles[flipped[: len(triangles)]]:
            ax.fill(coords[tri, 0], coords[tri, 1], color="crimson", alpha=0.5)
    ax.set_aspect("equal")
    fig.tight_layout()
    return fig


def plot_window_grid(matches_df, figsize=(7, 7)):
    """Scatter of matches colored by window_id (sliding-window diagnostics)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize)
    sc = ax.scatter(
        matches_df["X"], matches_df["Y"], c=matches_df["window_id"],
        cmap="tab20", s=6,
    )
    fig.colorbar(sc, ax=ax, label="window_id")
    ax.set_aspect("equal")
    fig.tight_layout()
    return fig
