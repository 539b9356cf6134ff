"""Multi-host plumbing: single-process no-op behavior + slicing math."""

import numpy as np
import pandas as pd

from same_tpu.parallel import distributed


def test_init_distributed_single_process_is_noop():
    assert distributed.init_distributed() is False


def test_host_window_slice_single_process_covers_all():
    s = distributed.host_window_slice(7)
    assert (s.start, s.stop) == (0, 7)


def test_gather_matches_single_process_identity():
    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    out = distributed.gather_matches(df)
    pd.testing.assert_frame_equal(out, df)


def test_host_window_slice_balanced(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    sizes = []
    for p in range(3):
        monkeypatch.setattr(jax, "process_index", lambda p=p: p)
        s = distributed.host_window_slice(10)
        sizes.append(s.stop - s.start)
    assert sum(sizes) == 10
    assert max(sizes) - min(sizes) <= 1
