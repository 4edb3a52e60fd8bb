"""Display histogram of a volume (reference: ModelBase.cpp:19-33)."""
from __future__ import annotations

import numpy as np


def compute_histogram(data: np.ndarray) -> np.ndarray:
    """Fourth-root-compressed, max-normalized 256-bin histogram.

    Matches ``ModelBase::compute_histogram``: ``sqrt(sqrt(count))`` then
    normalize by the maximum (reference: ModelBase.cpp:19-33).
    """
    arr = np.asarray(data, np.uint8)
    from volrt import native

    counts = native.histogram(arr)
    if counts is None:
        counts = np.bincount(arr.reshape(-1), minlength=256)
    hist = np.sqrt(np.sqrt(counts.astype(np.float32)))
    max_value = hist.max()
    if max_value > 0:
        hist = hist / max_value
    return hist
