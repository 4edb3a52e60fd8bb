"""Native C++ component tests: bit-exact parity with the Python fallbacks."""
import numpy as np
import pytest

from volrt import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)

BUCKY = "/root/reference/VolumeRendering/Bucky.pvm"


def test_dds_decode_matches_python():
    import os

    import volrt.io.pvm as pvm

    if not os.path.exists(BUCKY):
        pytest.skip("no reference asset")
    raw = open(BUCKY, "rb").read()
    body = raw[len(pvm.DDS_MAGIC_V1):]
    assert native.dds_decode(body, 0) == pvm.dds_decode(body, 0)


def test_esl_minmax_matches_numpy():
    rng = np.random.default_rng(1)
    vol = rng.integers(0, 256, (17, 23, 9), dtype=np.uint8)
    block = 8
    mn, mx = native.esl_minmax(vol, block)
    for gz in range(mn.shape[0]):
        for gy in range(mn.shape[1]):
            for gx in range(mn.shape[2]):
                blk = vol[
                    gz * block:(gz + 1) * block,
                    gy * block:(gy + 1) * block,
                    gx * block:(gx + 1) * block,
                ]
                assert mn[gz, gy, gx] == blk.min()
                assert mx[gz, gy, gx] == blk.max()


def test_histogram_matches_numpy():
    rng = np.random.default_rng(2)
    vol = rng.integers(0, 256, (1000,), dtype=np.uint8)
    assert (
        native.histogram(vol)
        == np.bincount(vol, minlength=256)
    ).all()
