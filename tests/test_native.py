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


def _encode_dds_body(values, skip=1, strip=1, bits=8):
    """Minimal DDS body encoder (test-only): one group, fixed residual
    width, first/second-order strip predictor — the inverse of dds_decode."""
    deltas = []
    prev = 0
    half = (1 << bits) // 2 if bits else 0
    for i, v in enumerate(values):
        if strip == 1 or i <= strip:
            pred = prev
        else:
            pred = (prev + values[i - strip] - values[i - strip - 1]) % 256
        deltas.append((v - pred + half) % 256)
        prev = v
    out = []
    acc, nacc = 0, 0

    def put(val, nbits):
        nonlocal acc, nacc
        acc = (acc << nbits) | (val & ((1 << nbits) - 1))
        nacc += nbits
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 255)
            nacc -= 8

    put(skip - 1, 2)
    put(strip - 1, 16)
    assert len(values) < 128
    put(len(values), 7)
    put(bits - 1, 3)  # width code b -> b+1 bits (b >= 1)
    for dlt in deltas:
        put(dlt, bits)
    put(0, 7)  # terminating zero-count group
    if nacc:
        put(0, 8 - nacc)
    return bytes(out)


def test_dds_decode_strip1_matches_python():
    """strip==1 streams always use the first-order predictor
    (reference ddsbase.cpp:215); regression test for the native predicate."""
    import volrt.io.pvm as pvm

    values = [10, 20, 5, 200, 7, 13, 250, 0, 99, 128]
    body = _encode_dds_body(values, strip=1)
    expect = pvm.dds_decode(body, 0)
    assert list(expect) == values  # encoder sanity vs the Python decoder
    assert native.dds_decode(body, 0) == expect


def test_dds_decode_strip3_matches_python():
    """Second-order strip predictor parity on a synthetic strip>1 stream."""
    import volrt.io.pvm as pvm

    values = [1, 5, 9, 2, 250, 31, 44, 7, 0, 255, 128, 64]
    body = _encode_dds_body(values, strip=3)
    expect = pvm.dds_decode(body, 0)
    assert list(expect) == values
    assert native.dds_decode(body, 0) == expect


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


def test_quantize16_matches_python_bit_exact():
    """Native gradient-weighted 16->8 quantize == the numpy path byte
    for byte (the cap rounds replicate numpy's pairwise summation, so
    even the fp-sensitive outlier capping agrees)."""
    import os

    import volrt.io.pvm as pvm

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(42)
    for shape in [(8, 8, 8), (16, 12, 10), (1, 1, 7)]:
        base = (rng.random(shape) * 60000).astype(np.uint16)
        zz = np.indices(shape).sum(0)
        v16 = ((base // 4) + (zz * 997 % 30000)).astype(np.uint16)
        data = np.stack([(v16 >> 8).astype(np.uint8),
                         (v16 & 255).astype(np.uint8)], axis=-1)
        for linear in (False, True):
            os.environ["VOLRT_NATIVE"] = "0"
            native._tried = False
            native._lib = None
            try:
                py = pvm.quantize16(data, linear=linear)
            finally:
                os.environ.pop("VOLRT_NATIVE", None)
                native._tried = False
                native._lib = None
            nat = native.quantize16(v16, linear=linear)
            assert nat is not None
            assert np.array_equal(py, nat), (shape, linear)
