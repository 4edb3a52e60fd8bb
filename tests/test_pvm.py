"""PVM/DDS/RAW loader tests."""
import os

import numpy as np
import pytest

from tests.conftest import BUCKY_PATH, synthetic_volume
from volrt.io import pvm


@pytest.mark.skipif(not os.path.exists(BUCKY_PATH), reason="Bucky.pvm absent")
class TestBucky:
    def test_dims_and_metadata(self):
        vol = pvm.read_pvm(BUCKY_PATH)
        assert (vol.width, vol.height, vol.depth) == (32, 32, 32)
        assert vol.components == 1
        assert vol.data.shape == (32, 32, 32)
        # The metadata strings live at the very end of the DDS stream, so a
        # clean decode of them validates the whole differential decode.
        assert vol.description is not None and "Bucky" in vol.description
        assert vol.courtesy is not None and "AVS" in vol.courtesy

    def test_value_range(self):
        vol = pvm.read_pvm(BUCKY_PATH)
        assert vol.data.dtype == np.uint8
        assert vol.data.max() == 255
        assert 0 < vol.data.mean() < 128  # mostly-empty electron density

    def test_deterministic(self):
        a = pvm.read_pvm(BUCKY_PATH).data
        b = pvm.read_pvm(BUCKY_PATH).data
        np.testing.assert_array_equal(a, b)


class TestPVM3RoundTrip:
    def test_roundtrip(self, tmp_path):
        data = synthetic_volume(16)
        path = str(tmp_path / "synth.pvm")
        pvm.write_pvm(
            path, data, scale=(1.0, 2.0, 0.5), description="synthetic"
        )
        vol = pvm.read_pvm(path)
        np.testing.assert_array_equal(vol.data, data)
        assert vol.scale == (1.0, 2.0, 0.5)
        assert vol.description == "synthetic"
        assert vol.courtesy is None

    def test_load_volume_dispatch(self, tmp_path):
        data = synthetic_volume(8)
        path = str(tmp_path / "v.pvm")
        pvm.write_pvm(path, data)
        loaded, info = pvm.load_volume(path)
        np.testing.assert_array_equal(loaded, data)
        assert info["dims"] == (8, 8, 8)

    def test_bad_extension(self, tmp_path):
        p = tmp_path / "x.txt"
        p.write_bytes(b"nope")
        with pytest.raises(ValueError, match="extension"):
            pvm.load_volume(str(p))


class TestRaw:
    def test_raw_roundtrip(self, tmp_path):
        data = synthetic_volume(8)
        path = str(tmp_path / "v.raw")
        data.tofile(path)
        out = pvm.read_raw(path, (8, 8, 8))
        np.testing.assert_array_equal(out, data)

    def test_raw_bad_size(self, tmp_path):
        path = str(tmp_path / "v.raw")
        np.zeros(100, np.uint8).tofile(path)
        with pytest.raises(ValueError, match="size"):
            pvm.read_raw(path, (8, 8, 8))


class TestDDSPrimitives:
    def test_bitreader(self):
        br = pvm._BitReader(bytes([0b10110100, 0b01100000]))
        assert br.read(1) == 1
        assert br.read(2) == 0b01
        assert br.read(5) == 0b10100
        assert br.read(4) == 0b0110

    def test_bulk_extract_matches_bitreader(self):
        rng = np.random.default_rng(0)
        buf = rng.integers(0, 256, 64, dtype=np.uint8)
        widths = rng.integers(1, 9, 40).astype(np.int32)
        offsets = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.int64)
        got = pvm._extract_bits_bulk(buf, offsets, widths)
        br = pvm._BitReader(buf.tobytes())
        want = [br.read(int(w)) for w in widths]
        np.testing.assert_array_equal(got, want)

    def test_interleave_roundtrip(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 256, 103, dtype=np.uint8)
        for skip in (1, 2, 3, 4):
            # Forward (storage-side) deinterleave, done the straightforward way.
            stored = np.concatenate([data[i::skip] for i in range(skip)])
            restored = pvm._interleave(stored, skip, block=0)
            np.testing.assert_array_equal(restored, data)

    def test_interleave_blocked(self):
        rng = np.random.default_rng(2)
        data = rng.integers(0, 256, 1000, dtype=np.uint8)
        skip, block = 2, 100
        chunk = skip * block
        stored = np.concatenate(
            [
                np.concatenate(
                    [data[s : s + chunk][i::skip] for i in range(skip)]
                )
                for s in range(0, len(data), chunk)
            ]
        )
        restored = pvm._interleave(stored, skip, block)
        np.testing.assert_array_equal(restored, data)

    def test_reconstruct_strip1(self):
        # Plain first-order predictor.
        deltas = np.array([10, 20, -5, 300, -500], np.int64)
        out = pvm._reconstruct(deltas, strip=1)
        want = np.cumsum(deltas) % 256
        np.testing.assert_array_equal(out, want.astype(np.uint8))

    def test_reconstruct_strip_predictor_matches_scalar(self):
        rng = np.random.default_rng(3)
        deltas = rng.integers(-128, 128, 257, dtype=np.int64)
        for strip in (2, 3, 16, 100):
            got = pvm._reconstruct(deltas, strip)
            # Scalar emulation of the reference accumulator loop
            # (reference: ddsbase.cpp:213-235).
            out = []
            act = 0
            for cnt, dlt in enumerate(deltas):
                if strip == 1 or cnt <= strip:
                    act += dlt
                else:
                    act += out[cnt - strip] - out[cnt - strip - 1] + dlt
                act %= 256
                out.append(act)
            np.testing.assert_array_equal(got, np.array(out, np.uint8))


class TestQuantize:
    def test_linear(self):
        v16 = np.arange(0, 65536, 257, dtype=np.uint16).reshape(16, 4, 4)
        data = np.stack([(v16 >> 8).astype(np.uint8), (v16 & 0xFF).astype(np.uint8)], -1)
        out = pvm.quantize16(data, linear=True)
        assert out.dtype == np.uint8
        assert out.min() == 0 and out.max() == 255
        assert np.all(np.diff(out.reshape(-1).astype(np.int32)) >= 0)

    def test_nonlinear_monotone(self):
        rng = np.random.default_rng(4)
        v16 = rng.integers(0, 65536, (8, 8, 8), dtype=np.uint16)
        data = np.stack([(v16 >> 8).astype(np.uint8), (v16 & 0xFF).astype(np.uint8)], -1)
        out = pvm.quantize16(data)
        assert out.dtype == np.uint8
        # The mapping must be monotone in the 16-bit value.
        order = np.argsort(v16.reshape(-1), kind="stable")
        mapped = out.reshape(-1)[order].astype(np.int32)
        assert np.all(np.diff(mapped) >= 0)
