"""PVM/DDS/RAW loader tests."""
import os

import numpy as np
import pytest

from tests.conftest import ASSET_PATH, BUCKY_PATH, synthetic_volume
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


class TestDDSEncode:
    """The DDS v3d encoder (new capability — the reference only decodes,
    ddsbase.cpp:187-245; format derived from the decoder)."""

    def test_byte_roundtrip_all_strips(self):
        rng = np.random.default_rng(0)
        payloads = [
            rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
            bytes(3000),  # pure zero runs -> width-0 groups
            synthetic_volume(16).tobytes(),
            b"",
            b"\x05",
        ]
        for strip in (1, 2, 7, 32, 100):
            for data in payloads:
                enc = pvm.dds_encode(data, strip)
                assert pvm.dds_decode(enc, block=0) == data

    def test_compresses_smooth_volume(self):
        data = synthetic_volume(32).tobytes()
        enc = pvm.dds_encode(data, strip=32)
        assert len(enc) < len(data)

    def test_native_decoder_reads_encoded_stream(self):
        from volrt import native

        data = synthetic_volume(16, seed=2).tobytes()
        enc = pvm.dds_encode(data, strip=16)
        out = native.dds_decode(enc, 0)
        if out is None:
            pytest.skip("native lib unavailable")
        assert out == data

    def test_pvm_dds_roundtrip(self, tmp_path):
        data = synthetic_volume(16, seed=5)
        path = str(tmp_path / "c.pvm")
        pvm.write_pvm(path, data, description="dds-wrapped", dds=True)
        with open(path, "rb") as f:
            assert f.read(8) == pvm.DDS_MAGIC_V1
        vol = pvm.read_pvm(path)
        np.testing.assert_array_equal(vol.data, data)
        assert vol.description == "dds-wrapped"


class TestInRepoAsset:
    """The committed tests/assets/shell32.pvm: a DDS-compressed PVM the
    full decode path always exercises, reference checkout or not."""

    def test_asset_decodes(self):
        vol = pvm.read_pvm(ASSET_PATH)
        assert (vol.width, vol.height, vol.depth) == (32, 32, 32)
        np.testing.assert_array_equal(vol.data, synthetic_volume(32))
        assert "volrt" in (vol.courtesy or "")

    def test_asset_via_loader_dispatch(self):
        data, info = pvm.load_volume(ASSET_PATH)
        assert info["dims"] == (32, 32, 32)
        assert data.dtype == np.uint8


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


class TestQuantize16Golden:
    """Byte-exact validation of the 16->8 bit quantizer against a scalar
    oracle transcribing the reference algorithm's behavior
    (reference: ddsbase.cpp:444-558): gradient-magnitude-weighted histogram,
    cube-root compression, iterative outlier capping, monotone integration."""

    @staticmethod
    def _oracle(be_bytes: np.ndarray, linear: bool = False) -> np.ndarray:
        import math

        d, h, w, _ = be_bytes.shape
        v = np.zeros((d, h, w), np.int64)
        for k in range(d):
            for j in range(h):
                for i in range(w):
                    v[k, j, i] = (
                        256 * int(be_bytes[k, j, i, 0])
                        + int(be_bytes[k, j, i, 1]))
        vmin, vmax = int(v.min()), int(v.max())
        err = [0.0] * 65536
        if linear:
            for i in range(65536):
                err[i] = 255.0 * i / vmax
        else:
            def get(i, j, k):
                return float(v[k, j, i])

            def grad(i, j, k):
                def ax(idx, lim, lo, hi, cur):
                    if idx > 0:
                        if idx < lim - 1:
                            return (hi - lo) / 2.0
                        return cur - lo
                    if idx < lim - 1:
                        return hi - cur
                    return 0.0

                c = get(i, j, k)
                gx = ax(i, w, get(max(i - 1, 0), j, k),
                        get(min(i + 1, w - 1), j, k), c)
                gy = ax(j, h, get(i, max(j - 1, 0), k),
                        get(i, min(j + 1, h - 1), k), c)
                gz = ax(k, d, get(i, j, max(k - 1, 0)),
                        get(i, j, min(k + 1, d - 1)), c)
                return math.sqrt(gx * gx + gy * gy + gz * gz)

            for k in range(d):
                for j in range(h):
                    for i in range(w):
                        err[v[k, j, i]] += math.sqrt(grad(i, j, k))
            for i in range(65536):
                err[i] = err[i] ** (1.0 / 3.0)
            err[vmin] = err[vmax] = 0.0
            for _ in range(256):
                eint = 0.0
                for i in range(65536):
                    eint += err[i]
                done = True
                for i in range(65536):
                    if err[i] > eint / 256:
                        err[i] = eint / 256
                        done = False
                if done:
                    break
            for i in range(1, 65536):
                err[i] += err[i - 1]
            if err[65535] > 0.0:
                scale = np.float32(255.0) / err[65535]
                for i in range(65536):
                    err[i] *= scale
        out = np.zeros((d, h, w), np.uint8)
        for k in range(d):
            for j in range(h):
                for i in range(w):
                    out[k, j, i] = int(err[v[k, j, i]] + 0.5)
        return out

    @staticmethod
    def _synth16(d=5, h=6, w=7, seed=3):
        rng = np.random.default_rng(seed)
        z, y, x = np.mgrid[0:d, 0:h, 0:w].astype(np.float64)
        ramp = (x * 900 + y * 700 + z * 500
                + rng.integers(0, 4000, (d, h, w)))
        v = np.clip(ramp, 0, 65535).astype(np.uint16)
        be = np.stack([v >> 8, v & 255], axis=-1).astype(np.uint8)
        return be

    def test_nonlinear_byte_exact(self):
        from volrt.io.pvm import quantize16

        be = self._synth16()
        got = quantize16(be)
        want = self._oracle(be)
        np.testing.assert_array_equal(got, want)

    def test_linear_byte_exact(self):
        from volrt.io.pvm import quantize16

        be = self._synth16(seed=4)
        got = quantize16(be, linear=True)
        want = self._oracle(be, linear=True)
        np.testing.assert_array_equal(got, want)
