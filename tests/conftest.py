"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
exercised without TPU hardware (the driver's dryrun does the same). Pallas
kernels run in interpreter mode under this setup. Set ``VOLRT_TEST_TPU=1`` to
run the suite on real TPU hardware instead.
"""
import os
import sys

if not os.environ.get("VOLRT_TEST_TPU"):
    # Force CPU with 8 virtual devices so multi-chip sharding paths run
    # without TPU hardware. A site hook may import jax (for a TPU plugin)
    # before this file runs, so env vars alone are unreliable — the config
    # calls below work until the backend is instantiated. The env vars are
    # still set for subprocesses spawned by tests (e.g. CLI runs).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ.setdefault("VOLRT_PALLAS_INTERPRET", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

BUCKY_PATH = "/root/reference/VolumeRendering/Bucky.pvm"
# In-repo DDS-compressed 32^3 asset (written by volrt's own
# write_pvm(dds=True); content = synthetic_volume(32)) so every
# loader/golden/CLI integration test exercises the full DDS decode path
# even without the reference checkout.
ASSET_PATH = os.path.join(
    os.path.dirname(__file__), "assets", "shell32.pvm")


@pytest.fixture(scope="session")
def pvm_path():
    """A real DDS-compressed 32^3 PVM file: the reference's Bucky when
    present, else the committed in-repo asset."""
    return BUCKY_PATH if os.path.exists(BUCKY_PATH) else ASSET_PATH


@pytest.fixture(scope="session")
def bucky(pvm_path):
    """A 32^3 uint8 volume loaded through the full PVM/DDS decode path."""
    from volrt.io.pvm import read_pvm

    return read_pvm(pvm_path).data


def synthetic_volume(n: int, seed: int = 0) -> np.ndarray:
    """Procedural test volume: a soft shell + blob, deterministic."""
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) / c
    shell = np.exp(-((r - 0.7) ** 2) / 0.02) * 200
    blob = np.exp(-(r**2) / 0.08) * 255
    rng = np.random.default_rng(seed)
    noise = rng.uniform(0, 20, size=(n, n, n))
    return np.clip(shell + blob + noise, 0, 255).astype(np.uint8)


@pytest.fixture()
def synth32():
    return synthetic_volume(32)


@pytest.fixture()
def synth48():
    return synthetic_volume(48, seed=1)
