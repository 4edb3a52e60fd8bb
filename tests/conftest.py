"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
exercised without TPU hardware (the driver's dryrun does the same). Pallas
kernels run in interpreter mode under this setup. Set ``VOLRT_TEST_TPU=1`` to
run the suite on real TPU hardware instead.
"""
import os
import sys

if (
    not os.environ.get("VOLRT_TEST_TPU")
    and os.environ.get("_VOLRT_TEST_ENV") != "1"
    and "pytest" in sys.modules  # only when actually run under pytest
):
    # XLA_FLAGS must be present before the interpreter starts: a site hook
    # imports jax (and loads the XLA runtime, freezing flag parsing) before
    # conftest runs. Re-exec pytest once with the test environment.
    env = dict(os.environ)
    env["_VOLRT_TEST_ENV"] = "1"
    # Override, don't setdefault: the environment may pre-set JAX_PLATFORMS
    # to a TPU plugin. Some plugin builds only honor JAX_PLATFORM_NAME, so
    # set both.
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    env.setdefault("VOLRT_PALLAS_INTERPRET", "1")
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402

BUCKY_PATH = "/root/reference/VolumeRendering/Bucky.pvm"


@pytest.fixture(scope="session")
def bucky():
    """The reference repo's bundled 32^3 Bucky volume (integration asset),
    or a synthetic stand-in when unavailable."""
    from volrt.io.pvm import read_pvm

    if os.path.exists(BUCKY_PATH):
        return read_pvm(BUCKY_PATH).data
    return synthetic_volume(32)


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
