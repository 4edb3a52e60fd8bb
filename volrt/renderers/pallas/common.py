"""Shared host-side helpers for the Pallas rungs."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from volrt.core.types import Raycaster, Volume

X_LANES = 128  # lane width: max x extent addressable by one lane gather


def interpret_mode() -> bool:
    """Pallas interpreter mode for CPU test runs (set by tests/conftest.py)."""
    return bool(os.environ.get("VOLRT_PALLAS_INTERPRET"))


def tpu_compiler_params(vmem_mb: int | None = None):
    """Mosaic compiler params shared by every windowed kernel.

    Lifts the scoped-VMEM budget from the 16 MB default toward the chip's
    physical 128 MB: the windowed kernels' stack temporaries scale as
    ``(R, wz*wy)`` and deterministically exceed 16 MB at heavy-minification
    configs (rung 4 at 256^3/512^2 needs ~101 MB). Unlike
    ``--xla_tpu_scoped_vmem_limit_kib`` — which tunneled axon backends
    reject — ``vmem_limit_bytes`` rides inside the Mosaic kernel config,
    so it works through remote compile. Env override: VOLRT_VMEM_LIMIT_MB.
    """
    from jax.experimental.pallas import tpu as pltpu

    mb = vmem_mb or int(os.environ.get("VOLRT_VMEM_LIMIT_MB", "110"))
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


def pad_volume_2d(volume: Volume) -> jax.Array:
    """Volume as ``f32[D*H, Xpad]`` with x padded to the 128-lane width.

    The flattened (z, y) row axis matches the reference linearization
    ``z*H + y`` (reference: ModelBase.h:22).
    """
    w, h, d = volume.dims
    if w > X_LANES:
        raise ValueError(f"volume W={w} exceeds {X_LANES} lanes")
    data = volume.data.astype(jnp.float32).reshape(d * h, w)
    return jnp.pad(data, ((0, 0), (0, X_LANES - w)))


def pad_volume_3d(volume: Volume, dtype=jnp.float32) -> jax.Array:
    """Volume as ``(Dpad, Hpad, Xpad)``: x padded to 128 lanes, z/y padded to
    sublane multiples of 8 so window slices stay in bounds."""
    w, h, d = volume.dims
    if w > X_LANES:
        raise ValueError(f"volume W={w} exceeds {X_LANES} lanes")
    data = volume.data.astype(dtype)
    dp = -(-d // 8) * 8
    hp = -(-h // 8) * 8
    return jnp.pad(data, ((0, dp - d), (0, hp - h), (0, X_LANES - w)))


def pad_volume_3d_any(volume: Volume, dtype=jnp.uint8) -> jax.Array:
    """Volume as ``(D, H, Xpad)`` with x padded up to a multiple of 128 lanes
    (supports W > 128 for the blocked rung)."""
    w, h, d = volume.dims
    xpad = -(-w // X_LANES) * X_LANES
    data = volume.data.astype(dtype)
    dp = -(-d // 8) * 8
    hp = -(-h // 8) * 8
    return jnp.pad(data, ((0, dp - d), (0, hp - h), (0, xpad - w)))


def pad_tf(transfer_fn: jax.Array) -> jax.Array:
    """Premultiplied TF as ``f32[TF_SIZE, 128]`` (lanes 0..3 = RGBA)."""
    return jnp.pad(
        transfer_fn.astype(jnp.float32), ((0, 0), (0, X_LANES - 4))
    )


def scalars_array(rc: Raycaster) -> jax.Array:
    """SMEM scalar block: threshold, light_kd, light_pos xyz (padded to 8)."""
    lp = rc.view.light_pos.astype(jnp.float32)
    return jnp.concatenate([
        rc.ray_threshold.reshape(1).astype(jnp.float32),
        rc.light_kd.reshape(1).astype(jnp.float32),
        lp.reshape(3),
        jnp.zeros(3, jnp.float32),
    ]).reshape(1, 8)
