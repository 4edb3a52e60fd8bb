"""Volume and transfer-function sampling primitives (pure jnp, vectorized).

These are the JAX equivalents of the reference's device-inline sampling
library: ``map_float_int`` (reference: common.h:105-110), nearest-neighbor
``Model::sample_data`` (reference: ModelBase.h:17-23), the trilinear 3D
texture fetch of renderer 4 (reference: GPURenderer4.cu:76,136-141), the
bucketed TF lookup (reference: CPURenderer.cpp:31) and the linearly
interpolated TF texture fetch (reference: GPURenderer4.cu:77,94-95).

All functions are shape-polymorphic over a leading batch of positions and are
safe under vmap/jit. Positions are ``(..., 3)`` arrays of world coordinates
``(x, y, z)`` in ``[-1, 1]^3``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from volrt.constants import TF_RATIO, TF_SIZE
from volrt.core.types import Volume


def map_float_int(f: jax.Array, n: int) -> jax.Array:
    """Map float [0,1] to int [0, n-1], truncating like the reference.

    ``(long)(f * n)`` truncates toward zero; out-of-range values clamp
    (reference: common.h:105-110).
    """
    i = (f * n).astype(jnp.int32)  # astype truncates toward zero like C casts
    return jnp.clip(i, 0, n - 1)


def world_to_voxel_idx(pos: jax.Array, dims: tuple[int, int, int]) -> jax.Array:
    """Nearest-neighbor voxel index ``(..., 3)`` as (ix, iy, iz) ints.

    Matches ``map_float_int((pos+1)*0.5, dims)`` per axis
    (reference: ModelBase.h:19-21).
    """
    w, h, d = dims
    n = jnp.array([w, h, d], jnp.int32)
    f = (pos + 1.0) * 0.5
    i = (f * n).astype(jnp.int32)
    return jnp.clip(i, 0, n - 1)


def sample_nearest(volume: Volume, pos: jax.Array) -> jax.Array:
    """Nearest-neighbor sample; returns uint8 values as int32 ``(...)``.

    Reference: ModelBase.h:17-23.
    """
    idx = world_to_voxel_idx(pos, volume.dims)
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    return volume.data[iz, iy, ix].astype(jnp.int32)


def sample_trilinear(volume: Volume, pos: jax.Array) -> jax.Array:
    """Trilinear sample with CUDA-texture semantics; returns f32 in [0, 1].

    Emulates ``tex3D`` with ``normalized=true``, ``cudaFilterModeLinear`` and
    clamp addressing (reference: GPURenderer4.cu:76,136-141): normalized
    coordinate ``u`` samples at voxel-space ``u*N - 0.5`` with voxel centers
    at integers, edges clamped. (We use full f32 lerp weights; CUDA quantizes
    weights to 9-bit fixed point — documented divergence, below 1/256
    amplitude.)
    """
    w, h, d = volume.dims
    n = jnp.array([w, h, d], jnp.float32)
    u = (pos + 1.0) * 0.5
    t = u * n - 0.5
    i0 = jnp.floor(t)
    frac = t - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    nmax = jnp.array([w - 1, h - 1, d - 1], jnp.int32)
    i0 = jnp.clip(i0, 0, nmax)
    i1 = jnp.clip(i1, 0, nmax)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    data = volume.data

    def tap(z, y, x):
        return data[z, y, x].astype(jnp.float32)

    c000 = tap(z0, y0, x0)
    c001 = tap(z0, y0, x1)
    c010 = tap(z0, y1, x0)
    c011 = tap(z0, y1, x1)
    c100 = tap(z1, y0, x0)
    c101 = tap(z1, y0, x1)
    c110 = tap(z1, y1, x0)
    c111 = tap(z1, y1, x1)

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return (c0 * (1 - fz) + c1 * fz) / 255.0


def sample_trilinear_f(grid: jax.Array, pos: jax.Array) -> jax.Array:
    """Trilinear sample of a float density grid ``f32[D, H, W]`` (values in
    grid units, typically [0, 1]) at world positions ``(..., 3)``.

    Same CUDA-texture coordinate convention as :func:`sample_trilinear`, but
    differentiable w.r.t. ``grid`` (and ``pos``) — the sampling path used by
    the differentiable renderer for trainable voxel grids.
    """
    d, h, w = grid.shape
    n = jnp.array([w, h, d], jnp.float32)
    t = (pos + 1.0) * 0.5 * n - 0.5
    i0 = jnp.floor(t)
    frac = t - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    nmax = jnp.array([w - 1, h - 1, d - 1], jnp.int32)
    i0 = jnp.clip(i0, 0, nmax)
    i1 = jnp.clip(i1, 0, nmax)

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    c000 = grid[z0, y0, x0]
    c001 = grid[z0, y0, x1]
    c010 = grid[z0, y1, x0]
    c011 = grid[z0, y1, x1]
    c100 = grid[z1, y0, x0]
    c101 = grid[z1, y0, x1]
    c110 = grid[z1, y1, x0]
    c111 = grid[z1, y1, x1]

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def tf_lookup_bucket(transfer_fn: jax.Array, sample_u8: jax.Array) -> jax.Array:
    """Bucketed TF lookup for integer samples: ``tf[sample // TF_RATIO]``.

    Reference: CPURenderer.cpp:31. Returns ``(..., 4)`` premultiplied RGBA.
    """
    return transfer_fn[sample_u8 // TF_RATIO]


def tf_lookup_linear(transfer_fn: jax.Array, sample: jax.Array) -> jax.Array:
    """Linearly interpolated TF lookup for float samples in [0, 1].

    Emulates ``tex1D`` with ``normalized=true``, linear filtering and clamp
    addressing (reference: GPURenderer4.cu:77,94-96): fetch position is
    ``sample*TF_SIZE - 0.5`` with entries at integer centers.
    Returns ``(..., 4)`` premultiplied RGBA.
    """
    t = sample * TF_SIZE - 0.5
    i0 = jnp.floor(t)
    frac = (t - i0)[..., None]
    i0 = i0.astype(jnp.int32)
    lo = jnp.clip(i0, 0, TF_SIZE - 1)
    hi = jnp.clip(i0 + 1, 0, TF_SIZE - 1)
    return transfer_fn[lo] * (1 - frac) + transfer_fn[hi] * frac


def write_color(color: jax.Array) -> jax.Array:
    """Quantize float RGBA to uint8 with the reference's mapping.

    ``map_float_int(c, 256)`` truncates and clamps (reference:
    RaycasterBase.h:44-50).
    """
    return map_float_int(color, 256).astype(jnp.uint8)
