"""Ray-tile layout shared by the Pallas renderer rungs.

The image is partitioned into square pixel patches (``TILE_H x TILE_W``); each
Pallas grid step processes one patch's ray bundle. Patches (not scan-line
chunks) are essential: the windowed kernels exploit the spatial coherence of a
patch's rays to bound the volume region touched per march step.

This is the TPU analog of the reference's 16x16 CUDA thread blocks
(reference: Renderer.h:42, GPURenderer1.cu:11,81-83) — one level up: a CUDA
thread block becomes a Pallas grid step over a whole ray tile.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from volrt.core import rays as rays_mod
from volrt.core.types import Raycaster

TILE_H = 16
TILE_W = 16
RAYS_PER_TILE = TILE_H * TILE_W  # 256 sublane rows: 2 MXU row-tiles

# Channel indices in the packed per-ray input array.
# CH_J0: the ray's k-band offset — rays march on their own lattice
# ``k0 + i*step`` (reference semantics), but the kernel loop iterates global
# k-bands of width ``step``; ray r takes its i-th sample in band ``j0_r + i``.
# This keeps all samples of one band within ``tile extent + one step`` of each
# other, which is what makes the windowed kernels' bricks small even for
# silhouette tiles whose rays enter the cube at very different depths.
(
    CH_OX, CH_OY, CH_OZ, CH_DX, CH_DY, CH_DZ,
    CH_K0, CH_KFAR, CH_ALIVE, CH_J0,
) = range(10)
N_CHANNELS = 16  # padded for lane alignment


def pad_dims(w: int, h: int, tile_w: int = TILE_W,
             tile_h: int = TILE_H) -> tuple[int, int]:
    wp = -(-w // tile_w) * tile_w
    hp = -(-h // tile_h) * tile_h
    return wp, hp


def num_tiles(w: int, h: int, tile_w: int = TILE_W,
              tile_h: int = TILE_H) -> int:
    wp, hp = pad_dims(w, h, tile_w, tile_h)
    return (wp // tile_w) * (hp // tile_h)


def tile_rays(img: jax.Array, w: int, h: int, tile_w: int = TILE_W,
              tile_h: int = TILE_H) -> jax.Array:
    """Rearrange per-pixel data ``(H, W, C)`` (padded) into ``(T, R, C)``."""
    hp, wp = img.shape[0], img.shape[1]
    c = img.shape[2]
    t = img.reshape(hp // tile_h, tile_h, wp // tile_w, tile_w, c)
    t = t.transpose(0, 2, 1, 3, 4)  # (th, tw, tile_h, tile_w, c)
    return t.reshape(-1, tile_h * tile_w, c)


def untile_rays(tiles: jax.Array, w: int, h: int, tile_w: int = TILE_W,
                tile_h: int = TILE_H) -> jax.Array:
    """Inverse of :func:`tile_rays`: ``(T, R, C)`` -> ``(H, W, C)`` cropped."""
    wp, hp = pad_dims(w, h, tile_w, tile_h)
    c = tiles.shape[-1]
    t = tiles.reshape(hp // tile_h, wp // tile_w, tile_h, tile_w, c)
    t = t.transpose(0, 2, 1, 3, 4).reshape(hp, wp, c)
    return t[:h, :w]


def prepare_ray_tiles(rc: Raycaster) -> jax.Array:
    """Build the packed per-ray kernel input ``f32[T, R, N_CHANNELS]``.

    Channels: origin xyz, direction xyz, k0 (march start, after the leading
    ESL leap), kfar, alive flag. Ray generation, AABB intersection and the
    leading empty-space leap run in plain XLA — they are a tiny fraction of
    the frame and keep the kernel lean (the reference similarly computes
    get_ray/intersect per thread before the march loop,
    reference: GPURenderer1.cu:33-40).
    """
    from volrt.renderers.batched import esl_start

    esl_fn = None
    if rc.esl:
        esl_fn = lambda o, d, kn, kf, hit: esl_start(rc, o, d, kn, kf, hit)
    return prepare_ray_tiles_raw(rc.view, rc.ray_step, esl_fn)


def prepare_ray_tiles_raw(view, ray_step: float, esl_fn=None,
                          tile_w: int = TILE_W,
                          tile_h: int = TILE_H) -> jax.Array:
    """:func:`prepare_ray_tiles` from raw components (no Raycaster needed —
    used by the fused differentiable path, which has a float scene instead
    of a uint8 Raycaster)."""
    w, h = view.dims
    wp, hp = pad_dims(w, h, tile_w, tile_h)
    origins, directions = rays_mod.get_rays(view)
    pad = ((0, hp - h), (0, wp - w), (0, 0))
    origins = jnp.pad(origins, pad)
    directions = jnp.pad(directions, pad)

    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    knear, kfar, hit = rays_mod.intersect_aabb(o, d)
    # Padded rays have zero direction -> intersect substitutes eps; make sure
    # they are dead regardless.
    if hp != h or wp != w:
        px = jnp.arange(wp)[None, :] < w
        py = jnp.arange(hp)[:, None] < h
        valid = (px & py).reshape(-1)
        hit = hit & valid

    if esl_fn is not None:
        k0 = esl_fn(o, d, knear, kfar, hit)
    else:
        k0 = knear
    alive = hit & (k0 <= kfar)

    packed = jnp.zeros((hp * wp, N_CHANNELS), jnp.float32)
    packed = packed.at[:, CH_OX:CH_OZ + 1].set(o)
    packed = packed.at[:, CH_DX:CH_DZ + 1].set(d)
    packed = packed.at[:, CH_K0].set(k0)
    packed = packed.at[:, CH_KFAR].set(kfar)
    packed = packed.at[:, CH_ALIVE].set(alive.astype(jnp.float32))
    tiles = tile_rays(
        packed.reshape(hp, wp, N_CHANNELS), w, h, tile_w, tile_h)

    # Per-tile k-band offsets (see CH_J0 note above).
    tk0 = tiles[..., CH_K0]
    talive = tiles[..., CH_ALIVE] > 0.0
    kbase = jnp.min(
        jnp.where(talive, tk0, jnp.inf), axis=1, keepdims=True
    )
    kbase = jnp.where(jnp.isfinite(kbase), kbase, 0.0)
    j0 = jnp.where(
        talive, jnp.ceil((tk0 - kbase) / ray_step), 0.0
    )
    return tiles.at[..., CH_J0].set(j0)


def max_steps(ray_step: float) -> int:
    """Static march-loop bound: cube chord / step (reference cube [-1,1]^3)."""
    return int(math.ceil(2.0 * math.sqrt(3.0) / ray_step)) + 2


def max_bands(ray_step: float) -> int:
    """Static k-band loop bound: band offsets (j0) span at most one chord and
    each ray marches at most one chord."""
    return 2 * max_steps(ray_step)
