"""Renderer 2 — nearest-neighbor + bucketed-TF Pallas rung.

The GPURenderer2/3-analog rung (reference: GPURenderer23.cu:20-53):
nearest sampling with map_float_int truncation addressing and the
bucketed (non-interpolated) transfer function.

Round 5: rides the rung-3 windowed kernel in ``nearest`` mode
(trilinear.render_tiles(nearest=True)) — one single-tap one-hot row per
sample against the tile's resident ``(wz, wy)`` brick, one lane gather
for x, and a bucket one-hot TF matmul. The round-1 whole-volume
``(R, D*H)`` one-hot (the "constant-memory" naivety this rung used to
model) cost a ~(D*H)/(wz*wy)-fold larger gather matmul and measured
only 1.2x the golden rung; the windowed port keeps the exact rung-2
semantics at rung-3 speed (VERDICT round-4 #9).

Scope: volumes with ``W <= 128`` (the VMEM-resident x-lane bound shared
with rung 3); any D*H.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from volrt.core import sampling
from volrt.core.types import Raycaster
from volrt.renderers.pallas import layout
from volrt.renderers.pallas.common import pad_tf, scalars_array

NAME = "pallas-nn"

R = layout.RAYS_PER_TILE


@functools.partial(jax.jit, static_argnames=("shade", "window"))
def render_float(rc: Raycaster, shade: bool = True,
                 window: tuple[int, int] | None = None) -> jax.Array:
    """Render to a float RGBA image ``f32[H, W, 4]``.

    Round 5: rides the windowed rung-3 kernel in ``nearest`` mode (one
    single-tap one-hot row per sample against a ``(wz, wy)`` brick)
    instead of the legacy whole-volume ``(R, D*H)`` one-hot — the same
    semantics at a ~(D*H)/(wz*wy)-fold smaller gather matmul (the
    legacy rung was only 1.2x the golden rung; VERDICT round-4 #9)."""
    del shade  # this rung always evaluates the (gated) shading tap
    img, _, _ = render_float_stats(rc, window=window)
    return img


@functools.partial(jax.jit, static_argnames=("shade", "window"))
def render_float_stats(
    rc: Raycaster, shade: bool = True,
    window: tuple[int, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``render_float`` plus (overflow, executed-band) counters (see
    trilinear.py — the measured-MFU work accounting)."""
    del shade
    from volrt.renderers.pallas import trilinear
    from volrt.renderers.pallas.common import pad_volume_3d

    w, h = rc.view.dims
    vw, vh, vd = rc.volume.dims
    if vw > 128:
        raise ValueError(
            f"pallas-nn supports volumes with W<=128; got "
            f"{rc.volume.dims} — use pallas-blocked"
        )
    rays = layout.prepare_ray_tiles(rc)
    vol3d = pad_volume_3d(rc.volume)
    tfp = pad_tf(rc.transfer_fn)
    scal = scalars_array(rc)
    if window is None:
        window = trilinear.default_window(rc)
    out, ovf = trilinear.render_tiles(
        scal, rays, vol3d, tfp,
        dims=rc.volume.dims, ray_step=rc.ray_step, window=window,
        shade=True, nearest=True,
    )
    return (layout.untile_rays(out, w, h), jnp.sum(ovf[:, 0, 0]),
            jnp.sum(ovf[:, 1, 0]))


def default_window(rc: Raycaster) -> tuple[int, int]:
    """Static (wz, wy) window (shared with rung 3 — same footprint
    geometry; nearest needs no +1 neighbor, so it is conservative)."""
    from volrt.renderers.pallas import trilinear

    return trilinear.default_window(rc)


def bands_flops(rc: Raycaster, bands: float,
                window: tuple[int, int] | None = None) -> float:
    """Executed MXU FLOPs for ``bands`` march bands (nearest mode: one
    single-tap gather matmul per tap, 2 taps with the gated shade)."""
    from volrt.renderers.pallas import trilinear

    wz, wy = window or trilinear.default_window(rc)
    return bands * 2.0 * R * wz * wy * 128 * 2


def render(rc: Raycaster) -> jax.Array:
    """Render to ``uint8[H, W, 4]``."""
    return sampling.write_color(render_float(rc))
