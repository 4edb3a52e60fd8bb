"""Renderer 5 — lane-major planned-window forward kernel (v3).

The renderer-ladder rung built on the v3 kernel generation (see diff_v3's
module docstring): same trilinear + linearly-interpolated-TF semantics as
rung 4 (reference: GPURenderer4.cu:53-87), at ~5x rung-4 throughput.
Shading modes: unshaded (``light_kd == 0`` — the reference's shade()
contributes nothing then, RaycasterBase.h:87-98), the reference's one-tap
diffuse (``shading == "diffuse"`` — the second trilinear tap offset toward
the light, GPURenderer4.cu:41-51), or gradient Blinn-Phong
(``shading == "phong"``, BASELINE config 4).

ESL is plan-time empty-group compaction (diff_v3.plan_windows) — the
TPU-native replacement for the reference's per-ray leap loop
(RaycasterBase.h:67-85): TF-empty march groups are deleted from the
window plan, so empty space costs zero kernel time. ERT is exact
reference semantics (acca > threshold latch per ray).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from volrt.core import sampling
from volrt.core.types import Raycaster
from volrt.renderers.pallas.diff_v3 import render_view_v3

NAME = "pallas-v3"


@functools.partial(jax.jit, static_argnames=("window", "fast"))
def render_float(
    rc: Raycaster,
    window: tuple[int, int] | tuple[int, int, int] | None = None,
    fast: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Render to ``(f32[H, W, 4] image, f32[] overflow_count)``.

    ``rc.shading == "phong"`` applies gradient Blinn-Phong (central-
    difference normals from shifted tap weights — BASELINE config 4's
    shading at kernel speed); ``rc.shading == "diffuse"`` (the ladder
    default) applies the reference's one-tap diffuse — the second
    trilinear tap offset 0.01 toward the light
    (reference: GPURenderer4.cu:41-51, RaycasterBase.h:87-98) — via the
    kernel's shade path (the same one the fused training backward
    differentiates through).
    """
    if rc.interpolation != "trilinear":
        raise ValueError("pallas-v3 renders trilinear mode only")
    # ESL here is plan-time empty-group compaction (diff_v3.plan_windows)
    # — zero in-kernel cost, skips interior/trailing empty space too
    # (measured 2.5x on a sparse 256^3 scene vs the round-2 leading-leap
    # loop, which cost more than it saved; BASELINE.md round 3).
    esl_grid = (rc.esl_empty, rc.esl_block_dims) if rc.esl else None
    density = rc.volume.data.astype(jnp.float32) / 255.0
    # No concrete kd check here: light_kd is a traced leaf, and the kernel
    # already zeroes the tap at runtime when kd <= SHADE_KD_GATE (matching
    # the reference's `raycaster.light_kd > 0.01f` gate, GPURenderer4.cu:78).
    shaded = rc.shading == "diffuse"
    img, ovf = render_view_v3(
        density, rc.transfer_fn.astype(jnp.float32), rc.ray_step,
        rc.view, ray_threshold=rc.ray_threshold, window=window,
        fast=fast, esl_grid=esl_grid,
        light_kd=rc.light_kd, shaded=shaded,
        phong=(rc.shading == "phong"),
        _vjp=False)
    return img, ovf


def render(rc: Raycaster) -> jax.Array:
    """Render to ``uint8[H, W, 4]``."""
    img, _ = render_float(rc)
    return sampling.write_color(img)


@functools.partial(jax.jit, static_argnames=("window", "fast"))
def render_float_stats(
    rc: Raycaster,
    window: tuple[int, int] | tuple[int, int, int] | None = None,
    fast: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``render_float`` plus the executed-band count (total march bands
    run across tiles, post-ESL-compaction and post-ERT — the
    measured-MFU work counter; see diff_v3._fwd_kernel row 5)."""
    if rc.interpolation != "trilinear":
        raise ValueError("pallas-v3 renders trilinear mode only")
    esl_grid = (rc.esl_empty, rc.esl_block_dims) if rc.esl else None
    density = rc.volume.data.astype(jnp.float32) / 255.0
    shaded = rc.shading == "diffuse"
    return render_view_v3(
        density, rc.transfer_fn.astype(jnp.float32), rc.ray_step,
        rc.view, ray_threshold=rc.ray_threshold, window=window,
        fast=fast, esl_grid=esl_grid,
        light_kd=rc.light_kd, shaded=shaded,
        phong=(rc.shading == "phong"),
        _vjp=False, stats=True)


def bands_flops(rc: Raycaster, bands: float,
                window=None) -> float:
    """Executed MXU FLOPs for ``bands`` march bands: one
    ``(R, wz*wy) x (wz*wy, wx)`` gather matmul per band per tap —
    1 tap unshaded, 2 with the diffuse light tap, 3 with phong's two
    extra shifted-weight gradient matmuls (gx reuses the base xrows)."""
    from volrt.renderers.pallas.diff_v3 import _view_window
    from volrt.renderers.pallas.layout import RAYS_PER_TILE

    dims = rc.volume.dims
    shaded = rc.shading == "diffuse" and float(rc.light_kd) > 0.0
    phong = rc.shading == "phong"
    win = _view_window(dims, rc.view, window, shaded, phong)
    taps = 3 if phong else (2 if shaded else 1)
    return bands * 2.0 * RAYS_PER_TILE * win[0] * win[1] * win[2] * taps
