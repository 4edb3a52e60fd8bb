"""High-level API for the fused Pallas differentiable renderer.

``render_image_fused(scene, view)`` matches ``render_diff_image`` semantics
(trilinear density sampling, TF lerp, front-to-back compositing, ERT) but
runs the march and its analytic backward as Pallas kernels — the TPU fast
path for training. Requires volume ``W <= 128`` (VMEM-resident variant).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from volrt.diff.render import DiffScene
from volrt.renderers.pallas import diff_tri, layout
from volrt.renderers.pallas.common import X_LANES


# VMEM-resident variant budget: volume + gradient both live in VMEM
# (~16 MB/core on this chip), so (Dpad * Hpad) * 128 lanes * 4 B * 2 must fit.
_VMEM_ROW_LIMIT = 96 * 96


def _pad_density(density: jax.Array) -> jax.Array:
    d, h, w = density.shape
    dp = -(-d // 8) * 8
    hp = -(-h // 8) * 8
    xp = -(-w // X_LANES) * X_LANES
    return jnp.pad(
        density.astype(jnp.float32),
        ((0, dp - d), (0, hp - h), (0, xp - w)),
    )


def _pad_tf_premult(tf_base: jax.Array) -> jax.Array:
    premult = jnp.concatenate(
        [tf_base[:, :3] * tf_base[:, 3:4], tf_base[:, 3:4]], axis=-1
    )
    return jnp.pad(premult, ((0, 0), (0, X_LANES - 4)))


def _v3_fits(scene, view, window=None) -> bool:
    """The v3 lane-major kernels require every 8x8-ray tile's per-band
    footprint to fit one 128-lane x window: true whenever the viewport
    resolution is in the same ballpark as the volume resolution (all
    production/training configs). Heavily minified renders fall back to
    the round-1 blocked kernels. An explicit pose-tuned ``window``
    overrides the conservative default-window estimate (its validity is
    enforced by the plan replay / in-kernel overflow counters — e.g.
    the G=64 probes, whose default windows overshoot the envelope)."""
    from volrt.renderers.pallas import diff_v3

    d, h, w = scene.density.shape
    if window is not None:
        wz = int(window[0])
    else:
        wz, _, _ = diff_v3.default_window(
            (w, h, d), view.dims, view.perspective)
    span = wz + diff_v3.G  # footprint + in-group drift
    return span + 2 * diff_v3.MARGIN + 8 <= 112


@partial(jax.jit,
         static_argnames=("ray_threshold", "window", "blocked", "fast",
                          "esl", "flush", "shaded", "phong",
                          "need_tf_grad", "need_density_grad"))
def render_image_fused(
    scene: DiffScene,
    view,
    ray_threshold=0.95,
    window: tuple[int, int] | None = None,
    blocked: bool | None = None,
    fast: bool = False,
    esl: bool = False,
    flush: tuple[int, int] | None = None,
    shaded: bool = False,
    light_kd=0.6,
    phong: bool = False,
    plan=None,
    need_tf_grad: bool = True,
    need_density_grad: bool = True,
) -> jax.Array:
    """Differentiable render -> ``f32[H, W, 4]`` (fused Pallas fwd/bwd).

    ``blocked=None`` auto-selects: the v3 lane-major kernels whenever the
    view fits their footprint envelope (the production path), then the
    round-1 VMEM-resident kernel for small volumes, then the round-1
    HBM/DMA blocked kernel (any size, any minification).
    """
    from volrt.renderers.pallas import diff_blocked

    d, h, w = scene.density.shape
    dims = (w, h, d)
    if blocked is None and _v3_fits(scene, view, window):
        from volrt.renderers.pallas.diff_v3 import render_image_v3

        return render_image_v3(
            scene, view, ray_threshold=ray_threshold,
            window=window, fast=fast, esl=esl, flush=flush,
            shaded=shaded, phong=phong,
            light_kd=(light_kd if (shaded or phong) else 0.0),
            plan=plan, need_dtf=need_tf_grad,
            need_dvol=need_density_grad)
    if plan is not None:
        raise NotImplementedError(
            "plan= requires the v3 path (this view falls outside its "
            "footprint envelope)")
    if shaded or phong:
        raise NotImplementedError(
            "shading requires the v3 path (this view falls outside "
            "its footprint envelope)")
    if esl:
        raise NotImplementedError(
            "esl=True requires the v3 path (this view falls outside its "
            "footprint envelope)")
    if blocked is None:
        dp, hp = -(-d // 8) * 8, -(-h // 8) * 8
        blocked = (w > X_LANES) or (dp * hp > _VMEM_ROW_LIMIT)
    if w > X_LANES and not blocked:
        raise ValueError(
            f"fused VMEM diff path requires volume W <= {X_LANES}; got {w}"
        )
    rays = layout.prepare_ray_tiles_raw(view, scene.ray_step)
    vol = _pad_density(scene.density)
    tfp = _pad_tf_premult(scene.tf_base)
    scal = jnp.concatenate([
        jnp.asarray(ray_threshold, jnp.float32).reshape(1),
        jnp.zeros(7, jnp.float32),
    ]).reshape(1, 8)
    if blocked:
        if window is None:
            window = diff_blocked.default_window(
                dims, view.dims, view.perspective
            )
        out = diff_blocked.render_tiles_diff_blocked(
            scal, rays, vol, tfp, dims, scene.ray_step, window, fast
        )
    else:
        if window is None:
            window = diff_tri.default_window(
                dims, view.dims, view.perspective
            )
        out = diff_tri.render_tiles_diff(
            scal, rays, vol, tfp, dims, scene.ray_step, window, fast
        )
    wv, hv = view.dims
    return layout.untile_rays(out, wv, hv)


def l2_loss_fused(scene: DiffScene, view, target: jax.Array,
                  fast: bool = False, shaded: bool = False,
                  light_kd=0.6, phong: bool = False,
                  esl: bool = False, plan=None,
                  window: tuple | None = None,
                  flush: tuple[int, int] | None = None,
                  need_tf_grad: bool = True,
                  need_density_grad: bool = True) -> jax.Array:
    """MSE training loss through the fused kernels. ``window``/``flush``
    are static per-pose kernel tunings (e.g. from
    ``diff_v3.auto_window(..., shaded=..., phong=...)`` — a tuned shaded
    window measured 2.5-3x over the conservative default at 256^3;
    validate ``flush`` with ``diff_v3.planned_flush_lost`` first)."""
    img = render_image_fused(scene, view, fast=fast, shaded=shaded,
                             light_kd=light_kd, phong=phong, esl=esl,
                             plan=plan, window=window, flush=flush,
                             need_tf_grad=need_tf_grad,
                             need_density_grad=need_density_grad)
    return jnp.mean((img - target) ** 2)
