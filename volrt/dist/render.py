"""Sharded rendering: ray tiles split across a device mesh.

Forward rendering is embarrassingly parallel over pixels; the Pallas kernels
are shard_map'ed over the tile axis (XLA cannot auto-partition a custom
kernel), volume and TF replicated. This is the TPU equivalent of scaling the
reference's 16x16 thread-block grid across chips/hosts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from volrt.core import sampling
from volrt.core.types import Raycaster
from volrt.dist.mesh import RAY_AXIS
from volrt.renderers.pallas import layout


def _pad_tiles(rays: jax.Array, n_dev: int) -> jax.Array:
    """Pad the tile axis to a multiple of the device count (dead tiles)."""
    t = rays.shape[0]
    tp = -(-t // n_dev) * n_dev
    if tp == t:
        return rays
    return jnp.pad(rays, ((0, tp - t), (0, 0), (0, 0)))


@partial(jax.jit, static_argnames=("mesh", "renderer", "window", "shade"))
def render_float_sharded(
    rc: Raycaster,
    mesh: Mesh,
    renderer: str = "pallas-blocked",
    window: tuple[int, int] | None = None,
    shade: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Render with ray tiles sharded over ``mesh``; returns (image, overflow).

    ``renderer``: ``"pallas-trilinear"`` or ``"pallas-blocked"``.
    """
    del shade
    if renderer == "pallas-trilinear":
        from volrt.renderers.pallas import trilinear as mod
        from volrt.renderers.pallas.common import pad_volume_3d as pad_vol

        vol = pad_vol(rc.volume)
    elif renderer == "pallas-blocked":
        from volrt.renderers.pallas import blocked as mod
        from volrt.renderers.pallas.common import pad_volume_3d_any

        vol = pad_volume_3d_any(rc.volume, jnp.uint8)
    else:
        raise ValueError(f"unknown sharded renderer: {renderer}")

    from volrt.renderers.pallas.common import pad_tf, scalars_array

    w, h = rc.view.dims
    rays = layout.prepare_ray_tiles(rc)
    t = rays.shape[0]
    n_dev = mesh.devices.size
    rays = _pad_tiles(rays, n_dev)
    tfp = pad_tf(rc.transfer_fn)
    scal = scalars_array(rc)
    if window is None:
        window = mod.default_window(rc)

    tile_fn = partial(
        mod.render_tiles,
        dims=rc.volume.dims,
        ray_step=rc.ray_step,
        window=window,
    )
    sharded = jax.shard_map(
        lambda s, r, v, tf: tile_fn(s, r, v, tf),
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(), P()),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )
    out, ovf = sharded(scal, rays, vol, tfp)
    return layout.untile_rays(out[:t], w, h), jnp.sum(ovf[:t, 0, 0])


def render_sharded(rc: Raycaster, mesh: Mesh, **kw) -> jax.Array:
    img, _ = render_float_sharded(rc, mesh, **kw)
    return sampling.write_color(img)


def l2_loss_grads_v3_sharded(scene, view, target, mesh,
                             ray_threshold=0.95, fast=True,
                             window=None, flush=None,
                             shading=None, light_kd=0.6):
    """MSE loss + scene gradients with ray tiles shard_map'ed over
    ``mesh`` through the v3 fused differentiable kernels.

    The data-parallel training configuration of BASELINE.md on the fast
    path: each device runs the fused forward+backward on its tile shard
    (volume/TF replicated, P() in-specs); the shard_map transpose psums
    the replicated operands' cotangents over ICI automatically. Loss and
    gradients match the single-device fused path exactly (the loss is
    additive over tiles).
    """
    from volrt.renderers.pallas.diff_v3 import (
        G, TILE, _norm_window, _phase_volumes, _brick_shape,
        default_window, plan_windows, render_tiles_v3)

    d, h, w = scene.density.shape
    dims = (w, h, d)
    wv, hv = view.dims
    shaded = shading == "diffuse"
    phong = shading == "phong"
    if window is None:
        window = default_window(dims, view.dims, view.perspective)
        if shaded or phong:
            # Light-tap / gradient-tap footprint widening (matches
            # diff_v3.render_view_v3's shaded default).
            off = (int(0.01 * 0.5 * max(dims)) + 2) if shaded else 2
            window = (
                min(window[0] + off, -(-dims[2] // 8) * 8),
                min(-(-(window[1] + off) // 8) * 8,
                    -(-dims[1] // 8) * 8),
                window[2])
    window = _norm_window(window)
    if len(window) == 5:
        window = window + (0,)  # xbox opt-in only (see _view_window)
    wp, hp = layout.pad_dims(wv, hv, TILE, TILE)
    tgt = jnp.asarray(target, jnp.float32)
    tgt = jnp.pad(tgt, ((0, hp - hv), (0, wp - wv), (0, 0)))
    tgt_t = layout.tile_rays(tgt, wv, hv, tile_w=TILE, tile_h=TILE)
    n_dev = mesh.devices.size
    tgt_t = _pad_tiles(tgt_t, n_dev)
    denom = float(hv) * float(wv) * 4.0
    fl = None if flush is None else tuple(flush)

    def loss_fn(sc):
        premult = jnp.concatenate(
            [sc.tf_base[:, :3] * sc.tf_base[:, 3:4],
             sc.tf_base[:, 3:4]], axis=-1)
        tfl = jnp.pad(premult, ((0, 0), (0, 4)))
        vols = _phase_volumes(
            sc.density, window[2],
            storage=jnp.bfloat16 if fast else None)
        bz, by = _brick_shape(vols[0].shape, window[0], window[1],
                              window[3:5])
        tiles = layout.prepare_ray_tiles_raw(
            view, sc.ray_step, None, tile_w=TILE, tile_h=TILE)
        tiles = _pad_tiles(tiles, n_dev)
        lp = view.light_pos.astype(jnp.float32).reshape(3)
        scal = jnp.concatenate([
            jnp.asarray(ray_threshold, jnp.float32).reshape(1),
            jnp.asarray(
                light_kd if (shaded or phong) else 0.0,
                jnp.float32).reshape(1),
            lp, jnp.zeros(3, jnp.float32)]).reshape(1, 8)

        # Window planning is pure XLA — partitioned automatically outside
        # the shard_map (only the Pallas kernel needs manual sharding).
        org = plan_windows(
            tiles, dims, vols[0].shape, sc.ray_step, window[0],
            window[1], bz, by, wx=window[2], view_dims=view.dims)
        rays_t = jnp.swapaxes(tiles, 1, 2)

        def shard_fn(scal, org_l, rays_l, tgt_l, tfl, *vols):
            out = render_tiles_v3(
                scal, org_l, rays_l, tuple(vols), tfl, dims,
                sc.ray_step, window, fast, shaded, fl, False, phong)
            diff = out[:, :4, :] - jnp.swapaxes(tgt_l, 1, 2)
            return jax.lax.psum(jnp.sum(diff * diff), RAY_AXIS)

        sq = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(),
                      *([P()] * len(vols))),
            out_specs=P(),
            check_vma=False,
        )(scal, org, rays_t, tgt_t, tfl, *vols)
        return sq / denom

    return jax.value_and_grad(loss_fn)(scene)
