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
