"""Volume-sharded rendering: Z-slab partitioning with segment compositing.

The volumetric cousin of context/ring parallelism (SURVEY §2 stretch
component; no reference counterpart): when the volume itself exceeds one
device's memory, each device holds one Z-slab (plus a one-voxel halo for
trilinear taps) and marches every ray only through its own slab. Per-ray
partial (color, alpha) segments then compose across devices in ray order —
front-to-back compositing is associative over segments:

    (C1, A1) ⊕ (C2, A2) = (C1 + C2*(1 - A1), A1 + A2*(1 - A1))

Samples stay on each ray's *global* lattice ``knear + i*step`` (each slab
starts at the first lattice point inside it), so the composed image equals
the unsharded render up to fp reassociation (~1e-6).

Restriction: all rays must traverse slabs in the same z order (uniform sign
of the ray direction's z component — true for orbit-camera views that are
not exactly side-on; side-on views should shard along a different axis by
pre-transposing the volume).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from volrt.core import rays as rays_mod
from volrt.diff.render import DiffScene
from volrt.dist.mesh import RAY_AXIS


def shard_slabs(density: jax.Array, n: int) -> jax.Array:
    """Split ``f32[D, H, W]`` into ``n`` Z-slabs with 1-voxel halos:
    returns ``f32[n, D/n + 2, H, W]`` (edge slabs clamp-padded)."""
    d, h, w = density.shape
    if d % n:
        raise ValueError(f"volume depth {d} not divisible by {n} slabs")
    slab = d // n
    padded = jnp.pad(density, ((1, 1), (0, 0), (0, 0)), mode="edge")
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(padded, k * slab, slab + 2, 0)
         for k in range(n)]
    )


def _sample_slab(slab: jax.Array, z_start: int, full_d: int,
                 pos: jax.Array) -> jax.Array:
    """Trilinear sample of one halo'd slab at world positions, using the
    FULL volume's coordinate mapping (so samples match the unsharded
    renderer exactly). ``slab`` is ``(slab_d + 2, H, W)`` covering global
    z voxels ``[z_start - 1, z_start + slab_d]`` (clamped)."""
    sd, h, w = slab.shape
    nvec = jnp.array([w, h, full_d], jnp.float32)
    t = (pos + 1.0) * 0.5 * nvec - 0.5
    i0 = jnp.floor(t)
    frac = t - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    # Global clamp (CUDA clamp addressing), then remap z to slab-local.
    nmax = jnp.array([w - 1, h - 1, full_d - 1], jnp.int32)
    i0 = jnp.clip(i0, 0, nmax)
    i1 = jnp.clip(i1, 0, nmax)
    x0, y0 = i0[..., 0], i0[..., 1]
    x1, y1 = i1[..., 0], i1[..., 1]
    z0 = jnp.clip(i0[..., 2] - (z_start - 1), 0, sd - 1)
    z1 = jnp.clip(i1[..., 2] - (z_start - 1), 0, sd - 1)
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]

    c000 = slab[z0, y0, x0]
    c001 = slab[z0, y0, x1]
    c010 = slab[z0, y1, x0]
    c011 = slab[z0, y1, x1]
    c100 = slab[z1, y0, x0]
    c101 = slab[z1, y0, x1]
    c110 = slab[z1, y1, x0]
    c111 = slab[z1, y1, x1]
    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def _segment_render(slab, z_start, full_d, tf_base, ray_step, view):
    """Render one slab's (color, alpha) segment for every ray."""
    from volrt.constants import TF_SIZE

    origins, directions = rays_mod.get_rays(view)
    knear, kfar, hit = rays_mod.intersect_aabb(origins, directions)

    sd = slab.shape[0] - 2
    z_lo = -1.0 + 2.0 * z_start / full_d
    z_hi = -1.0 + 2.0 * (z_start + sd) / full_d
    oz = origins[..., 2]
    dz = jnp.where(directions[..., 2] == 0.0, 1e-5, directions[..., 2])
    ka = (z_lo - oz) / dz
    kb = (z_hi - oz) / dz
    k_in = jnp.maximum(jnp.minimum(ka, kb), knear)
    k_out = jnp.minimum(jnp.maximum(ka, kb), kfar)

    # First global lattice point inside the slab keeps samples identical to
    # the unsharded march.
    j0 = jnp.ceil(jnp.maximum(k_in - knear, 0.0) / ray_step)
    k0 = knear + j0 * ray_step

    premult = jnp.concatenate(
        [tf_base[:, :3] * tf_base[:, 3:4], tf_base[:, 3:4]], axis=-1
    )

    def tf_lookup(val):
        t = val * TF_SIZE - 0.5
        i0 = jnp.floor(t)
        frac = (t - i0)[..., None]
        i0 = i0.astype(jnp.int32)
        lo = jnp.clip(i0, 0, TF_SIZE - 1)
        hi = jnp.clip(i0 + 1, 0, TF_SIZE - 1)
        return premult[lo] * (1 - frac) + premult[hi] * frac

    n_steps = int(math.ceil(2.0 * math.sqrt(3.0) / ray_step)) + 2

    def step(carry, i):
        acc = carry
        k = k0 + i * ray_step
        pt = origins + directions * k[..., None]
        val = _sample_slab(slab, z_start, full_d, pt)
        color = tf_lookup(val)
        mask = (hit & (k <= k_out))[..., None]
        acc = acc + jnp.where(mask, color * (1.0 - acc[..., 3:4]), 0.0)
        return acc, None

    acc0 = jnp.zeros(origins.shape[:-1] + (4,), jnp.float32)
    acc, _ = jax.lax.scan(
        step, acc0, jnp.arange(n_steps, dtype=jnp.float32)
    )
    return acc


def compose_segments(segments: jax.Array, front_to_back: bool) -> jax.Array:
    """Fold per-slab segments ``(n, H, W, 4)`` in ray order."""
    n = segments.shape[0]
    order = range(n) if front_to_back else range(n - 1, -1, -1)

    acc = jnp.zeros_like(segments[0])
    for i in order:
        seg = segments[i]
        acc = acc + seg * (1.0 - acc[..., 3:4])
    return acc


@partial(jax.jit, static_argnames=("mesh",))
def render_volume_sharded(
    scene: DiffScene, view, mesh: Mesh
) -> jax.Array:
    """Render with the volume Z-slab-sharded across ``mesh`` ->
    ``f32[H, W, 4]``. Differentiable w.r.t. the scene (pure XLA).

    Each device holds one halo'd slab (shard_map over the mesh axis),
    renders its segment of every ray, all-gathers the per-slab segments
    over the mesh (ICI), and folds them in ray order. No ERT across slabs
    (a device cannot know upstream opacity without a serial dependency);
    rays march their full slab segment.
    """
    n = mesh.devices.size
    d = scene.density.shape[0]
    slab = d // n
    slabs = shard_slabs(scene.density, n)
    tf_base, ray_step = scene.tf_base, scene.ray_step

    def per_device(slab_block, tfb):
        idx = jax.lax.axis_index(RAY_AXIS)
        z_start = idx * slab
        seg = _segment_render(
            slab_block[0], z_start, d, tfb, ray_step, view
        )
        segs = jax.lax.all_gather(seg, RAY_AXIS)  # (n, H, W, 4)
        f2b = compose_segments(segs, True)
        b2f = compose_segments(segs, False)
        return jnp.where(view.direction[2] >= 0, f2b, b2f)

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(slabs, tf_base)
