"""Renderer 2 — straightforward Pallas kernel (nearest-neighbor, bucketed TF).

The GPURenderer1/2-analog rung (reference: GPURenderer1.cu:30-63,
GPURenderer23.cu:20-53): the identical march algorithm as the golden renderer,
one Pallas grid step per 16x16 ray tile, whole volume resident in VMEM
(the CUDA "global/constant memory" analog — no blocking yet).

TPU-native sampling decomposition (see package docstring):
  * the (z, y) voxel row is fetched with a one-hot matmul on the MXU over the
    flattened ``(Z*Y, Xpad)`` volume,
  * the x voxel is picked with a same-shape lane gather,
  * the transfer-function bucket lookup is a second one-hot matmul.

Masked lockstep march with tile-level early exit replaces per-thread ERT
``break``; the leading ESL leap is precomputed outside the kernel
(layout.prepare_ray_tiles).

Scope: volumes with ``W <= 128`` and ``D*H <= 4096`` (e.g. up to 64^3) — the
one-hot over all (z, y) rows is the deliberate naivety of this rung; rungs 3/4
replace it with windowed bricks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volrt.constants import (
    SHADE_ALPHA_GATE,
    SHADE_KD_GATE,
    SHADE_LIGHT_OFFSET,
    TF_RATIO,
    TF_SIZE,
)
from volrt.core import sampling
from volrt.core.types import Raycaster
from volrt.renderers.pallas import layout
from volrt.renderers.pallas.common import (
    interpret_mode,
    pad_volume_2d,
    pad_tf,
    scalars_array,
    tpu_compiler_params,
)

NAME = "pallas-nn"

MAX_ZY_ROWS = 4096
R = layout.RAYS_PER_TILE


def _kernel(
    scal_ref,  # SMEM (1, 8): ray_threshold, light_kd, light xyz
    rays_ref,  # VMEM (1, R, 16)
    vol_ref,   # VMEM (ZY, Xpad) f32
    tf_ref,    # VMEM (TF_SIZE, 128) f32, lanes 0..3 = premult RGBA
    out_ref,   # VMEM (1, R, 4)
    *,
    dims: tuple[int, int, int],
    ray_step: float,
    n_steps: int,
):
    w, h, d = dims
    xpad = vol_ref.shape[1]
    rays = rays_ref[0]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    k0, kfar = rays[:, 6:7], rays[:, 7:8]
    alive0 = rays[:, 8:9]  # f32 mask (bool carries crash Mosaic)

    thr = scal_ref[0, 0]
    kd = scal_ref[0, 1]
    lx, ly, lz = scal_ref[0, 2], scal_ref[0, 3], scal_ref[0, 4]

    zy_iota = jax.lax.broadcasted_iota(jnp.int32, (R, d * h), 1)
    tf_iota = jax.lax.broadcasted_iota(jnp.int32, (R, TF_SIZE), 1)

    def sample_at(px, py, pz):
        """Nearest-neighbor sample as f32 in [0, 255] (..shape (R,1)..).

        map_float_int truncation semantics (reference: common.h:105-110,
        ModelBase.h:17-23).
        """
        ix = jnp.clip(((px + 1.0) * 0.5 * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(((py + 1.0) * 0.5 * h).astype(jnp.int32), 0, h - 1)
        iz = jnp.clip(((pz + 1.0) * 0.5 * d).astype(jnp.int32), 0, d - 1)
        row = iz * h + iy  # z-major linearization (reference: ModelBase.h:22)
        onehot = (zy_iota == row).astype(jnp.float32)
        xrows = jax.lax.dot_general(
            onehot, vol_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R, Xpad)
        ixb = jnp.broadcast_to(ix, (R, xpad))
        return jnp.take_along_axis(xrows, ixb, axis=1)[:, 0:1]

    def body(carry):
        i, k, accr, accg, accb, acca, alive = carry
        px = ox + dx * k
        py = oy + dy * k
        pz = oz + dz * k

        sval = sample_at(px, py, pz)
        bucket = sval.astype(jnp.int32) // TF_RATIO
        tf_oh = (tf_iota == bucket).astype(jnp.float32)
        color = jax.lax.dot_general(
            tf_oh, tf_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R, 128); lanes 0..3 = premultiplied RGBA
        cr, cg, cb, ca = (
            color[:, 0:1], color[:, 1:2], color[:, 2:3], color[:, 3:4]
        )

        # Diffuse shading: one extra tap toward the light, gated
        # (reference: RaycasterBase.h:87-98, CPURenderer.cpp:32-33).
        wx, wy_, wz = lx - px, ly - py, lz - pz
        inv = jax.lax.rsqrt(wx * wx + wy_ * wy_ + wz * wz)
        sl = sample_at(
            px + wx * inv * SHADE_LIGHT_OFFSET,
            py + wy_ * inv * SHADE_LIGHT_OFFSET,
            pz + wz * inv * SHADE_LIGHT_OFFSET,
        )
        gate = (ca > SHADE_ALPHA_GATE) & (kd > SHADE_KD_GATE)
        diffuse = jnp.where(gate, (sl - sval) / 255.0 * kd, 0.0)
        cr, cg, cb = cr + diffuse, cg + diffuse, cb + diffuse

        # Front-to-back premultiplied composite, masked per ray
        # (reference: CPURenderer.cpp:34).
        f = alive * (1.0 - acca)
        accr = accr + cr * f
        accg = accg + cg * f
        accb = accb + cb * f
        acca = acca + ca * f

        k = k + ray_step
        alive = (
            alive
            * (acca <= thr).astype(jnp.float32)   # ERT
            * (k <= kfar).astype(jnp.float32)
        )
        return i + 1, k, accr, accg, accb, acca, alive

    def cond(carry):
        i, _, _, _, _, _, alive = carry
        return (i < n_steps) & jnp.any(alive > 0.0)

    zeros = jnp.zeros((R, 1), jnp.float32)
    init = (0, k0, zeros, zeros, zeros, zeros, alive0)
    _, _, accr, accg, accb, acca, _ = jax.lax.while_loop(cond, body, init)
    out_ref[0] = jnp.concatenate([accr, accg, accb, acca], axis=1)


@functools.partial(jax.jit, static_argnames=("shade",))
def render_float(rc: Raycaster, shade: bool = True) -> jax.Array:
    """Render to a float RGBA image ``f32[H, W, 4]``."""
    del shade  # this rung always evaluates the (gated) shading tap
    w, h = rc.view.dims
    vw, vh, vd = rc.volume.dims
    if vw > 128 or vh * vd > MAX_ZY_ROWS:
        raise ValueError(
            f"pallas-nn supports volumes with W<=128 and D*H<={MAX_ZY_ROWS}; "
            f"got {rc.volume.dims} — use pallas-trilinear or pallas-blocked"
        )
    rays = layout.prepare_ray_tiles(rc)
    t = rays.shape[0]
    vol2d = pad_volume_2d(rc.volume)
    tfp = pad_tf(rc.transfer_fn)
    scal = scalars_array(rc)

    kernel = functools.partial(
        _kernel,
        dims=rc.volume.dims,
        ray_step=rc.ray_step,
        n_steps=layout.max_steps(rc.ray_step),
    )
    out = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, layout.N_CHANNELS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, R, 4), jnp.float32),
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, rays, vol2d, tfp)
    return layout.untile_rays(out, w, h)


def render(rc: Raycaster) -> jax.Array:
    """Render to ``uint8[H, W, 4]``."""
    return sampling.write_color(render_float(rc))
