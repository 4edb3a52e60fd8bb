"""Renderer 4 — blocked/DMA Pallas kernel (HBM-resident volume, any size).

The flagship large-volume rung. Same trilinear + interpolated-TF semantics as
rung 3 (reference: GPURenderer4.cu:53-87), but the volume stays in HBM as
``uint8[D, H, Xpad]`` and each march step DMAs only the ray tile's current
``(WZ, WY, 128)`` window brick into a VMEM scratch buffer — the TPU analog of
the reference's 3D-texture-cache working set, made explicit. This removes the
VMEM residency limit of rung 3 (256^3+ volumes, W > 128); the x axis becomes
windowed exactly like z/y (aligned to 128-lane blocks, chunked lane gathers).

The VMEM brick carries drift headroom (BRICK_*_PAD) and is re-DMAed only
when the tile's window leaves it, so consecutive bands reuse the resident
voxels instead of refetching ~15/16 of the same data. uint8 bricks quarter
the DMA traffic; conversion to f32 happens on-chip after the copy (the CUDA
analog: textures store uchar and convert on fetch).
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
    TF_SIZE,
)
from volrt.core import sampling
from volrt.core.types import Raycaster
from volrt.renderers.pallas import layout
from volrt.renderers.pallas.common import (
    X_LANES,
    interpret_mode,
    pad_tf,
    pad_volume_3d_any,
    scalars_array,
    tpu_compiler_params,
)

NAME = "pallas-blocked"

R = layout.RAYS_PER_TILE
MARGIN = 2
WX = X_LANES  # x window width = one lane gather's reach

# Resident-brick headroom: the VMEM brick covers the window plus drift room
# and is re-DMAed only when the window leaves it (amortizes HBM traffic
# ~BRICK_Z_PAD-fold for near-axis views).
BRICK_Z_PAD = 16
BRICK_Y_PAD = 8


def _kernel(
    scal_ref,    # SMEM (1, 8)
    rays_ref,    # VMEM (1, R, 16)
    vol_ref,     # ANY/HBM (D, H, Xpad) u8
    tf_ref,      # VMEM (TF_SIZE, 128) f32
    out_ref,     # VMEM (1, R, 4)
    ovf_ref,     # VMEM (1, 8, 128) f32
    brick_ref,   # scratch VMEM (WZ, WY, WX) u8
    sem,         # DMA semaphore
    *,
    dims: tuple[int, int, int],
    ray_step: float,
    n_steps: int,
    wz: int,
    wy: int,
    wxb: int,
    fast: bool = False,
    shade: bool = True,
):
    w, h, d = dims
    rays = rays_ref[0]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    k0, kfar = rays[:, 6:7], rays[:, 7:8]
    alive0 = rays[:, 8:9]
    j0 = rays[:, 9:10]  # per-ray k-band offset (layout.CH_J0)

    thr = scal_ref[0, 0]
    kd = scal_ref[0, 1]
    lx, ly, lz = scal_ref[0, 2], scal_ref[0, 3], scal_ref[0, 4]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, wz * wy), 1)
    tf_iota = jax.lax.broadcasted_iota(jnp.int32, (R, TF_SIZE), 1)

    def coords(px, py, pz):
        tx = (px + 1.0) * 0.5 * w - 0.5
        ty = (py + 1.0) * 0.5 * h - 0.5
        tz = (pz + 1.0) * 0.5 * d - 0.5
        fx0, fy0, fz0 = jnp.floor(tx), jnp.floor(ty), jnp.floor(tz)
        return (
            fx0.astype(jnp.int32), tx - fx0,
            fy0.astype(jnp.int32), ty - fy0,
            fz0.astype(jnp.int32), tz - fz0,
        )

    def window_sample(alive, brick, z0, y0, x0, px, py, pz):
        ix0, fx, iy0, fy, iz0, fz = coords(px, py, pz)
        ix0c = jnp.clip(ix0, 0, w - 1)
        ix1c = jnp.clip(ix0 + 1, 0, w - 1)
        iy0c = jnp.clip(iy0, 0, h - 1)
        iy1c = jnp.clip(iy0 + 1, 0, h - 1)
        iz0c = jnp.clip(iz0, 0, d - 1)
        iz1c = jnp.clip(iz0 + 1, 0, d - 1)

        lz0, lz1 = iz0c - z0, iz1c - z0
        ly0, ly1 = iy0c - y0, iy1c - y0
        lx0, lx1 = ix0c - x0, ix1c - x0
        ovf = (
            (lz0 < 0) | (lz1 > wz - 1)
            | (ly0 < 0) | (ly1 > wy - 1)
            | (lx0 < 0) | (lx1 > wxb - 1)
        ) & (alive > 0.0)
        lz0 = jnp.clip(lz0, 0, wz - 1)
        lz1 = jnp.clip(lz1, 0, wz - 1)
        ly0 = jnp.clip(ly0, 0, wy - 1)
        ly1 = jnp.clip(ly1, 0, wy - 1)
        lx0 = jnp.clip(lx0, 0, wxb - 1)
        lx1 = jnp.clip(lx1, 0, wxb - 1)

        wmat = (
            (row_iota == lz0 * wy + ly0) * ((1.0 - fz) * (1.0 - fy))
            + (row_iota == lz0 * wy + ly1) * ((1.0 - fz) * fy)
            + (row_iota == lz1 * wy + ly0) * (fz * (1.0 - fy))
            + (row_iota == lz1 * wy + ly1) * (fz * fy)
        ).astype(jnp.float32)
        xrows = jax.lax.dot_general(
            wmat, brick,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if fast
                       else jax.lax.Precision.HIGHEST),
        )
        def lane_gather(lx):
            # wxb may span multiple 128-lane chunks; gather per chunk and
            # select (the lane gather's reach is one 128-lane block).
            parts = []
            for c in range(wxb // WX):
                idx = jnp.clip(lx - c * WX, 0, WX - 1)
                chunk = xrows[:, c * WX:(c + 1) * WX]
                parts.append(jnp.take_along_axis(
                    chunk, jnp.broadcast_to(idx, (R, WX)), axis=1
                )[:, 0:1])
            out = parts[0]
            for c in range(1, len(parts)):
                out = jnp.where(lx >= c * WX, parts[c], out)
            return out

        g0 = lane_gather(lx0)
        g1 = lane_gather(lx1)
        val = (g0 * (1.0 - fx) + g1 * fx) / 255.0
        return val, jnp.sum(ovf.astype(jnp.float32))

    bz = brick_ref.shape[0]
    by = brick_ref.shape[1]

    def body(carry):
        (i, k, accr, accg, accb, acca, fin, novf,
         bzo, byo, bxo, bhave) = carry
        # Band marching (see trilinear.py): exact per-ray lattices, but all
        # of a band's samples lie within one step of each other.
        # Iterative k accumulation (k starts at the ray's own k0 and gains
        # one +step per taken sample) reproduces the reference's float
        # rounding exactly (reference: CPURenderer.cpp:37).
        n = i.astype(jnp.float32) - j0
        started = (n >= 0.0).astype(jnp.float32)
        alive = alive0 * started * (1.0 - fin)

        px = ox + dx * k
        py = oy + dy * k
        pz = oz + dz * k

        ix0, _, iy0, _, iz0, _ = coords(px, py, pz)
        big = jnp.int32(1 << 20)
        amask = alive > 0.0
        z0 = jnp.clip(
            jnp.min(jnp.where(amask, iz0, big)) - MARGIN,
            0, vol_ref.shape[0] - wz,
        )
        # DMA offsets must respect the uint8 (8, 128) VMEM tiling: the
        # second-to-last dim slices at multiples of 8, the lane dim at
        # multiples of 128 (the window sizes carry matching slack).
        y0 = pl.multiple_of(jnp.clip(
            (jnp.min(jnp.where(amask, iy0, big)) - MARGIN) & ~7,
            0, vol_ref.shape[1] - wy,
        ), 8)
        x0 = pl.multiple_of(jnp.clip(
            (jnp.min(jnp.where(amask, ix0, big)) - MARGIN) & ~127,
            0, vol_ref.shape[2] - wxb,
        ), 128)

        fits = (
            (bhave > 0)
            & (z0 >= bzo) & (z0 + wz <= bzo + bz)
            & (y0 >= byo) & (y0 + wy <= byo + by)
            & (x0 == bxo)
        )
        nzo = jnp.clip(z0 - BRICK_Z_PAD // 2, 0, vol_ref.shape[0] - bz)
        nyo = jnp.clip((y0 - BRICK_Y_PAD // 2) & ~7,
                       0, vol_ref.shape[1] - by)
        bzo = jnp.where(fits, bzo, nzo)
        byo = pl.multiple_of(jnp.where(fits, byo, nyo), 8)
        bxo = pl.multiple_of(jnp.where(fits, bxo, x0), 128)

        @pl.when(jnp.logical_not(fits))
        def _():
            dma = pltpu.make_async_copy(
                vol_ref.at[pl.ds(bzo, bz), pl.ds(byo, by),
                           pl.ds(bxo, wxb)],
                brick_ref,
                sem,
            )
            dma.start()
            dma.wait()

        # Mosaic has no direct u8 -> f32 cast; widen via int32.
        brick = (
            brick_ref[pl.ds(z0 - bzo, wz),
                      pl.ds(pl.multiple_of(y0 - byo, 8), wy), :]
            .astype(jnp.int32).astype(jnp.float32)
        ).reshape(wz * wy, wxb)

        sval, ovf1 = window_sample(alive, brick, z0, y0, x0, px, py, pz)

        tt = sval * TF_SIZE - 0.5
        ti0 = jnp.floor(tt)
        tfr = tt - ti0
        ti0 = ti0.astype(jnp.int32)
        tlo = jnp.clip(ti0, 0, TF_SIZE - 1)
        thi = jnp.clip(ti0 + 1, 0, TF_SIZE - 1)
        wtf = (
            (tf_iota == tlo) * (1.0 - tfr) + (tf_iota == thi) * tfr
        ).astype(jnp.float32)
        color = jax.lax.dot_general(
            wtf, tf_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if fast
                       else jax.lax.Precision.HIGHEST),
        )
        cr, cg, cb, ca = (
            color[:, 0:1], color[:, 1:2], color[:, 2:3], color[:, 3:4]
        )

        if shade:
            wxv, wyv, wzv = lx - px, ly - py, lz - pz
            inv = jax.lax.rsqrt(wxv * wxv + wyv * wyv + wzv * wzv)
            sl, ovf2 = window_sample(
                alive, brick, z0, y0, x0,
                px + wxv * inv * SHADE_LIGHT_OFFSET,
                py + wyv * inv * SHADE_LIGHT_OFFSET,
                pz + wzv * inv * SHADE_LIGHT_OFFSET,
            )
            gate = (ca > SHADE_ALPHA_GATE) & (kd > SHADE_KD_GATE)
            diffuse = jnp.where(gate, (sl - sval) * kd, 0.0)
            cr, cg, cb = cr + diffuse, cg + diffuse, cb + diffuse
        else:
            ovf2 = jnp.float32(0.0)

        f = alive * (1.0 - acca)
        accr = accr + cr * f
        accg = accg + cg * f
        accb = accb + cb * f
        acca = acca + ca * f

        k_next = jnp.where(started > 0.0, k + ray_step, k)
        done_now = started * alive0 * (
            (acca > thr) | (k_next > kfar)
        ).astype(jnp.float32)
        fin = jnp.maximum(fin, done_now)
        return (
            i + 1, k_next, accr, accg, accb, acca, fin,
            novf + ovf1 + ovf2, bzo, byo, bxo, jnp.int32(1)
        )

    def cond(carry):
        i, fin = carry[0], carry[6]
        return (i < n_steps) & jnp.any(alive0 * (1.0 - fin) > 0.0)

    zeros = jnp.zeros((R, 1), jnp.float32)
    zi = jnp.int32(0)
    init = (
        0, k0, zeros, zeros, zeros, zeros, 1.0 - alive0,
        jnp.float32(0.0), zi, zi, zi, zi,
    )
    res = jax.lax.while_loop(cond, body, init)
    i_exit = res[0]
    accr, accg, accb, acca, novf = res[2], res[3], res[4], res[5], res[7]
    out_ref[0] = jnp.concatenate([accr, accg, accb, acca], axis=1)
    # Row 0: overflow events; row 1: executed march bands (see
    # trilinear.py — the measured-MFU work counter).
    ovf_ref[0] = jnp.concatenate([
        jnp.full((1, 128), novf, jnp.float32),
        jnp.full((1, 128), i_exit.astype(jnp.float32), jnp.float32),
        jnp.zeros((6, 128), jnp.float32),
    ], axis=0)


def default_window(rc: Raycaster) -> tuple[int, int]:
    from volrt.renderers.pallas import trilinear

    wz, wy = trilinear.default_window(rc)
    # +8 slack: the DMA-aligned y start can sit up to 7 rows below the
    # footprint minimum. Never exceed the padded volume height.
    vw, vh, vd = rc.volume.dims
    return wz, min(-(-vh // 8) * 8, wy + 8)


def render_tiles(
    scal: jax.Array,
    rays: jax.Array,
    vol3d: jax.Array,
    tfp: jax.Array,
    *,
    dims: tuple[int, int, int],
    ray_step: float,
    window: tuple[int, int],
    fast: bool = False,
    shade: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Raw tile-level entry: render packed ray tiles ``(T, R, C)`` to
    ``((T, R, 4) colors, (T, 8, 128) overflow)``. shard_map-able over T."""
    t = rays.shape[0]
    wz, wy = window
    xpad = vol3d.shape[2]
    wxb = WX if xpad == WX else 2 * WX
    kernel = functools.partial(
        _kernel,
        dims=dims,
        ray_step=ray_step,
        n_steps=layout.max_bands(ray_step),
        wz=wz,
        wy=wy,
        wxb=wxb,
        fast=fast,
        shade=shade,
    )
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, layout.N_CHANNELS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, R, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, R, 4), jnp.float32),
            jax.ShapeDtypeStruct((t, 8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((min(vol3d.shape[0], wz + BRICK_Z_PAD),
                        min(vol3d.shape[1], wy + BRICK_Y_PAD), wxb),
                       jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, rays, vol3d, tfp)


@functools.partial(jax.jit, static_argnames=("shade", "window", "fast"))
def render_float(
    rc: Raycaster, shade: bool = True,
    window: tuple[int, int] | None = None,
    fast: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Render to ``(f32[H, W, 4] image, f32[] overflow_count)``.

    ``shade=False`` statically skips the diffuse light tap (use when
    ``light_kd == 0`` — the gated tap contributes nothing)."""
    if rc.interpolation != "trilinear":
        raise ValueError("pallas-blocked renders trilinear mode only")
    w, h = rc.view.dims
    rays = layout.prepare_ray_tiles(rc)
    vol3d = pad_volume_3d_any(rc.volume, jnp.uint8)
    tfp = pad_tf(rc.transfer_fn)
    scal = scalars_array(rc)
    if window is None:
        window = default_window(rc)
    out, ovf = render_tiles(
        scal, rays, vol3d, tfp,
        dims=rc.volume.dims, ray_step=rc.ray_step, window=window,
        fast=fast, shade=shade,
    )
    return layout.untile_rays(out, w, h), jnp.sum(ovf[:, 0, 0])


def render(rc: Raycaster) -> jax.Array:
    """Render to ``uint8[H, W, 4]``."""
    img, _ = render_float(rc)
    return sampling.write_color(img)


@functools.partial(jax.jit, static_argnames=("shade", "window", "fast"))
def render_float_stats(
    rc: Raycaster, shade: bool = True,
    window: tuple[int, int] | None = None,
    fast: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``render_float`` plus the executed-band count (see trilinear.py)."""
    if rc.interpolation != "trilinear":
        raise ValueError("pallas-blocked renders trilinear mode only")
    w, h = rc.view.dims
    rays = layout.prepare_ray_tiles(rc)
    vol3d = pad_volume_3d_any(rc.volume, jnp.uint8)
    tfp = pad_tf(rc.transfer_fn)
    scal = scalars_array(rc)
    if window is None:
        window = default_window(rc)
    out, ovf = render_tiles(
        scal, rays, vol3d, tfp,
        dims=rc.volume.dims, ray_step=rc.ray_step, window=window,
        fast=fast, shade=shade,
    )
    return (layout.untile_rays(out, w, h), jnp.sum(ovf[:, 0, 0]),
            jnp.sum(ovf[:, 1, 0]))


def bands_flops(rc: Raycaster, bands: float,
                window: tuple[int, int] | None = None) -> float:
    """Executed MXU FLOPs for ``bands`` march bands (x-window lanes wxb)."""
    wz, wy = window or default_window(rc)
    vw = rc.volume.dims[0]
    wxb = WX if vw <= WX else 2 * WX
    taps = 2 if float(rc.light_kd) > 0.0 else 1
    return bands * 2.0 * R * wz * wy * wxb * taps
