"""Fused differentiable renderer, blocked variant: HBM-resident float
density volume of any size (256^3+), DMA-staged window bricks, and an HBM
gradient buffer accumulated through a drift-flushed VMEM accumulator.

This is the kernel behind the BASELINE.md headline configuration (256^3
volume, 1024^2 rays, forward+backward): VMEM (~16 MB on this chip) cannot
hold volume + gradient, so both stream:

  * forward samples read a drift-refetched resident VMEM brick (like the
    rung-4 renderer, but float density instead of uint8),
  * backward voxel gradients accumulate into a VMEM buffer ``(AZ, AY, AXB)``
    that tracks the tile's moving window; when the window drifts out of the
    buffer's coverage the buffer is read-modify-write flushed into the HBM
    ``dvol`` output (aliased input, zero-initialized by the caller) and
    re-centered. Near-axis views flush a handful of times per tile; oblique
    views every ~``AZ - wz`` bands. The grid is sequential, so RMW is
    race-free.

TF gradients accumulate in a VMEM-resident output exactly as in diff_tri.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volrt.constants import TF_SIZE
from volrt.renderers.pallas import layout
from volrt.renderers.pallas.common import (
    X_LANES,
    interpret_mode,
    tpu_compiler_params,
)
from volrt.renderers.pallas.diff_tri import (
    _coords,
    _mm,
    _mm_t,
    _tap_weights,
    _tf_weights,
)

R = layout.RAYS_PER_TILE
MARGIN = 2
WX = X_LANES

# Accumulator headroom beyond the window (z drifts ~1 voxel per band).
ACC_Z_PAD = 32
ACC_Y_PAD = 16

# Resident-brick headroom: the brick is refetched only when the window
# drifts out of it (~every BRICK_Z_PAD bands for near-axis views), so the
# per-band DMA cost is amortized ~BRICK_Z_PAD-fold.
BRICK_Z_PAD = 16
BRICK_Y_PAD = 8


def _lane_gather(xrows, lx, wxb):
    """Per-ray x gather over up to ``wxb`` lanes (chunked by 128)."""
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


def _window_origin(alive, ix0, iy0, iz0, vol_shape, wz, wy, wxb):
    """Aligned window origin from the active rays' footprint minimum."""
    big = jnp.int32(1 << 20)
    amask = alive > 0.0
    z0 = jnp.clip(jnp.min(jnp.where(amask, iz0, big)) - MARGIN,
                  0, vol_shape[0] - wz)
    y0 = jnp.clip((jnp.min(jnp.where(amask, iy0, big)) - MARGIN) & ~7,
                  0, vol_shape[1] - wy)
    x0 = jnp.clip((jnp.min(jnp.where(amask, ix0, big)) - MARGIN) & ~127,
                  0, vol_shape[2] - wxb)
    # The masks guarantee divisibility; the hints let Mosaic's DMA-offset
    # prover see it (vol_shape dims are themselves multiples of 8/128).
    return z0, pl.multiple_of(y0, 8), pl.multiple_of(x0, 128)


def _fwd_kernel(
    scal_ref, rays_ref, vol_ref, tf_ref, out_ref,
    brick_ref, sem,
    *, dims, ray_step, n_steps, wz, wy, wxb, fast=False,
):
    w, h, d = dims
    rays = rays_ref[0]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    k0, kfar = rays[:, 6:7], rays[:, 7:8]
    alive0 = rays[:, 8:9]
    j0 = rays[:, 9:10]
    thr = scal_ref[0, 0]

    bz = brick_ref.shape[0]
    by = brick_ref.shape[1]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, wz * wy), 1)
    tf_iota = jax.lax.broadcasted_iota(jnp.int32, (R, TF_SIZE), 1)

    def brick_origin_for(z0, y0):
        bzo = jnp.clip(z0 - BRICK_Z_PAD // 2, 0, vol_ref.shape[0] - bz)
        byo = jnp.clip((y0 - BRICK_Y_PAD // 2) & ~7,
                       0, vol_ref.shape[1] - by)
        return bzo, pl.multiple_of(byo, 8)

    def body(carry):
        i, k, accr, accg, accb, acca, fin, bzo, byo, bxo, have = carry
        n = i.astype(jnp.float32) - j0
        started = (n >= 0.0).astype(jnp.float32)
        alive = alive0 * started * (1.0 - fin)
        px, py, pz = ox + dx * k, oy + dy * k, oz + dz * k

        ix0, _, iy0, _, iz0, _ = _coords(px, py, pz, dims)
        z0, y0, x0 = _window_origin(
            alive, ix0, iy0, iz0, vol_ref.shape, wz, wy, wxb
        )
        # Refetch the resident brick only when the window drifts out of it.
        fits = (
            (have > 0)
            & (z0 >= bzo) & (z0 + wz <= bzo + bz)
            & (y0 >= byo) & (y0 + wy <= byo + by)
            & (x0 == bxo)
        )
        nzo, nyo = brick_origin_for(z0, y0)
        bzo = jnp.where(fits, bzo, nzo)
        byo = pl.multiple_of(jnp.where(fits, byo, nyo), 8)
        bxo = pl.multiple_of(jnp.where(fits, bxo, x0), 128)

        @pl.when(jnp.logical_not(fits))
        def _():
            dma = pltpu.make_async_copy(
                vol_ref.at[pl.ds(bzo, bz), pl.ds(byo, by),
                           pl.ds(bxo, wxb)],
                brick_ref, sem,
            )
            dma.start()
            dma.wait()

        brick = brick_ref[
            pl.ds(z0 - bzo, wz),
            pl.ds(pl.multiple_of(y0 - byo, 8), wy), :
        ].astype(jnp.float32).reshape(wz * wy, wxb)

        wmat, ix0c, ix1c, fx = _tap_weights(
            alive, px, py, pz, z0, y0, dims, wz, wy, row_iota
        )
        xrows = _mm(wmat, brick, fast)
        v0 = _lane_gather(xrows, ix0c - x0, wxb)
        v1 = _lane_gather(xrows, ix1c - x0, wxb)
        sval = v0 * (1.0 - fx) + v1 * fx

        wtf, _ = _tf_weights(sval, tf_iota)
        color = _mm(wtf, tf_ref[:], fast)
        cr, cg, cb, ca = (color[:, 0:1], color[:, 1:2],
                          color[:, 2:3], color[:, 3:4])

        f = alive * (1.0 - acca)
        accr = accr + cr * f
        accg = accg + cg * f
        accb = accb + cb * f
        acca = acca + ca * f

        k_next = jnp.where(started > 0.0, k + ray_step, k)
        done = started * alive0 * (
            (acca > thr) | (k_next > kfar)).astype(jnp.float32)
        fin = jnp.maximum(fin, done)
        return (i + 1, k_next, accr, accg, accb, acca, fin,
                bzo, byo, bxo, jnp.int32(1))

    def cond(carry):
        return (carry[0] < n_steps) & jnp.any(
            alive0 * (1.0 - carry[6]) > 0.0
        )

    z = jnp.zeros((R, 1), jnp.float32)
    zi = jnp.int32(0)
    init = (0, k0, z, z, z, z, 1.0 - alive0, zi, zi, zi, zi)
    res = jax.lax.while_loop(cond, body, init)
    _, _, accr, accg, accb, acca = res[:6]
    out_ref[0] = jnp.concatenate([accr, accg, accb, acca], axis=1)


def _bwd_kernel(
    scal_ref, rays_ref, vol_ref, tf_ref, g_ref, dvol_in_ref,
    dvol_ref, dtf_ref,
    brick_ref, sem, acc_ref, rmw_ref, sem2,
    *, dims, ray_step, n_steps, wz, wy, wxb, az, ay, axb, fast=False,
):
    del dvol_in_ref  # aliased to dvol_ref; only the alias matters
    w, h, d = dims
    rays = rays_ref[0]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    k0, kfar = rays[:, 6:7], rays[:, 7:8]
    alive0 = rays[:, 8:9]
    j0 = rays[:, 9:10]
    thr = scal_ref[0, 0]
    g = g_ref[0]  # (R, 8): cols 0-3 cotangent, col 4 G = g . C (forward)
    gr, gg, gb, ga = g[:, 0:1], g[:, 1:2], g[:, 2:3], g[:, 3:4]
    G_total = g[:, 4:5]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, wz * wy), 1)
    tf_iota = jax.lax.broadcasted_iota(jnp.int32, (R, wxb), 1)  # x one-hots
    tfl_iota = jax.lax.broadcasted_iota(jnp.int32, (R, TF_SIZE), 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtf_ref[...] = jnp.zeros_like(dtf_ref)

    bz = brick_ref.shape[0]
    by = brick_ref.shape[1]

    def brick_origin_for(z0, y0):
        bzo = jnp.clip(z0 - BRICK_Z_PAD // 2, 0, vol_ref.shape[0] - bz)
        byo = jnp.clip((y0 - BRICK_Y_PAD // 2) & ~7,
                       0, vol_ref.shape[1] - by)
        return bzo, pl.multiple_of(byo, 8)

    def resident_brick(z0, y0, x0, borg):
        """Window view of the resident brick, refetching on drift."""
        bzo, byo, bxo, bhave = borg
        fits = (
            (bhave > 0)
            & (z0 >= bzo) & (z0 + wz <= bzo + bz)
            & (y0 >= byo) & (y0 + wy <= byo + by)
            & (x0 == bxo)
        )
        nzo, nyo = brick_origin_for(z0, y0)
        bzo = jnp.where(fits, bzo, nzo)
        byo = pl.multiple_of(jnp.where(fits, byo, nyo), 8)
        bxo = pl.multiple_of(jnp.where(fits, bxo, x0), 128)

        @pl.when(jnp.logical_not(fits))
        def _():
            dma = pltpu.make_async_copy(
                vol_ref.at[pl.ds(bzo, bz), pl.ds(byo, by),
                           pl.ds(bxo, wxb)],
                brick_ref, sem,
            )
            dma.start()
            dma.wait()

        brick = brick_ref[
            pl.ds(z0 - bzo, wz),
            pl.ds(pl.multiple_of(y0 - byo, 8), wy), :
        ].astype(jnp.float32).reshape(wz * wy, wxb)
        return brick, (bzo, byo, bxo, jnp.int32(1))

    def flush(a_org):
        """RMW the accumulator into the HBM dvol buffer."""
        azo, ayo, axo = a_org
        ayo = pl.multiple_of(ayo, 8)
        axo = pl.multiple_of(axo, 128)
        rd = pltpu.make_async_copy(
            dvol_ref.at[pl.ds(azo, az), pl.ds(ayo, ay), pl.ds(axo, axb)],
            rmw_ref, sem2,
        )
        rd.start()
        rd.wait()
        rmw_ref[...] = rmw_ref[...] + acc_ref[...]
        wr = pltpu.make_async_copy(
            rmw_ref,
            dvol_ref.at[pl.ds(azo, az), pl.ds(ayo, ay), pl.ds(axo, axb)],
            sem2,
        )
        wr.start()
        wr.wait()
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def acc_origin_for(z0, y0, x0):
        """Accumulator origin covering the window with drift headroom."""
        azo = jnp.clip(z0 - ACC_Z_PAD // 2, 0, vol_ref.shape[0] - az)
        ayo = jnp.clip((y0 - ACC_Y_PAD // 2) & ~7, 0, vol_ref.shape[1] - ay)
        axo = jnp.clip(x0 & ~127, 0, vol_ref.shape[2] - axb)
        return azo, pl.multiple_of(ayo, 8), pl.multiple_of(axo, 128)

    # Single replay: gradients with the drift-flushed accumulator
    # (G = g . C comes precomputed from the saved forward output).
    z_ = jnp.zeros((R, 1), jnp.float32)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body2(carry):
        (i, k, acca, fin, P, azo, ayo, axo, have,
         bzo, byo, bxo, bhave) = carry
        n = i.astype(jnp.float32) - j0
        started = (n >= 0.0).astype(jnp.float32)
        alive = alive0 * started * (1.0 - fin)
        px, py, pz = ox + dx * k, oy + dy * k, oz + dz * k
        ix0, _, iy0, _, iz0, _ = _coords(px, py, pz, dims)
        z0, y0, x0 = _window_origin(
            alive, ix0, iy0, iz0, vol_ref.shape, wz, wy, wxb
        )

        # (Re)center the accumulator if the window left its coverage.
        fits = (
            (z0 >= azo) & (z0 + wz <= azo + az)
            & (y0 >= ayo) & (y0 + wy <= ayo + ay)
            & (x0 >= axo) & (x0 + wxb <= axo + axb)
        )

        @pl.when(jnp.logical_not(fits) & (have > 0))
        def _():
            flush((azo, ayo, axo))

        nzo, nyo, nxo = acc_origin_for(z0, y0, x0)
        azo = jnp.where(fits & (have > 0), azo, nzo)
        ayo = jnp.where(fits & (have > 0), ayo, nyo)
        axo = jnp.where(fits & (have > 0), axo, nxo)
        have = jnp.int32(1)

        brick, (bzo, byo, bxo, bhave) = resident_brick(
            z0, y0, x0, (bzo, byo, bxo, bhave)
        )
        wmat, ix0c, ix1c, fx = _tap_weights(
            alive, px, py, pz, z0, y0, dims, wz, wy, row_iota
        )
        xrows = _mm(wmat, brick, fast)
        v0 = _lane_gather(xrows, ix0c - x0, wxb)
        v1 = _lane_gather(xrows, ix1c - x0, wxb)
        sval = v0 * (1.0 - fx) + v1 * fx

        wtf, dwtf = _tf_weights(sval, tfl_iota)
        color = _mm(wtf, tf_ref[:], fast)
        cr, cg, cb, ca = (color[:, 0:1], color[:, 1:2],
                          color[:, 2:3], color[:, 3:4])
        T = alive * (1.0 - acca)
        contrib = (gr * cr + gg * cg + gb * cb + ga * ca) * T
        P_new = P + contrib

        dcr, dcg, dcb = gr * T, gg * T, gb * T
        S_next = G_total - P_new
        denom = 1.0 - ca
        dca = ga * T - jnp.where(
            denom > 1e-6, S_next / jnp.maximum(denom, 1e-6), 0.0
        ) * alive
        dcol = jnp.concatenate(
            [dcr, dcg, dcb, dca,
             jnp.zeros((R, tf_ref.shape[1] - 4), jnp.float32)],
            axis=1,
        ) * alive
        dtf_ref[...] += _mm_t(wtf, dcol, fast)

        slope = _mm(dwtf, tf_ref[:], fast) * TF_SIZE
        dsval = (
            slope[:, 0:1] * dcr + slope[:, 1:2] * dcg
            + slope[:, 2:3] * dcb + slope[:, 3:4] * dca
        )

        lx0 = ix0c - x0
        lx1 = ix1c - x0
        wx = (
            (tf_iota == lx0).astype(jnp.float32) * (1.0 - fx)
            + (tf_iota == lx1).astype(jnp.float32) * fx
        )
        dxrows = dsval * wx
        dbrick = _mm_t(wmat, dxrows, fast).reshape(wz, wy, wxb)
        # Accumulate at the window's offset inside the accumulator. The
        # offsets are differences of like-aligned values; re-state the
        # alignment (the while-loop carry drops it).
        oz_ = z0 - azo
        oy_ = pl.multiple_of(y0 - ayo, 8)
        ox_ = pl.multiple_of(x0 - axo, 128)
        acc_ref[pl.ds(oz_, wz), pl.ds(oy_, wy), pl.ds(ox_, wxb)] += dbrick

        acca = acca + ca * T
        k_next = jnp.where(started > 0.0, k + ray_step, k)
        done = started * alive0 * (
            (acca > thr) | (k_next > kfar)).astype(jnp.float32)
        fin = jnp.maximum(fin, done)
        return (i + 1, k_next, acca, fin, P_new, azo, ayo, axo, have,
                bzo, byo, bxo, bhave)

    def cond2(carry):
        return (carry[0] < n_steps) & jnp.any(
            alive0 * (1.0 - carry[3]) > 0.0
        )

    zero_i = jnp.int32(0)
    res2 = jax.lax.while_loop(
        cond2, body2,
        (0, k0, z_, 1.0 - alive0, z_, zero_i, zero_i, zero_i, zero_i,
         zero_i, zero_i, zero_i, zero_i),
    )
    azo, ayo, axo, have = res2[5], res2[6], res2[7], res2[8]

    @pl.when(have > 0)
    def _():
        flush((azo, ayo, axo))


def default_window(dims, view_dims, perspective=False):
    from volrt.renderers.pallas import diff_tri

    wz, wy = diff_tri.default_window(dims, view_dims, perspective)
    # y slack for the aligned start.
    hp = -(-dims[1] // 8) * 8
    return wz, min(hp, wy + 8)


def _specs(t, vol_shape, tfp_shape, with_grad):
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, R, layout.N_CHANNELS), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if with_grad:
        in_specs += [
            pl.BlockSpec((1, R, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
    return in_specs


def _pallas_fwd(scal, rays, vol, tfp, *, dims, ray_step, window,
                fast=False):
    t = rays.shape[0]
    wz, wy = window
    xpad = vol.shape[2]
    wxb = WX if xpad == WX else 2 * WX
    kernel = functools.partial(
        _fwd_kernel, dims=dims, ray_step=ray_step,
        n_steps=layout.max_bands(ray_step), wz=wz, wy=wy, wxb=wxb,
        fast=fast,
    )
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_specs(t, vol.shape, tfp.shape, False),
        out_specs=pl.BlockSpec((1, R, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, R, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((min(vol.shape[0], wz + BRICK_Z_PAD),
                        min(vol.shape[1], wy + BRICK_Y_PAD), wxb),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, rays, vol, tfp)


def _pallas_bwd(scal, rays, vol, tfp, gG, *, dims, ray_step, window,
                fast=False):
    t = rays.shape[0]
    wz, wy = window
    xpad = vol.shape[2]
    wxb = WX if xpad == WX else 2 * WX
    az = min(vol.shape[0], wz + ACC_Z_PAD)
    ay = min(vol.shape[1], wy + ACC_Y_PAD)
    axb = min(xpad, wxb + WX) if xpad > wxb else wxb
    kernel = functools.partial(
        _bwd_kernel, dims=dims, ray_step=ray_step,
        n_steps=layout.max_bands(ray_step), wz=wz, wy=wy, wxb=wxb,
        az=az, ay=ay, axb=axb, fast=fast,
    )
    dvol_init = jnp.zeros(vol.shape, jnp.float32)
    dvol, dtf = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=_specs(t, vol.shape, tfp.shape, True),
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(tfp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(vol.shape, jnp.float32),
            jax.ShapeDtypeStruct(tfp.shape, jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((min(vol.shape[0], wz + BRICK_Z_PAD),
                        min(vol.shape[1], wy + BRICK_Y_PAD), wxb),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((az, ay, axb), jnp.float32),
            pltpu.VMEM((az, ay, axb), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={5: 0},
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, rays, vol, tfp, gG, dvol_init)
    return dvol, dtf


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def render_tiles_diff_blocked(scal, rays, vol, tfp, dims, ray_step, window,
                              fast=False):
    """Differentiable blocked tile render (any volume size)."""
    return _pallas_fwd(
        scal, rays, vol, tfp, dims=dims, ray_step=ray_step, window=window,
        fast=fast,
    )


def _fwd_rule(scal, rays, vol, tfp, dims, ray_step, window, fast=False):
    out = _pallas_fwd(
        scal, rays, vol, tfp, dims=dims, ray_step=ray_step, window=window,
        fast=fast,
    )
    return out, (scal, rays, vol, tfp, out)


def _bwd_rule(dims, ray_step, window, fast, res, g):
    from volrt.renderers.pallas.diff_tri import _pack_gG

    scal, rays, vol, tfp, out = res
    dvol, dtf = _pallas_bwd(
        scal, rays, vol, tfp, _pack_gG(g, out),
        dims=dims, ray_step=ray_step, window=window, fast=fast,
    )
    return jnp.zeros_like(scal), jnp.zeros_like(rays), dvol, dtf


render_tiles_diff_blocked.defvjp(_fwd_rule, _bwd_rule)
