"""Fused differentiable trilinear renderer: Pallas forward + analytic
Pallas backward (gradients w.r.t. the voxel grid and the TF LUT).

No reference analog (the reference has no backward at all); this is the
fused-kernel realization of the BASELINE.md differentiable configuration.

Forward: the rung-3 windowed march (see trilinear.py) without the shading
tap (training configs are unshaded), on a *float* density volume in [0, 1].

Backward: one replay of the march per tile. Front-to-back compositing is
``C = sum_i col_i * T_i`` with transmittance ``T_{i+1} = T_i * (1 - a_i)``;
the cotangents are

    dL/dcol_i = g * T_i
    dL/da_i   = g_a * T_i - S_{i+1} / (1 - a_i),   S_i = sum_{j>=i} g.col_j T_j

where the suffix sum ``S_{i+1} = G - P_{i+1}`` comes from the total
``G = g . C`` (recomputed from the replayed forward) minus the running prefix
``P``. Chaining through the TF lerp and the trilinear weights turns the
scatter-adds into **transposed MXU matmuls**:

    dTF    += W_tf^T  @ dcol             (TF_SIZE, 4)
    dBrick += W_zy^T  @ (dval * W_x)     (wz*wy, X) -> accumulated into dVol

dVol and dTF are Pallas outputs with constant index maps — they stay
resident in VMEM across the sequential grid and accumulate tile by tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volrt.constants import TF_SIZE
from volrt.renderers.pallas import layout
from volrt.renderers.pallas.common import interpret_mode, tpu_compiler_params

R = layout.RAYS_PER_TILE
MARGIN = 2
HP = jax.lax.Precision.HIGHEST


def _coords(px, py, pz, dims):
    w, h, d = dims
    tx = (px + 1.0) * 0.5 * w - 0.5
    ty = (py + 1.0) * 0.5 * h - 0.5
    tz = (pz + 1.0) * 0.5 * d - 0.5
    fx0, fy0, fz0 = jnp.floor(tx), jnp.floor(ty), jnp.floor(tz)
    return (
        fx0.astype(jnp.int32), tx - fx0,
        fy0.astype(jnp.int32), ty - fy0,
        fz0.astype(jnp.int32), tz - fz0,
    )


def _tap_weights(alive, px, py, pz, z0, y0, dims, wz, wy, row_iota):
    """(W_zy, ix0c, ix1c, fx): the 4-tap z/y weight matrix and x lerp taps."""
    w, h, d = dims
    ix0, fx, iy0, fy, iz0, fz = _coords(px, py, pz, dims)
    ix0c = jnp.clip(ix0, 0, w - 1)
    ix1c = jnp.clip(ix0 + 1, 0, w - 1)
    iy0c = jnp.clip(iy0, 0, h - 1)
    iy1c = jnp.clip(iy0 + 1, 0, h - 1)
    iz0c = jnp.clip(iz0, 0, d - 1)
    iz1c = jnp.clip(iz0 + 1, 0, d - 1)
    lz0 = jnp.clip(iz0c - z0, 0, wz - 1)
    lz1 = jnp.clip(iz1c - z0, 0, wz - 1)
    ly0 = jnp.clip(iy0c - y0, 0, wy - 1)
    ly1 = jnp.clip(iy1c - y0, 0, wy - 1)
    wmat = (
        (row_iota == lz0 * wy + ly0) * ((1.0 - fz) * (1.0 - fy))
        + (row_iota == lz0 * wy + ly1) * ((1.0 - fz) * fy)
        + (row_iota == lz1 * wy + ly0) * (fz * (1.0 - fy))
        + (row_iota == lz1 * wy + ly1) * (fz * fy)
    ).astype(jnp.float32) * alive
    return wmat, ix0c, ix1c, fx


def _tf_weights(sval, tf_iota):
    tt = sval * TF_SIZE - 0.5
    ti0 = jnp.floor(tt)
    tfr = tt - ti0
    ti0 = ti0.astype(jnp.int32)
    tlo = jnp.clip(ti0, 0, TF_SIZE - 1)
    thi = jnp.clip(ti0 + 1, 0, TF_SIZE - 1)
    wtf = (
        (tf_iota == tlo) * (1.0 - tfr) + (tf_iota == thi) * tfr
    ).astype(jnp.float32)
    # d(col)/d(sval) needs the slope (tf[hi] - tf[lo]) * TF_SIZE; expose the
    # two one-hots so both value and slope come from matmuls.
    dwtf = (
        (tf_iota == thi).astype(jnp.float32)
        - (tf_iota == tlo).astype(jnp.float32)
    )
    return wtf, dwtf


def _mm(a, b, fast=False):
    """Gather/interp matmul. ``fast`` drops to native-bf16 MXU passes: the
    one-hot lerp weights then carry ~8 mantissa bits — the same ballpark as
    CUDA's 9-bit texture lerp quantization — for ~3x MXU throughput."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT if fast else HP,
    )


def _mm_t(a, b, fast=False):
    """a^T @ b with a (R, K), b (R, N) -> (K, N)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT if fast else HP,
    )


def _fwd_kernel(
    scal_ref, rays_ref, vol_ref, tf_ref, out_ref,
    *, dims, ray_step, n_steps, wz, wy, fast=False,
):
    w, h, d = dims
    xpad = vol_ref.shape[2]
    rays = rays_ref[0]
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    k0, kfar = rays[:, 6:7], rays[:, 7:8]
    alive0 = rays[:, 8:9]
    j0 = rays[:, 9:10]
    thr = scal_ref[0, 0]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, wz * wy), 1)
    tf_iota = jax.lax.broadcasted_iota(jnp.int32, (R, TF_SIZE), 1)

    def body(carry):
        i, k, accr, accg, accb, acca, fin = carry
        n = i.astype(jnp.float32) - j0
        started = (n >= 0.0).astype(jnp.float32)
        alive = alive0 * started * (1.0 - fin)
        px, py, pz = ox + dx * k, oy + dy * k, oz + dz * k

        _, _, iy0, _, iz0, _ = _coords(px, py, pz, dims)
        big = jnp.int32(1 << 20)
        amask = alive > 0.0
        z0 = jnp.clip(jnp.min(jnp.where(amask, iz0, big)) - MARGIN,
                      0, vol_ref.shape[0] - wz)
        y0 = jnp.clip(jnp.min(jnp.where(amask, iy0, big)) - MARGIN,
                      0, vol_ref.shape[1] - wy)
        brick = vol_ref[pl.ds(z0, wz), pl.ds(y0, wy), :].reshape(
            wz * wy, xpad
        )

        wmat, ix0c, ix1c, fx = _tap_weights(
            alive, px, py, pz, z0, y0, dims, wz, wy, row_iota
        )
        xrows = _mm(wmat, brick, fast)
        g0 = jnp.take_along_axis(
            xrows, jnp.broadcast_to(ix0c, (R, xpad)), axis=1)[:, 0:1]
        g1 = jnp.take_along_axis(
            xrows, jnp.broadcast_to(ix1c, (R, xpad)), axis=1)[:, 0:1]
        sval = g0 * (1.0 - fx) + g1 * fx  # density in [0, 1]

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
        return i + 1, k_next, accr, accg, accb, acca, fin

    def cond(carry):
        i = carry[0]
        fin = carry[6]
        return (i < n_steps) & jnp.any(alive0 * (1.0 - fin) > 0.0)

    z = jnp.zeros((R, 1), jnp.float32)
    init = (0, k0, z, z, z, z, 1.0 - alive0)
    _, _, accr, accg, accb, acca, _ = jax.lax.while_loop(cond, body, init)
    out_ref[0] = jnp.concatenate([accr, accg, accb, acca], axis=1)


def _bwd_kernel(
    scal_ref, rays_ref, vol_ref, tf_ref, g_ref,
    dvol_ref, dtf_ref,
    *, dims, ray_step, n_steps, wz, wy, fast=False,
):
    w, h, d = dims
    xpad = vol_ref.shape[2]
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
    tf_iota = jax.lax.broadcasted_iota(jnp.int32, (R, TF_SIZE), 1)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (R, xpad), 1)

    # Zero the accumulators on the first tile (outputs persist across the
    # sequential grid via constant index maps).
    @pl.when(pl.program_id(0) == 0)
    def _():
        dvol_ref[...] = jnp.zeros_like(dvol_ref)
        dtf_ref[...] = jnp.zeros_like(dtf_ref)

    # One replay: per-step cotangents via the running prefix P and the
    # precomputed total G = g . C (C is the saved forward output, so no
    # first replay is needed).
    def replay(with_grads, G_total):
        def body(carry):
            (i, k, acca, fin, P) = carry[:5]
            n = i.astype(jnp.float32) - j0
            started = (n >= 0.0).astype(jnp.float32)
            alive = alive0 * started * (1.0 - fin)
            px, py, pz = ox + dx * k, oy + dy * k, oz + dz * k

            _, _, iy0, _, iz0, _ = _coords(px, py, pz, dims)
            big = jnp.int32(1 << 20)
            amask = alive > 0.0
            z0 = jnp.clip(jnp.min(jnp.where(amask, iz0, big)) - MARGIN,
                          0, vol_ref.shape[0] - wz)
            y0 = jnp.clip(jnp.min(jnp.where(amask, iy0, big)) - MARGIN,
                          0, vol_ref.shape[1] - wy)
            brick = vol_ref[pl.ds(z0, wz), pl.ds(y0, wy), :].reshape(
                wz * wy, xpad
            )

            wmat, ix0c, ix1c, fx = _tap_weights(
                alive, px, py, pz, z0, y0, dims, wz, wy, row_iota
            )
            xrows = _mm(wmat, brick, fast)
            v0 = jnp.take_along_axis(
                xrows, jnp.broadcast_to(ix0c, (R, xpad)), axis=1)[:, 0:1]
            v1 = jnp.take_along_axis(
                xrows, jnp.broadcast_to(ix1c, (R, xpad)), axis=1)[:, 0:1]
            sval = v0 * (1.0 - fx) + v1 * fx

            wtf, dwtf = _tf_weights(sval, tf_iota)
            color = _mm(wtf, tf_ref[:], fast)
            cr, cg, cb, ca = (color[:, 0:1], color[:, 1:2],
                              color[:, 2:3], color[:, 3:4])

            T = alive * (1.0 - acca)  # weight of this step's contribution
            contrib = (gr * cr + gg * cg + gb * cb + ga * ca) * T
            P_new = P + contrib

            if with_grads:
                # dL/dcol (premultiplied RGBA entries of the TF lerp).
                dcr, dcg, dcb = gr * T, gg * T, gb * T
                S_next = G_total - P_new
                denom = 1.0 - ca
                dca = ga * T - jnp.where(
                    denom > 1e-6, S_next / jnp.maximum(denom, 1e-6), 0.0
                ) * alive
                dcol = jnp.concatenate(
                    [dcr, dcg, dcb, dca,
                     jnp.zeros((R, xpad - 4), jnp.float32)],
                    axis=1,
                ) * alive

                # dTF += wtf^T @ dcol  (accumulated in lanes 0..3).
                dtf_ref[...] += _mm_t(wtf, dcol, fast)

                # dsval via the TF slope: slope = (tf[hi] - tf[lo]) * TF_SIZE.
                slope = _mm(dwtf, tf_ref[:], fast) * TF_SIZE  # (R, 128)
                dsval = (
                    slope[:, 0:1] * dcr + slope[:, 1:2] * dcg
                    + slope[:, 2:3] * dcb + slope[:, 3:4] * dca
                )

                # x lerp backward as a one-hot row matrix.
                wx = (
                    (x_iota == ix0c).astype(jnp.float32) * (1.0 - fx)
                    + (x_iota == ix1c).astype(jnp.float32) * fx
                )
                dxrows = dsval * wx  # (R, xpad)
                dbrick = _mm_t(wmat, dxrows)  # (wz*wy, xpad)
                dvol_ref[pl.ds(z0, wz), pl.ds(y0, wy), :] += dbrick.reshape(
                    wz, wy, xpad
                )

            acca = acca + ca * T
            k_next = jnp.where(started > 0.0, k + ray_step, k)
            done = started * alive0 * (
                (acca > thr) | (k_next > kfar)).astype(jnp.float32)
            fin = jnp.maximum(fin, done)
            return (i + 1, k_next, acca, fin, P_new)

        def cond(carry):
            i, fin = carry[0], carry[3]
            return (i < n_steps) & jnp.any(alive0 * (1.0 - fin) > 0.0)

        z = jnp.zeros((R, 1), jnp.float32)
        init = (0, k0, z, 1.0 - alive0, z)
        return jax.lax.while_loop(cond, body, init)[4]

    replay(True, G_total)


def default_window(dims, view_dims, perspective=False):
    n = max(dims)
    step_px = 3.0 / min(view_dims)
    span = layout.TILE_W * step_px * 0.5 * n
    if perspective:
        span *= 4.5
    win = int(span) + 2 * MARGIN + 2
    win = -(-win // 8) * 8
    wz = min(-(-dims[2] // 8) * 8, win)
    wy = min(-(-dims[1] // 8) * 8, win)
    return max(8, wz), max(8, wy)


def _pallas_fwd(scal, rays, vol, tfp, *, dims, ray_step, window,
                fast=False):
    t = rays.shape[0]
    wz, wy = window
    kernel = functools.partial(
        _fwd_kernel, dims=dims, ray_step=ray_step,
        n_steps=layout.max_bands(ray_step), wz=wz, wy=wy, fast=fast,
    )
    return pl.pallas_call(
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
    )(scal, rays, vol, tfp)


def _pallas_bwd(scal, rays, vol, tfp, gG, *, dims, ray_step, window,
                fast=False):
    t = rays.shape[0]
    wz, wy = window
    kernel = functools.partial(
        _bwd_kernel, dims=dims, ray_step=ray_step,
        n_steps=layout.max_bands(ray_step), wz=wz, wy=wy, fast=fast,
    )
    dvol, dtf = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, layout.N_CHANNELS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(vol.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tfp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(vol.shape, jnp.float32),
            jax.ShapeDtypeStruct(tfp.shape, jnp.float32),
        ),
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, rays, vol, tfp, gG)
    return dvol, dtf


def _pack_gG(g, out):
    """Per-ray backward input: cotangent g (4) + total G = g . C (1),
    padded to 8 channels."""
    t, r = g.shape[0], g.shape[1]
    G = jnp.sum(g * out, axis=-1, keepdims=True)
    return jnp.concatenate(
        [g, G, jnp.zeros((t, r, 3), jnp.float32)], axis=-1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def render_tiles_diff(scal, rays, vol, tfp, dims, ray_step, window,
                      fast=False):
    """Differentiable tile render: ``(T, R, 4)`` image tiles from a float
    density volume ``(Dpad, Hpad, 128)`` and premultiplied TF ``(128, 128)``.

    Differentiable w.r.t. ``vol`` and ``tfp`` (fused analytic backward);
    ``scal``/``rays`` receive zero cotangents.
    """
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
    scal, rays, vol, tfp, out = res
    dvol, dtf = _pallas_bwd(
        scal, rays, vol, tfp, _pack_gG(g, out),
        dims=dims, ray_step=ray_step, window=window, fast=fast,
    )
    return (
        jnp.zeros_like(scal), jnp.zeros_like(rays), dvol, dtf,
    )


render_tiles_diff.defvjp(_fwd_rule, _bwd_rule)
