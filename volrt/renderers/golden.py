"""Renderer 0 — the golden JAX reference renderer.

The correctness anchor of the framework: a direct functional transcription of
the reference algorithm (reference: CPURenderer.cpp:11-53) with per-ray
``lax.while_loop`` control flow under ``vmap``. Every other renderer rung is
tested allclose against this one. It runs anywhere JAX runs; it is *not* the
fast path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from volrt.core import esl as esl_mod
from volrt.core import rays as rays_mod
from volrt.core import sampling
from volrt.core.types import Raycaster
from volrt.renderers.common import classify_and_shade, composite

NAME = "jax-golden"


def _march_single_ray(rc: Raycaster, origin: jax.Array, direction: jax.Array):
    """March one ray; returns float RGBA (4,)."""
    knear, kfar, hit = rays_mod.intersect_aabb(
        origin[None], direction[None], rc.volume.min_bound
    )
    knear, kfar, hit = knear[0], kfar[0], hit[0]

    dims = rc.volume.dims
    block = rc.esl_block_dims
    block_size = rc.esl_block_size
    step = rc.ray_step

    def leap_cond(state):
        k, stopped = state
        return ~stopped

    def leap_body(state):
        k, _ = state
        pt = origin + direction * k
        in_range = k <= kfar
        empty = esl_mod.sample_empty(rc.esl_empty, pt[None], dims, block)[0]
        do_leap = in_range & empty
        dk = esl_mod.leap_distance(
            pt[None], direction[None], dims, block, block_size, step
        )[0]
        # Leap to block boundary then advance one step
        # (reference: CPURenderer.cpp:18-25).
        new_k = jnp.where(do_leap, k + dk + step, k)
        return new_k, ~do_leap

    if rc.esl:
        k_start, _ = jax.lax.while_loop(leap_cond, leap_body, (knear, False))
    else:
        k_start = knear

    def march_cond(state):
        k, acc, done = state
        return ~done

    def march_body(state):
        k, acc, _ = state
        pt = origin + direction * k
        color = classify_and_shade(rc, pt[None], direction[None])[0]
        acc = composite(acc, color)
        ert = acc[3] > rc.ray_threshold  # reference: CPURenderer.cpp:35
        k = k + step
        return k, acc, ert | (k > kfar)

    acc0 = jnp.zeros(4, jnp.float32)
    # No march when the leap loop ran past the exit (reference line 26-27)
    # or the ray missed entirely.
    start_done = (~hit) | (k_start > kfar)
    _, acc, _ = jax.lax.while_loop(
        march_cond, march_body, (k_start, acc0, start_done)
    )
    return jnp.where(hit, acc, jnp.zeros(4, jnp.float32))


@partial(jax.jit, static_argnames=())
def render_float(rc: Raycaster) -> jax.Array:
    """Render to a float RGBA image ``f32[H, W, 4]`` (pre-quantization)."""
    origins, directions = rays_mod.get_rays(rc.view)
    w, h = rc.view.dims
    o = origins.reshape(-1, 3)
    d = directions.reshape(-1, 3)
    colors = jax.vmap(lambda oo, dd: _march_single_ray(rc, oo, dd))(o, d)
    return colors.reshape(h, w, 4)


def render(rc: Raycaster) -> jax.Array:
    """Render to ``uint8[H, W, 4]`` like the reference's PBO buffer."""
    return sampling.write_color(render_float(rc))
