"""Shared per-step march math used by every renderer rung.

One source of truth for the classify/shade/composite step so the golden,
batched-XLA and Pallas renderers provably implement the same algorithm
(reference: CPURenderer.cpp:29-39, GPURenderer4.cu:75-85).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from volrt.constants import SHADE_ALPHA_GATE, SHADE_KD_GATE, SHADE_LIGHT_OFFSET
from volrt.core import sampling
from volrt.core.types import Raycaster


def normalize(v: jax.Array) -> jax.Array:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def classify_and_shade(rc: Raycaster, pt: jax.Array) -> jax.Array:
    """Sample the volume at world points ``pt (..., 3)``, classify through the
    TF and apply gated diffuse shading. Returns premultiplied RGBA ``(..., 4)``.

    ``nearest`` mode: uint8 sample + bucketed TF + nearest light tap
    (reference: CPURenderer.cpp:30-33, RaycasterBase.h:87-98).
    ``trilinear`` mode: trilinear sample + linearly-interpolated TF + trilinear
    light tap (reference: GPURenderer4.cu:41-51,76-79).
    """
    if rc.interpolation == "nearest":
        sample_u8 = sampling.sample_nearest(rc.volume, pt)
        color = sampling.tf_lookup_bucket(rc.transfer_fn, sample_u8)
        sample_norm = sample_u8.astype(jnp.float32) / 255.0
        light_sampler = lambda p: (
            sampling.sample_nearest(rc.volume, p).astype(jnp.float32) / 255.0
        )
    else:
        sample_norm = sampling.sample_trilinear(rc.volume, pt)
        color = sampling.tf_lookup_linear(rc.transfer_fn, sample_norm)
        light_sampler = lambda p: sampling.sample_trilinear(rc.volume, p)

    # Diffuse shading: one extra volume tap a small distance toward the light;
    # gated on alpha and light intensity (reference: RaycasterBase.h:87-98).
    light_dir = normalize(rc.view.light_pos - pt)
    gate = (color[..., 3] > SHADE_ALPHA_GATE) & (rc.light_kd > SHADE_KD_GATE)
    sample_l = light_sampler(pt + light_dir * SHADE_LIGHT_OFFSET)
    diffuse = jnp.where(gate, (sample_l - sample_norm) * rc.light_kd, 0.0)
    rgb = color[..., :3] + diffuse[..., None]
    return jnp.concatenate([rgb, color[..., 3:4]], axis=-1)


def composite(acc: jax.Array, color: jax.Array) -> jax.Array:
    """Front-to-back premultiplied compositing step:
    ``C_out = C_in + C * (1 - alpha_in)`` (reference: CPURenderer.cpp:34)."""
    return acc + color * (1.0 - acc[..., 3:4])
