"""Fused differentiable renderer v3: lane-major ray tiles, planned windows.

Third-generation kernels behind the BASELINE.md headline configuration
(256^3 float volume, 1024^2 rays, forward+backward). Same math as
diff_tri/diff_blocked (trilinear sampling per sampling.sample_trilinear_f,
linear-interp TF per diff.render.render_diff, front-to-back premultiplied
compositing with ERT; no reference-repo analog for the backward), redesigned
around three measured round-1 bottlenecks:

1. **Lane-major per-ray state.** Round-1 kernels kept per-ray scalars as
   (256, 1) row-major values — 1/128 lane utilization through ~50 VPU ops
   per march band (~50% of kernel time). v3 tiles rays 8x8 (R=64) and holds
   every per-ray quantity as ``(1, R)`` / ``(G, R)`` *lane*-major rows: one
   vreg per op. All matmuls are transposed accordingly (dim-0 contractions).

2. **Planned windows (no in-kernel reductions).** The per-band sampling
   window origin is a nearly-linear function of band index (ray positions
   are linear in k), so an XLA prologue fits per-(tile, band-group) origin
   lines once and the kernel reads them as SMEM scalars — replacing round
   1's per-band min-reductions and scalar extractions. Out-of-window taps
   get *zero* tri-weight (not clamped) and are counted per ray in the
   overflow output row.

3. **Tri-weight tap matrices (no integer compares).** The (wz*wy, R) z/y
   tap-weight matrix is built from two factored hat-function weight strips
   ``relu(1 - |row - coord|)`` expanded by a broadcast-reshape and a tiled
   repeat — CUDA-clamp semantics come from clamping the *continuous*
   coordinates first (identical tap sums at volume borders). The transfer
   function lookup and its backward use the same hat-weight construction as
   one-hot matmuls against a ``(TF_SIZE, 8)`` LUT.

The x (lane) axis is sampled through a full-width tri-weight row reduction
of the matmul output; volumes wider than 128 voxels use two 64-voxel-phased
HBM copies so every tile group reads a single 128-lane window at a
128-aligned offset (DMA granularity), with per-phase gradient buffers
recombined on the host.

Gradient math matches diff_tri.py (suffix-sum trick): see that module's
docstring. dTF accumulates in-register per tile and flushes once; dVol
accumulates in a drift-flushed VMEM buffer RMW'd against the phase HBM
buffers (sequential grid => race-free).
"""
from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volrt.constants import SHADE_ALPHA_GATE, SHADE_KD_GATE, TF_SIZE
from volrt.renderers.pallas import layout
from volrt.renderers.pallas.common import (
    X_LANES,
    interpret_mode,
    tpu_compiler_params,
)

CH_ACC0 = 10      # packed-ray channel: initial accumulated opacity
TILE = 16         # 16x16 ray tiles
R = TILE * TILE   # rays per tile (lane dimension)
# March bands per group (brick/geometry/group-chain amortization).
# Default 8: robust for oblique poses of wide volumes, where the
# per-GROUP x window must absorb the whole group's x drift (z/y have
# per-band origin lines; x cannot — one brick DMA serves the group).
# 16 measured 243.5 -> 215.2 ms on the headline fwd+bwd (jobd j041,
# 2026-08-20: half the brick DMAs, org reads, and group chains) and is
# selectable per workload via :func:`set_group_size`; validate the
# pose with planned_window_ovf after changing.
G = 8
MARGIN = 2        # window slack around the footprint minimum
# Fixed-point fractional bits of the per-band origin-line slopes. The
# accumulated line error is bounded by (G-1)/SLOPE_SCALE voxels; 4 bits
# was enough at G=8 (<= 7/16), but G=16's 15/16 voxel ate the window's
# high-side slack (j044/j045: 175 overflowed taps at a 48^3 off-axis
# pose regardless of brick pads). 5 bits restores the <= 0.5 bound.
SLOPE_BITS = 5
SLOPE_SCALE = 1 << SLOPE_BITS
BPAD_Z = 16       # brick headroom over the window (in-group drift)
BPAD_Y = 16
APAD_Z = 48       # gradient-accumulator headroom (multi-group residency;
APAD_Y = 48       # with drift-aware placement => ~4-6 groups per flush)
XW = X_LANES      # max x window width (one lane tile)

_INF = jnp.float32(1e30)

# Trace-time perf-ablation switches for the backward kernel (debug only:
# set e.g. diff_v3._BWD_ABLATE = {"dtf"} before tracing to skip a
# component and measure its share). Production paths leave this empty.
_BWD_ABLATE: frozenset = frozenset()

# Forward-kernel ablation switches (same contract as _BWD_ABLATE):
# "wmat" constant tap matrix (hat math removed, expand kept), "expand"
# fully constant tap matrix (strips AND expand removed — the expand is
# what the "wmat" switch still pays), "xw" constant x weights, "tf"
# skip the TF lane gathers, "geom" constant sample coordinates,
# "groupw" skip the batched compositing weights, "matmul" constant
# gather-matmul output (isolates the MXU gather), "xreduce" skip the
# (wx, R) x-weighted reduction (isolates the x chain's multiply+sum),
# "dma" skip the brick DMA entirely (stale-VMEM reads; isolates HBM
# traffic + semaphore waits), "scalars" constant per-band window
# origins (isolates the SMEM scalar chain).
_FWD_ABLATE: frozenset = frozenset()

# Experiment: under fast mode, cast the z/y hat strips to bf16 BEFORE the
# (wz*wy, R) expand so the broadcast/repeat/multiply run at half the vreg
# traffic (the matmul truncates wmat to bf16 either way — the strips are
# still computed in f32, so only the product rounding changes).
_WMAT_BF16 = False

# Experiment: build the (wz*wy, R) tap matrix as ONE broadcast-multiply
# (wzw[:, None, :] * wyw[None, :, :] -> reshape) instead of
# broadcast_to-reshape x pltpu.repeat x multiply. Mathematically
# identical; the question is whether Mosaic lowers the 3-D broadcast
# multiply in one pass (the expand is ~(wz*wy) vreg rows touched ~3x —
# a large share of both kernels' VPU floor). Hardware A/B via jobd.
_WMAT_DIRECT = False

# Experiment: replace the expand's pltpu.repeat (a VPU tile-pattern copy,
# the expensive half of the expand) with an MXU matmul against a constant
# one-hot replication matrix: repeat(wyw, wz) == P @ wyw with
# P[i, y] = [i % wy == y]. The ablation says the MXU is underutilized
# while the VPU is the bottleneck — this trades the copy for (wz*wy) x
# wy x R MACs and leaves only the broadcast (cheap) and one multiply on
# the VPU. ROADMAP round-3 candidate "fold the expand into the gather
# matmul (hat strips as MXU operands)".
_WMAT_MXU = False

# Experiment: run the backward's per-band dTF scatter matmul
# ((TF_SIZE, R) one-hot @ (R, 8) cotangent columns) in bf16. The matmul
# is MXU-starved (N = 8 uses 1/16 of the systolic array's output tiles),
# so the f32->bf16 4x rate difference on v5e applies almost directly to
# the ~40 ms dTF share. Hat weights in bf16 round at ~1e-3 relative —
# the fast=True production regime (gathers are already bf16).
# MEASURED 2026-08-20: 243.6 vs 243.4 ms — neutral (DEFAULT precision
# already runs single bf16 passes; the cast only moves vreg traffic).
_DTF_BF16 = False

# Separable dTF scatter (unshaded/slab paths): the per-band cotangent
# columns factor as dcol_c = g_c * f_band for the color rows and
# ga * f - t_band for alpha (g_c per-ray constants across bands), so
#     dTF = [sum_bands oh*f] @ [g_r; g_g; g_b; g_a]^T
#           - e_a * rowsum([sum_bands oh*t])
# — TWO matmuls per TILE replace the 8-per-group N=8 matmuls whose MXU
# cost the j012 ablation measured at ~24 ms of the headline step
# (the (TF_SIZE, R) hat build itself is overlapped). Costs two
# (TF_SIZE, R) f32 VMEM accumulators + 2 extra VPU multiply-adds per
# band. Shade/phong keep the per-band matmul (their cotangent chains
# are not separable).
# MEASURED 2026-08-20 (j013): 258.3 vs 243.3 ms — REGRESSION. The two
# per-band (TF_SIZE, R) VMEM read-modify-writes (~0.5 GB/step of VMEM
# round-trips) cost more than the matmuls they remove; the dtf matmul
# share is MXU K-streaming, not issue overhead, and it overlaps the
# VPU-heavy band tail. Parity of the path is clean (density 1.1e-9,
# TF 6.9e-8 vs XLA autodiff on hardware) — kept for documentation,
# default OFF.
_DTF_SEP = False

# Shaded backward (DEFAULT on): fold the diffuse light-tap density
# scatter (and phong's gy/gz scatters) into the base scatter as ONE
# K-concatenated matmul ((wz*wy, 2R or 3R) @ (.., wx)) instead of
# two/three — same MACs, fewer MXU issues. Diffuse 393.3 -> 387.0 ms
# at the 256^3/1024^2 step (jobd j131); gradient parity 3e-11
# (diffuse) / 6e-11 (phong). Combined with trans2 + the tightened
# shaded windows (jobd j133: the light tap reaches only ~1.3 voxels,
# so (6,16,64) diffuse / (4,16,64) phong windows are overflow-free at
# the headline pose): diffuse 452 -> 282.2 ms, phong 772 -> 466.4.
_SHADE_KCAT = True

# K-merged dTF scatter: the G per-band (TF_SIZE, R) @ (R, 8) one-hot
# matmuls of a group collapse into ONE group-level matmul — all inputs
# (tt8, dcr8..dca8) already exist group-batched before the band loop
# (this covers the shade/phong paths too: their lit/spec cotangent
# chains also produce (G, R) columns). Modes, hardware-measured on the
# 256^3/1024^2 headline (jobd j121/j126, G=32):
#   "reshape"  one (TF_SIZE, G*R) @ (G*R, 8): 195.0 vs 197.5 ms — the
#              merge alone only trims issue overhead (the matmul is
#              MAC-limited: N=8 pads to a 128-lane physical tile).
#   "trans"    transposed (8, G*R) @ (G*R, TF_SIZE): the small dim
#              rides M (sublane, granularity 8) instead of N (lane,
#              granularity 128) -> 1/16 the padded MACs: 184.4 ms.
#   "trans2"   DEFAULT. trans + two-tap equality build: the 4-op hat
#              build (~20 ms exposed once the matmul shrank, j123)
#              becomes one integer compare against E = (brow ==
#              floor(tt)), with the (floor+1)-tap folded in as a
#              second 4-row block and a one-lane roll: 170.1 ms
#              (1.584e9 r*s/s). Gradient parity 1.1e-6 on hardware
#              (fast=True bf16), 9e-10 vs autodiff on CPU.
#   ""         per-band path (the round-4 structure).
_DTF_KMERGE = os.environ.get("VOLRT_DTF_KMERGE", "trans2")

# Deferred session read (DEFAULT on): at a session transition the old
# code waited the overlapping write it had JUST issued (S_WAIT) and
# issued the new session's HBM box read immediately — a fully exposed
# ~0.84 us flush-box DMA per overlapping session pair (most sessions
# overlap: consecutive boxes differ by the drift, < fz apart). Deferring
# the {S_WAIT drain, read issue} by ONE group gives the write a full
# group of compute (~10x its DMA time) to land; the read is consumed
# only at the session's closing flush, many groups later. A pending
# read still unissued at loop exit (last session started on the final
# group, or ERT exit) fires in the kernel epilogue before the exit
# flush, so every read is issued exactly once before its wait.
_RMW_DEFER_READ = True

# Packed TF lane gathers (fast mode only): the four TF channel rows
# pack pairwise into int32 rows (bf16 halves), halving the gather count
# in the forward TF lookup and the backward slope gathers. TF entries
# round to bf16 (~the reference's 9-bit-fraction tex1D lerp quality).
# Measurement flag (j210).
_TF_PACK_BF16 = False

# Cross-tile write-drain deferral (DEFAULT on; rides _RMW_DEFER_READ):
# instead of draining the tile's final flush write-backs at the end of
# every grid step (the last one just issued -> fully exposed ~0.84 us
# per tile), a persistent 2-flag SMEM scratch records which rmw slots
# hold outstanding writes; the NEXT tile's first deferred session read
# drains both flagged slots — one group of compute after the writes
# were issued, so they have already landed. The final grid step drains
# whatever remains. No plan changes: the flags are maintained
# dynamically, so ERT early exits are handled too. MEASURED NEUTRAL at
# the headline (152.8 vs 152.0 ms, j216 — the end drain was already
# hidden under the out-tile copy-out); default OFF, kept for configs
# with larger flush boxes where the exit write is slower to land.
_RMW_XTILE = False

# bf16 operands for the trans2 dTF equality matmul (fast mode only):
# E is exact in bf16; A rounds (~0.4% relative on the TF cotangent).
# Measurement flag (j205) — default off.
_DTF_E_BF16 = False

# Zero the (az, ay, 128) VMEM gradient accumulator only at grid step 0
# (DEFAULT on). The flush path re-zeroes exactly the written box of
# every session (window rows beyond the tap support add exact zeros),
# so the accumulator is all-zero again at tile end and the per-tile
# full zero — 4.1 MB of VPU stores per tile at the headline window,
# ~34 GB/step across 8192 tiles — is redundant after step 0. Requires
# planned_flush_lost == 0 for pose-tuned flush boxes (already the
# validated contract: an undersized box drops gradient rows whether or
# not they then leak into later tiles).
_ACC_ZERO_ONCE = True


def _expand_taps(wzw, wyw, wz, wy, dtype):
    """(wz, R) x (wy, R) hat strips -> (wz*wy, R) tap matrix, row-major
    (z outer, y inner) to match the brick view's reshape."""
    if _WMAT_DIRECT:
        return (wzw[:, None, :] * wyw[None, :, :]).reshape(
            wz * wy, R).astype(dtype)
    if _WMAT_MXU:
        ry = jax.lax.broadcasted_iota(jnp.int32, (wz * wy, wy), 0) % wy
        cy = jax.lax.broadcasted_iota(jnp.int32, (wz * wy, wy), 1)
        p = (ry == cy).astype(jnp.float32)  # constant; hoisted by LICM
        wyt = jax.lax.dot_general(
            p, wyw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (jnp.broadcast_to(
            wzw[:, None, :], (wz, wy, R)).reshape(wz * wy, R)
            * wyt).astype(dtype)
    return (
        jnp.broadcast_to(wzw[:, None, :], (wz, wy, R)).reshape(wz * wy, R)
        * pltpu.repeat(wyw, wz, axis=0)
    ).astype(dtype)


def default_window(dims, view_dims, perspective=False):
    """Static (wz, wy) per-band window for v3's per-band planned origins.

    The per-band footprint spans ``TILE * step_px`` world units plus one
    ray step (in-band k spread), one trilinear neighbor, and alignment
    slack for y (8-sublane granularity).
    """
    n = max(dims)
    step_px = 3.0 / min(view_dims)
    span = TILE * step_px * 0.5 * n + 1.0  # footprint + in-band k spread
    if perspective:
        span *= 2.0
    # At 45-degree orbit poses ~3e-6 of samples graze the window's
    # line-interp bound and contribute zero (counted in the overflow
    # output; the CLI warns and --strict-overflow fails). Widening the
    # window costs ~14% — detection over padding is the chosen trade.
    wz = int(math.ceil(span)) + 1 + 2 * MARGIN + 4
    # Longer band groups bend the fitted origin chord further from the
    # true per-band footprint minimum (the concave lower-envelope fit is
    # conservative at entry/exit groups, and the fixed-point slope
    # quantization error grows with bands-per-group), so the slack grows
    # with G beyond the tuned G=8 default — linearly past G=32, where
    # the half-rate slack measurably under-covers (plan replay at G=48
    # needs ~G of z slack; such windows also make G>=48 unprofitable,
    # see BASELINE.md's G-choice table).
    wz += max(0, G - 8) // 2 if G <= 32 else max(0, G - 8)
    wy = wz + 8  # y-origin 8-alignment slack
    # Never exceed the (padded) volume extent: the brick must contain the
    # window.
    wz = min(wz, -(-dims[2] // 8) * 8)
    wy = min(-(-wy // 8) * 8, -(-dims[1] // 8) * 8)
    # The x window stays a full lane tile by default: unlike z/y it has no
    # per-band origin slope, so it must absorb the whole group's x drift
    # for arbitrary view directions. Near-axis views can opt into wx=64
    # (halves the gather matmul, x reduction, and brick DMA) by passing an
    # explicit (wz, wy, 64) window.
    return max(4, wz), max(8, wy), 128


def set_group_size(g: int) -> None:
    """Set the march band-group size ``G`` (static kernel-structure
    tuning). Larger groups amortize brick DMA, org reads, and the
    group compositing chains over more bands — ``16`` measured the
    256^3/1024^2 headline fwd+bwd at 215.2 vs 243.5 ms, ``32`` 202.5 —
    but two geometric budgets shrink with G, so ALWAYS validate a new
    (pose, volume, G) with :func:`planned_window_ovf` (the kernels also
    count drops at runtime):

    - the per-group x window must absorb the whole group's x drift
      (oblique poses of wide volumes overflow first);
    - the per-band z/y origin lines are chords fit between each
      group's first and last ACTIVE bands, so when rays exit mid-group
      (march length not divisible by G at that pose) the exit group's
      chord is compressed above the true footprint minimum by up to
      the group's drift — e.g. G=24 at the 256-step headline pose
      drops taps that G=8/16/32 (which divide 256) do not. Larger
      windows absorb it (auto_window walks there), at a cost.

    Clears jit caches: ``G`` is baked into
    every traced plan and kernel, so previously compiled callables at
    the old size must retrace."""
    global G
    g = int(g)
    if g < 1:
        raise ValueError(f"group size must be >= 1, got {g}")
    if g != G:
        G = g
        jax.clear_caches()


def _norm_window(window):
    """Normalize to (wz, wy, wx, bpz, bpy). Accepts (wz, wy) [x width
    128], (wz, wy, wx), or the full 5-tuple whose last two entries are
    the brick drift-headroom pads (default BPAD_Z/BPAD_Y; pose-tuned
    benches pass tighter pads, validated by the plan replay — an
    undersized brick clamps windows into it, which
    ``planned_window_ovf`` counts)."""
    w = tuple(int(v) for v in window)
    if len(w) == 2:
        w = w + (128,)
    if len(w) == 3:
        # Default brick pads scale with the group size: the per-band
        # origin lines drift up to ~1 voxel/band, so a G-band group
        # needs ~G voxels of brick headroom over the window.
        w = w + (max(BPAD_Z, G), max(BPAD_Y, G))
    return w  # optionally + (xbw,) appended by _view_window


def n_groups_for(ray_step: float, view_dims=None) -> int:
    """Static band-group bound. layout.max_bands doubles max_steps to cover
    arbitrary per-tile k-offsets (j0); within one TILE x TILE patch the
    entry-depth spread is bounded by the tile's world-space diagonal, so a
    view-aware bound roughly halves the planning arrays at 512^3 scale."""
    if view_dims is None:
        return -(-layout.max_bands(ray_step) // G)
    px = 3.0 / min(view_dims)  # conservative world units per pixel
    j0_bound = int(math.ceil(TILE * 1.5 * px / ray_step)) + 2
    bands = layout.max_steps(ray_step) + j0_bound + G
    return min(-(-bands // G), -(-layout.max_bands(ray_step) // G))


# ---------------------------------------------------------------------------
# Window planning prologue (pure XLA)
# ---------------------------------------------------------------------------

# org field indices (int32, per tile x group). F_B0 is the group's first
# band index — equal to ``slot * G`` without ESL, but decoupled from the
# slot once plan-time empty-group compaction (``empty=`` below) drops
# groups whose tap footprint is entirely TF-empty. F_X0L/F_DXL are the
# per-band x-origin line (origin + fixed-point slope, like z/y): the
# backward's gradient-scatter x box (XBOX voxels, 8-aligned) follows it
# so the (wx, R) x-weight build shrinks to the tap footprint.
(F_Z0, F_DZ, F_Y0, F_DY, F_XO, F_PH, F_BZO, F_BYO, F_NG,
 F_WZL, F_WZH, F_WYL, F_WYH, F_B0, F_X0L, F_DXL) = range(16)
ORG_C = 16  # padded field count

# Backward gradient-scatter x box: must cover the per-band x footprint
# (bounded by wz's span budget — the window derivation is isotropic in
# max(dims)) + 8-alignment slack, the same budget wy pays for y.
# Misses are counted in the dTF padding cell [1, 7] and by
# planned_window_ovf(xbox=True).
XBOX = 16  # nominal width used by the plan's x-line fit margins


def _xbox_width(dims, view_dims, perspective, wx):
    """Scatter-box width for a pose: the per-band x footprint (tile
    width in world units scaled by the volume's x resolution — NOT by
    wz, whose span tracks the z resolution on anisotropic volumes) plus
    line-fit margin, 8-align slack, and the trilinear neighbor; rounded
    to sublane tiles. 0 disables the box (falls back to the dense
    (wx, R) weight build) when it wouldn't be narrower than wx."""
    w = dims[0]
    step_px = 3.0 / min(view_dims)
    span = TILE * step_px * 0.5 * w + 1.0
    if perspective:
        span *= 2.0
    xbw = -(-(int(math.ceil(span)) + MARGIN + 8 + 1) // 8) * 8
    return xbw if xbw < wx else 0


def plan_windows(tiles, dims, vol_shape, ray_step, wz, wy, bz, by,
                 wx=128, view_dims=None, z_off=None, empty=None,
                 esl_block=None):
    """Fit per-(tile, group) window-origin lines from the ray bundle.

    For straight rays the per-band footprint minimum is (near-)linear in
    band index within a group: evaluate the masked minimum at each group's
    first and last band (per-ray band clamped to the ray's active range)
    and store origin + fixed-point slope. Exact for orthographic bundles
    (identical directions); perspective divergence within an 8x8 tile is
    absorbed by MARGIN and detectable via the kernel's overflow counter.

    ``empty`` (``bool[32,32,32]`` per-block TF-emptiness,
    :func:`volrt.core.esl.derive_empty_grid`, with ``esl_block`` the block
    edge in voxels) enables **plan-time empty-space skipping**: groups
    whose whole trilinear tap footprint lies in empty blocks are deleted
    from the org table (kept groups compact down, ``F_B0`` preserves each
    survivor's true first-band index). The kernels then march only
    non-empty groups — leading, interior, AND trailing empty space all
    cost zero kernel time, with no in-kernel tests and no per-ray leap
    loop (the TPU-native answer to the reference's ``leap_empty_space``,
    RaycasterBase.h:67-85). Image-exact: every skipped sample lies in a
    block whose [min, max] density range lerps to zero opacity under the
    premultiplied TF, so its contribution (and its density gradient,
    except exactly at the zero-run boundary — measure zero) is zero.
    Like any ESL mode, TF gradients on zero-run entries adjacent to
    skipped samples are dropped.

    Returns int32 ``org[T, NG, ORG_C]``.
    """
    w, h, d = dims
    Dp, Hp, Xp = vol_shape
    step = ray_step
    t_count = tiles.shape[0]
    ox, oy, oz = tiles[..., 0], tiles[..., 1], tiles[..., 2]
    dx, dy, dz = tiles[..., 3], tiles[..., 4], tiles[..., 5]
    k0 = tiles[..., 6]
    kfar = tiles[..., 7]
    alive = tiles[..., 8] > 0.0
    j0 = tiles[..., 9]

    ng = n_groups_for(ray_step, view_dims)
    phi = k0 - j0 * step
    bex = j0 + jnp.floor((kfar - k0) / step + 1e-6)

    def group_stats(b0):
        """Masked per-axis footprint min/max at one group's two end bands
        -> stacked (T, 13). Scanned over groups to keep the intermediates
        at (T, R) instead of (T, R, NG*2) (which OOMs at 512^3 scale)."""
        gs, ge = b0, b0 + (G - 1)
        outs = []
        act = alive & (j0 <= ge) & (bex >= gs)
        for e in (gs, ge):
            # End-band evaluation with UNCLAMPED linear extension
            # (round 5): clamping to [j0, bex] froze exiting rays at
            # their last band, compressing the exit group's chord ABOVE
            # the true per-band footprint minimum whenever the march
            # length is not divisible by G (G=24/48 dropped taps —
            # ROADMAP round-4 root cause). Extending every ray's line
            # across the whole group only ADDS candidates that are <=
            # the ray's actual positions wherever it samples, so the
            # per-end mins bound a CONCAVE envelope (min of linears)
            # whose chord is a valid per-band lower bound — exact where
            # all rays span the group (the old behavior), conservative
            # at entry/exit groups (absorbed by the window's G-scaled
            # slack; planned_window_ovf still proves each pose).
            kk = phi + e * step
            for o_c, d_c, n_c in ((oz, dz, d), (oy, dy, h), (ox, dx, w)):
                t = (o_c + d_c * kk + 1.0) * (0.5 * n_c) - 0.5
                if o_c is oz and z_off is not None:
                    # Z-slab mode: windows address slab-local rows.
                    t = jnp.clip(t - z_off, 0.0, Dp - 1.0)
                outs.append(jnp.min(jnp.where(act, t, _INF), axis=1))
                if o_c is not ox:
                    # z/y footprint maxima: the backward flush trims its
                    # RMW box to the written-row extents.
                    outs.append(jnp.max(jnp.where(act, t, -_INF), axis=1))
            tx_ = (ox + dx * kk + 1.0) * (0.5 * w) - 0.5
            outs.append(jnp.max(jnp.where(act, tx_, -_INF), axis=1))
        outs.append(jnp.any(act, axis=1).astype(jnp.float32))
        return jnp.stack(outs, axis=-1)  # (T, 13)

    b_starts = jnp.arange(ng, dtype=jnp.float32) * G
    stats = jax.lax.map(group_stats, b_starts)   # (NG, T, 13)
    stats = jnp.moveaxis(stats, 0, 1)            # (T, NG, 13)
    # Per-end layout: [zmin, zmax, ymin, ymax, xmin, xmax] then live.
    zmin = stats[..., (0, 6)]
    ymin = stats[..., (2, 8)]
    xmin = stats[..., (4, 10)]
    zmax = stats[..., (1, 7)]
    ymax = stats[..., (3, 9)]
    xmax = stats[..., (5, 11)]
    live = stats[..., 12] > 0.0

    def line(lo, limit, width, span, align=1):
        # The line is fitted UNCLIPPED: clipping an endpoint into
        # [0, limit - width] before fitting distorts the slope at volume
        # faces (a descending entry-face line gets a flattened chord that
        # dips below the feasible-origin pin and drops the top tap —
        # exactly one overflow per ray at wz=8). The kernel's per-band
        # clamp into the resident brick does the pinning instead, and
        # bricks pin flush at volume faces, so the clamp bound equals the
        # volume's own feasible-origin bound there.
        s = jnp.floor(lo[..., 0]).astype(jnp.int32) - MARGIN
        e = jnp.floor(lo[..., 1]).astype(jnp.int32) - MARGIN
        if align > 1:
            s = s & ~(align - 1)
            e = e & ~(align - 1)
        e = jnp.clip(e, s - span, s + span)
        # Floor division biases the interpolated line DOWN (<= the chord):
        # low-side coverage is what correctness needs (mid-group dips from
        # exiting rays sit below the chord); the kernel clamps any
        # undershoot back into the resident brick, and the window's top
        # slack absorbs the <=1 voxel high-side error on ascending lines.
        q = (e - s) * SLOPE_SCALE
        slope16 = jnp.where(live, q // max(G - 1, 1), 0)
        return jnp.where(live, s, 0), slope16, jnp.where(
            live, jnp.clip(jnp.minimum(s, e), 0, limit - width), 0)

    z0, dz16, zlo = line(zmin, Dp, wz, bz - wz)
    y0, dy16, ylo = line(ymin, Hp, wy, by - wy, align=8)
    bzo = jnp.clip(zlo, 0, Dp - bz)
    byo = jnp.clip(ylo & ~7, 0, Hp - by)

    shift = wx // 2
    n_ph = max(1, 128 // shift) if Xp > wx else 1
    xg_min = jnp.min(xmin, axis=-1)
    xo = jnp.clip(
        (jnp.floor(jnp.where(live, xg_min, 0.0)).astype(jnp.int32)
         - MARGIN) & ~(shift - 1),
        0, Xp - 128)  # fetches are 128 wide regardless of wx
    phase = (xo // shift) % n_ph


    ng_live = jnp.max(
        jnp.where(live, jnp.arange(1, ng + 1)[None, :], 0),
        axis=1)  # (T,)

    org = jnp.zeros((t_count, ng, ORG_C), jnp.int32)
    org = org.at[..., F_Z0].set(z0)
    org = org.at[..., F_DZ].set(dz16)
    org = org.at[..., F_Y0].set(y0)
    org = org.at[..., F_DY].set(dy16)
    org = org.at[..., F_XO].set(xo)
    org = org.at[..., F_PH].set(phase)
    org = org.at[..., F_BZO].set(bzo)
    org = org.at[..., F_BYO].set(byo)
    org = org.at[..., F_B0].set(
        jnp.broadcast_to(jnp.arange(ng, dtype=jnp.int32) * G,
                         (t_count, ng)))
    org = org.at[:, 0, F_NG].set(ng_live)

    # Written-row extents per group (hat-tap support +- margin): the
    # backward flush RMWs only these rows. Dead groups get a neutral
    # (hi < lo) range so session min/max tracking ignores them.
    def ext(lo2, hi2, limit):
        l_ = jnp.floor(jnp.min(lo2, axis=-1)).astype(jnp.int32) - 1
        h_ = jnp.floor(jnp.max(hi2, axis=-1)).astype(jnp.int32) + 2
        return (jnp.where(live, jnp.clip(l_, 0, limit), limit),
                jnp.where(live, jnp.clip(h_, 0, limit), 0))

    wzl, wzh = ext(zmin, zmax, Dp)
    wyl, wyh = ext(ymin, ymax, Hp)
    org = org.at[..., F_WZL].set(wzl)
    org = org.at[..., F_WZH].set(wzh)
    org = org.at[..., F_WYL].set(wyl)
    org = org.at[..., F_WYH].set(wyh)

    # Per-band x-origin line for the backward's gradient-scatter box.
    x0l, dxl16, _ = line(xmin, Xp, XBOX, 128)
    org = org.at[..., F_X0L].set(x0l)
    org = org.at[..., F_DXL].set(dxl16)

    if empty is not None:
        # Empty-group deletion: a group survives iff any ESL block
        # intersecting its tap-footprint AABB is non-empty. One 33^3
        # summed-area table makes every (tile, group) test 8 gathers.
        blk = int(esl_block)
        sat = jnp.pad(jnp.cumsum(jnp.cumsum(jnp.cumsum(
            jnp.logical_not(empty).astype(jnp.int32),
            axis=0), axis=1), axis=2), ((1, 0), (1, 0), (1, 0)))

        def brange(lo2, hi2, n_vox):
            # Taps span [floor(lo), floor(hi) + 1], clamped like the
            # kernel clamps coordinates; SAT hi is exclusive.
            lo = jnp.min(lo2, axis=-1)
            hi = jnp.max(hi2, axis=-1)
            l_ = jnp.clip(jnp.floor(lo), 0.0, n_vox - 1.0)
            h_ = jnp.clip(jnp.floor(hi) + 1.0, 0.0, n_vox - 1.0)
            return (l_.astype(jnp.int32) // blk,
                    h_.astype(jnp.int32) // blk + 1)

        if z_off is not None:
            # Slab mode: footprints are slab-local; the ESL grid's
            # blocks are global. Shift back before the block divide.
            zl, zh = brange(zmin + z_off, zmax + z_off, d)
        else:
            zl, zh = brange(zmin, zmax, d)
        yl, yh = brange(ymin, ymax, h)
        xl, xh = brange(xmin, xmax, w)
        cnt = (sat[zh, yh, xh] - sat[zl, yh, xh] - sat[zh, yl, xh]
               - sat[zh, yh, xl] + sat[zl, yl, xh] + sat[zl, yh, xl]
               + sat[zh, yl, xl] - sat[zl, yl, xl])
        keep = live & (cnt > 0)
        # Compact surviving rows down (F_B0 keeps their band indices);
        # dropped rows scatter to a discard slot beyond the table.
        dst = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, ng)
        tidx = jnp.arange(t_count)[:, None]
        org2 = jnp.zeros((t_count, ng + 1, ORG_C), jnp.int32)
        org = org2.at[tidx, dst].set(org)[:, :ng]
        org = org.at[:, 0, F_NG].set(
            jnp.sum(keep, axis=1, dtype=jnp.int32))
    return org


# ---------------------------------------------------------------------------
# Flush-session planning (pure XLA, backward path only)
# ---------------------------------------------------------------------------

# sorg field indices (int32, per tile x group; valid at session-start
# groups, zero elsewhere). S_WAIT: this session's read must first drain
# the previous session's write (overlapping HBM boxes). S_PW: that
# drain already happened for the previous session's *own* predecessor —
# i.e. S_WAIT of the previous session-start group — so the slot-reuse
# wait two sessions later must be skipped (each write is waited exactly
# once; a second semaphore wait would hang).
S_NEW, S_AZO, S_AYO, S_RZO, S_RYO, S_WAIT, S_PW = range(7)
SORG_C = 8  # padded field count


def plan_sessions(org, vol_shape, wz, wy, fz, fy, wx, bpad=None):
    """Precompute the backward kernel's gradient-flush session schedule.

    A *session* is a maximal run of groups sharing one gradient-
    accumulator placement: same x window, brick z/y containment, and a
    merged written extent the static ``(fz, fy)`` flush box still covers.
    Every input to that rule (per-group brick origins and written-row
    extents) is already in ``org``, so the whole schedule is a plan-time
    scan — the kernel no longer tracks extents or placement in its
    carry, and (the point of the exercise) it can *prefetch* each
    session's HBM gradient box at session start and drain the write-back
    DMA asynchronously, double-buffered across sessions, instead of a
    blocking read-modify-write at every flush.

    Returns ``(sorg[T, NG, SORG_C] int32, lost[T] int32)``:

    - ``S_NEW`` marks session-start groups; ``S_AZO/S_AYO`` the
      accumulator placement applied there; ``S_RZO/S_RYO`` the session's
      flush-box offsets (within the accumulator — also the read-prefetch
      box); ``S_WAIT`` set when the session's HBM box overlaps the
      previous session's written box (the kernel must drain that write
      before issuing the read).
    - ``lost`` counts written rows an undersized flush box cannot cover
      (plan coverage, so ERT early-exit does not mask undersizing);
      nonzero only for pose-tuned ``flush`` shapes smaller than the
      written extents. Surfaced through the dTF padding cell [0, 7]
      exactly as the round-2 in-kernel counter was.
    """
    ng = org.shape[1]
    Dp, Hp = int(vol_shape[0]), int(vol_shape[1])
    bz, by = _brick_shape(vol_shape, wz, wy, bpad)
    az, ay = _acc_shape(vol_shape, wz, wy, bpad)
    trimmed = (fz, fy) != (az, ay)
    ngl = org[:, 0, F_NG]                       # (T,)
    bzo_a = jnp.moveaxis(org[..., F_BZO], 1, 0)  # (NG, T)
    byo_a = jnp.moveaxis(org[..., F_BYO], 1, 0)
    xo_a = jnp.moveaxis(org[..., F_XO], 1, 0)
    ph_a = jnp.moveaxis(org[..., F_PH], 1, 0)
    wzl_a = jnp.moveaxis(org[..., F_WZL], 1, 0)
    wzh_a = jnp.moveaxis(org[..., F_WZH], 1, 0)
    wyl_a = jnp.moveaxis(org[..., F_WYL], 1, 0)
    wyh_a = jnp.moveaxis(org[..., F_WYH], 1, 0)
    # Next processed group's brick origin (drift direction), matching the
    # kernel's Bn = min(B + 1, ng_live - 1) exactly: B == ngl - 1 reads
    # its own origin.
    nxt = jnp.concatenate([bzo_a[1:], bzo_a[-1:]], axis=0)
    nxty = jnp.concatenate([byo_a[1:], byo_a[-1:]], axis=0)
    b_idx = jnp.arange(ng, dtype=jnp.int32)
    is_last = b_idx[:, None] + 1 >= ngl[None, :]
    nbzo_a = jnp.where(is_last, bzo_a, nxt)
    nbyo_a = jnp.where(is_last, byo_a, nxty)

    def fbox(azo, ayo, lz, hz, ly, hy):
        zo = jnp.clip((lz - azo) & ~7, 0, az - fz)
        yo = jnp.clip((ly - ayo) & ~7, 0, ay - fy)
        if trimmed:
            lost = (jnp.maximum(azo + zo - lz, 0)
                    + jnp.maximum(hz - (azo + zo + fz), 0)
                    + jnp.maximum(ayo + yo - ly, 0)
                    + jnp.maximum(hy - (ayo + yo + fy), 0))
            lost = jnp.where(hz > lz, lost, 0)
        else:
            lost = jnp.zeros_like(zo)
        return zo, yo, lost

    def step1(carry, xs):
        azo, ayo, axo, aph, have, czl, czh, cyl, cyh, lacc = carry
        B, bzo, byo, xo, ph, gzl, gzh, gyl, gyh, nbzo, nbyo = xs
        proc = B < ngl
        tzl = jnp.minimum(czl, gzl)
        tzh = jnp.maximum(czh, gzh)
        tyl = jnp.minimum(cyl, gyl)
        tyh = jnp.maximum(cyh, gyh)
        _, _, lost_cont = fbox(azo, ayo, tzl, tzh, tyl, tyh)
        fits = ((have > 0)
                & (bzo >= azo) & (bzo + bz <= azo + az)
                & (byo >= ayo) & (byo + by <= ayo + ay)
                & (xo == axo) & (lost_cont == 0))
        new = proc & jnp.logical_not(fits)
        do_flush = new & (have > 0)
        fzo, fyo, lost = fbox(azo, ayo, czl, czh, cyl, cyh)
        nzo = jnp.clip(
            jnp.where(nbzo >= bzo, bzo, bzo + bz - az), 0, Dp - az)
        nyo = jnp.clip(
            jnp.where(nbyo >= byo, byo, byo + by - ay) & ~7, 0, Hp - ay)
        carry = (
            jnp.where(new, nzo, azo),
            jnp.where(new, nyo, ayo),
            jnp.where(new, xo, axo),
            jnp.where(new, ph, aph),
            jnp.where(proc, jnp.int32(1), have),
            jnp.where(proc, jnp.where(fits, tzl, gzl), czl),
            jnp.where(proc, jnp.where(fits, tzh, gzh), czh),
            jnp.where(proc, jnp.where(fits, tyl, gyl), cyl),
            jnp.where(proc, jnp.where(fits, tyh, gyh), cyh),
            lacc + jnp.where(do_flush, lost, 0),
        )
        return carry, (new, do_flush, fzo, fyo, nzo, nyo)

    t = org.shape[0]
    zi = jnp.zeros((t,), jnp.int32)
    init = (zi, zi, zi, zi, zi,
            jnp.full((t,), Dp, jnp.int32), zi,
            jnp.full((t,), Hp, jnp.int32), zi, zi)
    xs = (jnp.broadcast_to(b_idx[:, None], (ng, t)),
          bzo_a, byo_a, xo_a, ph_a, wzl_a, wzh_a, wyl_a, wyh_a,
          nbzo_a, nbyo_a)
    carry, ys = jax.lax.scan(step1, init, xs)
    (azo_e, ayo_e, axo_e, aph_e, have_e,
     czl_e, czh_e, cyl_e, cyh_e, lacc_e) = carry
    new_a, do_flush_a, fzo_a, fyo_a, pzo_a, pyo_a = ys
    fzo_f, fyo_f, lost_f = fbox(azo_e, ayo_e, czl_e, czh_e, cyl_e, cyh_e)
    lost_t = lacc_e + jnp.where(have_e > 0, lost_f, 0)

    # Reverse pass: each session's own flush box, positioned at its
    # start group (the box is only known once the session ends — at the
    # next session's start group, or at loop exit for the last session).
    def step_r(c, ys_b):
        cz, cy = c
        new, do_flush, fzo, fyo = ys_b
        s_z = jnp.where(new, cz, 0)
        s_y = jnp.where(new, cy, 0)
        cz = jnp.where(do_flush, fzo, cz)
        cy = jnp.where(do_flush, fyo, cy)
        return (cz, cy), (s_z, s_y)

    _, (rzo_a, ryo_a) = jax.lax.scan(
        step_r, (fzo_f, fyo_f), (new_a, do_flush_a, fzo_a, fyo_a),
        reverse=True)

    # Forward pass 2: flag sessions whose HBM read box overlaps the
    # previous session's written box (same phase buffer + 3-D interval
    # overlap) — the kernel drains that write before prefetching.
    def step_w(c, xs_b):
        valid, pz, py, px, pph, pwait = c
        new, nzo, nyo, rzo, ryo, xo, ph = xs_b
        zlo = nzo + rzo
        ylo = nyo + ryo
        wait = (new & (valid > 0) & (ph == pph)
                & (jnp.abs(xo - px) < 128)
                & (jnp.abs(zlo - pz) < fz) & (jnp.abs(ylo - py) < fy))
        pw = jnp.where(new, pwait, 0)
        c = (jnp.where(new, jnp.int32(1), valid),
             jnp.where(new, zlo, pz), jnp.where(new, ylo, py),
             jnp.where(new, xo, px), jnp.where(new, ph, pph),
             jnp.where(new, wait.astype(jnp.int32), pwait))
        return c, (wait, pw)

    _, (wait_a, pw_a) = jax.lax.scan(
        step_w, (zi, zi, zi, zi, zi, zi),
        (new_a, pzo_a, pyo_a, rzo_a, ryo_a, xo_a, ph_a))

    sorg = jnp.zeros((t, ng, SORG_C), jnp.int32)
    sorg = sorg.at[..., S_NEW].set(
        jnp.moveaxis(new_a.astype(jnp.int32), 0, 1))
    sorg = sorg.at[..., S_AZO].set(jnp.moveaxis(pzo_a, 0, 1))
    sorg = sorg.at[..., S_AYO].set(jnp.moveaxis(pyo_a, 0, 1))
    sorg = sorg.at[..., S_RZO].set(jnp.moveaxis(rzo_a, 0, 1))
    sorg = sorg.at[..., S_RYO].set(jnp.moveaxis(ryo_a, 0, 1))
    sorg = sorg.at[..., S_WAIT].set(
        jnp.moveaxis(wait_a.astype(jnp.int32), 0, 1))
    sorg = sorg.at[..., S_PW].set(jnp.moveaxis(pw_a, 0, 1))
    return sorg, lost_t


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _geometry(rays, b0, step, dims, z_off=None, local_d=None):
    """Per-group (G, R) sample coordinates + analytic masks.

    ``b0`` is the group's first band index (``org[F_B0]`` — decoupled
    from the loop slot under plan-time empty-group compaction).
    ``z_off``/``local_d`` remap the global z coordinate into a Z-slab's
    local rows (volume-sharded mode): local = clip(global) - z_off,
    clipped to the slab (the one-voxel halo keeps interior taps exact).
    """
    w, h, d = dims
    ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    k0, kfar = rays[6:7], rays[7:8]
    alive0, j0 = rays[8:9], rays[9:10]
    bb = (jax.lax.broadcasted_iota(jnp.int32, (G, R), 0)
          + b0).astype(jnp.float32)
    started = (bb >= j0).astype(jnp.float32)
    kk = k0 + (bb - j0) * step
    m_ana = alive0 * started * (kk <= kfar).astype(jnp.float32)
    if "geom" in _FWD_ABLATE:
        px = py = pz = kk
        tx = ty = tz = kk + 1.0
        return tx, ty, tz, m_ana, (px, py, pz)
    px = ox + dx * kk
    py = oy + dy * kk
    pz = oz + dz * kk
    tx = jnp.clip((px + 1.0) * (0.5 * w) - 0.5, 0.0, w - 1.0)
    ty = jnp.clip((py + 1.0) * (0.5 * h) - 0.5, 0.0, h - 1.0)
    tz = jnp.clip((pz + 1.0) * (0.5 * d) - 0.5, 0.0, d - 1.0)
    if z_off is not None:
        tz = jnp.clip(tz - z_off, 0.0, local_d - 1.0)
    return tx, ty, tz, m_ana, (px, py, pz)


def _light_coords(pw, scal_ref, dims, z_off=None, local_d=None):
    """Voxel coords of the diffuse light tap: positions offset by
    SHADE_LIGHT_OFFSET toward the light (reference: RaycasterBase.h:91).
    ``z_off``/``local_d`` remap into Z-slab-local rows (volume-sharded
    mode) exactly like :func:`_geometry`; the caller's slab halo must
    cover the tap's z reach (:func:`volrt.dist.volume_sharded.shading_halo`)."""
    from volrt.constants import SHADE_LIGHT_OFFSET

    w, h, d = dims
    px, py, pz = pw
    lx_ = scal_ref[0, 2] - px
    ly_ = scal_ref[0, 3] - py
    lz_ = scal_ref[0, 4] - pz
    inv = jax.lax.rsqrt(lx_ * lx_ + ly_ * ly_ + lz_ * lz_ + 1e-20)
    px2 = px + lx_ * inv * SHADE_LIGHT_OFFSET
    py2 = py + ly_ * inv * SHADE_LIGHT_OFFSET
    pz2 = pz + lz_ * inv * SHADE_LIGHT_OFFSET
    tx2 = jnp.clip((px2 + 1.0) * (0.5 * w) - 0.5, 0.0, w - 1.0)
    ty2 = jnp.clip((py2 + 1.0) * (0.5 * h) - 0.5, 0.0, h - 1.0)
    tz2 = jnp.clip((pz2 + 1.0) * (0.5 * d) - 0.5, 0.0, d - 1.0)
    if z_off is not None:
        tz2 = jnp.clip(tz2 - z_off, 0.0, local_d - 1.0)
    return tx2, ty2, tz2


def _band_scalars(org, B, g, bzo, byo, bz, by, wz, wy):
    """Per-band window origin from the group's line, clamped into the
    resident brick (belt-and-braces vs fixed-point rounding)."""
    if "scalars" in _FWD_ABLATE:
        return bzo, byo
    z0g = org[0, B, F_Z0] + ((org[0, B, F_DZ] * g) >> SLOPE_BITS)
    y0g = (org[0, B, F_Y0] + ((org[0, B, F_DY] * g) >> SLOPE_BITS)) & ~7
    z0g = jnp.clip(z0g, bzo, bzo + bz - wz)
    y0g = jnp.clip(y0g, byo, byo + by - wy) & ~7
    return z0g, y0g


def _band_sample(brick_ref, iotas, tx, ty, tz, z0g, y0g, xo,
                 g, wz, wy, wx, dtype, prec):
    """One band's trilinear sample -> (sval (1,R) f32, ovf (1,R))."""
    zrow, yrow, xrow = iotas
    lz = tz[g:g + 1] - z0g.astype(jnp.float32)
    ly = ty[g:g + 1] - y0g.astype(jnp.float32)
    lx = tx[g:g + 1] - xo.astype(jnp.float32)
    ovf = ((lz < 0.0) | (lz > wz - 1.0) | (ly < 0.0) | (ly > wy - 1.0)
           | (lx < 0.0) | (lx > wx - 1.0))
    wzw = jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lz))      # (wz, R)
    wyw = jnp.maximum(0.0, 1.0 - jnp.abs(yrow - ly))      # (wy, R)
    if "expand" in _FWD_ABLATE:
        wmat = jnp.full((wz * wy, R), 0.01, dtype)
    elif "wmat" in _FWD_ABLATE:
        wmat = jnp.broadcast_to(
            wzw[:, None, :], (wz, wy, R)).reshape(wz * wy, R).astype(dtype)
    elif _WMAT_BF16 and dtype == jnp.bfloat16:
        # Cast the strips first: the expand (the expensive part) runs on
        # half the vregs; the matmul would truncate wmat to bf16 anyway.
        wmat = _expand_taps(
            wzw.astype(dtype), wyw.astype(dtype), wz, wy, dtype)
    else:
        wmat = _expand_taps(wzw, wyw, wz, wy, dtype)
    bzo = 0  # brick slice offsets are pre-subtracted by the caller
    del bzo
    brick2 = brick_ref  # (wz*wy, wx) view prepared by caller
    if "matmul" in _FWD_ABLATE:
        xrows = jnp.broadcast_to(wmat[0:1, :] * 1e-8, (wx, R))
    else:
        xrows = jax.lax.dot_general(
            brick2, wmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                # (wx, R)
    if "xw" in _FWD_ABLATE:
        xw = jnp.broadcast_to(lx * 1e-8, (wx, R))
    else:
        xw = jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lx))    # (wx, R)
    if "xreduce" in _FWD_ABLATE:
        sval = xrows[0:1] * xw[0:1]
    else:
        sval = jnp.sum(xrows * xw, axis=0, keepdims=True)
    return sval, ovf, (wmat, xw, lx, xrows)


def _tf_onehot(sval_row, brow):
    """Hat-weight one-hot (TF_SIZE, R) for the linear-interp TF lookup,
    plus the in-range slope mask (1, R)."""
    s = jnp.clip(sval_row, 0.0, 1.0)
    tt = s * TF_SIZE - 0.5
    in_rng = ((tt > 0.0) & (tt < TF_SIZE - 1.0)
              & (sval_row > 0.0) & (sval_row < 1.0))
    tt = jnp.clip(tt, 0.0, TF_SIZE - 1.0)
    oh = jnp.maximum(0.0, 1.0 - jnp.abs(brow - tt))
    return oh, in_rng.astype(jnp.float32)


def _shift_fill(x, s, fill):
    """Shift rows down by ``s`` along axis 0, filling the top with
    ``fill`` (static slice + concat — cheap on (G, R) tiles)."""
    g = x.shape[0]
    top = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[:g - s]], axis=0)


def _excl_cumprod(q):
    """Exclusive cumulative product over axis 0 (G rows) via
    Hillis-Steele doubling: out_i = prod_{j<i} q_j (out_0 = 1)."""
    x = _shift_fill(q, 1, 1.0)
    s = 1
    while s < q.shape[0] - 1:
        x = x * _shift_fill(x, s, 1.0)
        s *= 2
    return x


def _excl_cumsum(c):
    """Exclusive cumulative sum over axis 0: out_i = sum_{j<i} c_j."""
    x = _shift_fill(c, 1, 0.0)
    s = 1
    while s < c.shape[0] - 1:
        x = x + _shift_fill(x, s, 0.0)
        s *= 2
    return x


def _group_weights(ca, m_ana, acca, fin, thr, no_ert=False):
    """Batched group compositing weights (replaces the sequential
    per-band transmittance recurrence; measured ~40% of both kernels'
    VPU time as (1, R) row chains).

    Since band opacities are nonnegative, the ERT-gated march equals the
    ungated march up to the first threshold crossing and contributes
    nothing after it, so the sequential recurrence
    ``acca += ca*m*(1-acca)`` factors into one exclusive cumulative
    product of ``q = 1 - ca*m_ana`` plus a prefix mask on the entering
    opacity:

        T_in_i  = (1 - acca) * prod_{j<i} q_j      (entering transmittance)
        gate_i  = [1 - T_in_i <= thr] * (1 - fin)
        f_i     = m_ana_i * gate_i * T_in_i        (band contribution weight)

    Returns ``(f, m, acca_out, fin_out)`` with ``m = m_ana * gate`` (the
    executed-band mask), matching the sequential semantics exactly
    (the crossing band still contributes; later bands do not).

    ``no_ert=True`` (static, threshold >= 1): the threshold can never be
    crossed (acca <= 1 for premultiplied alphas), so the gate is
    identically 1 (dead rays are already zeroed through ``m_ana``'s
    alive factor) and ``fin`` never changes — the gate compare, the
    finish max, and the caller's per-group ``jnp.any`` early-exit sync
    all drop out of the hot loop."""
    q = 1.0 - ca * m_ana
    tin = (1.0 - acca) * _excl_cumprod(q)
    if no_ert:
        f = m_ana * tin
        acca_out = acca + jnp.sum(ca * f, axis=0, keepdims=True)
        return f, m_ana, acca_out, fin
    gate = ((1.0 - tin <= thr).astype(jnp.float32) * (1.0 - fin))
    m = m_ana * gate
    f = m * tin
    acca_out = acca + jnp.sum(ca * f, axis=0, keepdims=True)
    m_any = jnp.max(m_ana, axis=0, keepdims=True)
    fin_out = jnp.maximum(
        fin, m_any * (acca_out > thr).astype(jnp.float32))
    return f, m, acca_out, fin_out


def _make_iotas(wz, wy, wx):
    zrow = jax.lax.broadcasted_iota(jnp.int32, (wz, R), 0).astype(
        jnp.float32)
    yrow = jax.lax.broadcasted_iota(jnp.int32, (wy, R), 0).astype(
        jnp.float32)
    xrow = jax.lax.broadcasted_iota(jnp.int32, (wx, R), 0).astype(
        jnp.float32)
    brow = jax.lax.broadcasted_iota(jnp.int32, (TF_SIZE, R), 0).astype(
        jnp.float32)
    return zrow, yrow, xrow, brow


def _brick_dma(vol_refs, brick_slot, sem_slot, org, B, bz, by, wx):
    """DMA descriptor pieces for group B's brick (phase-selected source).
    Returns (start_fn, wait_fn); both re-derive the descriptor from org.

    ``vol_refs`` are the x-phase copies: copy p holds the volume shifted
    left by ``p * wx//2`` voxels, so every (wx//2)-aligned window origin
    maps to a 128-aligned offset in exactly one copy.
    """
    shift = wx // 2
    bzo = org[0, B, F_BZO]
    byo = pl.multiple_of(org[0, B, F_BYO], 8)
    xo = org[0, B, F_XO]
    ph = org[0, B, F_PH]

    def mk(p):
        sx = pl.multiple_of(xo - shift * p, 128)
        return pltpu.make_async_copy(
            vol_refs[p].at[pl.ds(bzo, bz), pl.ds(byo, by),
                           pl.ds(sx, 128)],
            brick_slot, sem_slot)

    def start():
        for p in range(len(vol_refs)):
            @pl.when(ph == p)
            def _(p=p):
                mk(p).start()

    def wait():
        for p in range(len(vol_refs)):
            @pl.when(ph == p)
            def _(p=p):
                mk(p).wait()

    return start, wait


def _pack2_bf16(a, b):
    """Two f32 rows -> one int32 row carrying both as bf16 halves:
    bits(a_bf16) in the high 16, bits(b_bf16) in the low 16. One lane
    gather then serves two channels (see _tf_gather)."""
    ba = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    bb = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16).astype(jnp.float32), jnp.int32)
    return ba | jax.lax.shift_right_logical(bb, 16)


def _unpack2_bf16(u):
    """Inverse of _pack2_bf16: int32 -> (high f32, low f32). A bf16's
    f32 value is its bit pattern in the top 16 bits, so both halves
    unpack with one mask/shift + bitcast (exact)."""
    hi = jax.lax.bitcast_convert_type(u & jnp.int32(-65536), jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(u, 16), jnp.float32)
    return hi, lo


def _tf_gather(sv8, ovf8, lutl, pack=False):
    """Batched linear-interp TF lookup for one group's samples.

    ``sv8 (G, R)`` densities -> per-channel colors ``(G, 128)`` (first R
    lanes valid) via lane gathers against the lane-major LUT ``(8, 128)``
    — replacing a per-band one-hot matmul (measured 35% of forward time).
    ``pack=True`` (fast mode): the four channel rows pack pairwise into
    two int32 rows (bf16 halves, _pack2_bf16), halving the lane-gather
    count — 8 gathers/group -> 4. TF entries round to bf16, within the
    fast path's existing bf16 sampling precision.
    """
    del ovf8
    lanes = max(R, 128)
    svp = (sv8 if R >= 128
           else jnp.pad(sv8, ((0, 0), (0, 128 - R))))
    s = jnp.clip(svp, 0.0, 1.0)
    tt = jnp.clip(s * TF_SIZE - 0.5, 0.0, TF_SIZE - 1.0)
    lo = tt.astype(jnp.int32)                    # floor for tt >= 0
    hi = jnp.minimum(lo + 1, TF_SIZE - 1)
    fr = tt - lo.astype(jnp.float32)
    if pack and lanes == 128 and TF_SIZE <= 128:
        cols = []
        for pr in (_pack2_bf16(lutl[0:1], lutl[1:2]),
                   _pack2_bf16(lutl[2:3], lutl[3:4])):
            src = jnp.broadcast_to(pr, (G, 128))
            vlo = jnp.take_along_axis(src, lo, axis=1)
            vhi = jnp.take_along_axis(src, hi, axis=1)
            alo, blo = _unpack2_bf16(vlo)
            ahi, bhi = _unpack2_bf16(vhi)
            cols.append(alo * (1.0 - fr) + ahi * fr)
            cols.append(blo * (1.0 - fr) + bhi * fr)
        in_rng = ((tt > 0.0) & (tt < TF_SIZE - 1.0)
                  & (svp > 0.0) & (svp < 1.0)).astype(jnp.float32)
        return cols, (tt, lo, in_rng)
    # Mosaic lane gathers cannot span 128-lane vreg tiles: gather each
    # tile's chunk separately and concatenate (static slices, free).
    cols = []
    for c in range(4):
        lsrc = jnp.broadcast_to(lutl[c:c + 1, :], (G, 128))
        parts = []
        for k in range(lanes // 128):
            sl = slice(k * 128, (k + 1) * 128)
            vlo = jnp.take_along_axis(lsrc, lo[:, sl], axis=1)
            vhi = jnp.take_along_axis(lsrc, hi[:, sl], axis=1)
            parts.append(vlo * (1.0 - fr[:, sl]) + vhi * fr[:, sl])
        cols.append(jnp.concatenate(parts, axis=1)
                    if len(parts) > 1 else parts[0])
    in_rng = ((tt > 0.0) & (tt < TF_SIZE - 1.0)
              & (svp > 0.0) & (svp < 1.0)).astype(jnp.float32)
    return cols, (tt, lo, in_rng)


def _fwd_kernel(
    scal_ref, org_ref, rays_ref, v0_ref, v1_ref, v2_ref, v3_ref,
    tfl_ref, lutl_ref,
    out_ref, *rest,
    dims, ray_step, wz, wy, wx, n_phases, fast, shade=False,
    slab=False, phong=False, save_sv=False, no_ert=False,
):
    # rest = [sv_ref[, sv2_ref][, gx, gy, gz]] (save_sv outputs), brick
    # scratch, sem.
    i = 0
    sv_ref = sv2_ref = None
    svg_refs = None
    if save_sv:
        sv_ref = rest[i]
        i += 1
        if shade:
            sv2_ref = rest[i]
            i += 1
        if phong:
            svg_refs = rest[i:i + 3]
            i += 3
    brick_ref, sem = rest[i], rest[i + 1]
    del tfl_ref  # forward uses the lane-major LUT
    dtype = v0_ref.dtype
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    vol_refs = [v0_ref, v1_ref, v2_ref, v3_ref][:n_phases]
    rays = rays_ref[0]
    alive0 = rays[8:9]
    thr = scal_ref[0, 0]
    zrow, yrow, xrow, _ = _make_iotas(wz, wy, wx)
    lutl = lutl_ref[:]                           # (8, TF_SIZE)
    bz, by = brick_ref.shape[1], brick_ref.shape[2]
    vref_d = float(v0_ref.shape[0])
    ng_live = org_ref[0, 0, F_NG]

    if "dma" in _FWD_ABLATE:
        def start_brick(B, slot):
            pass

        def wait_brick(B, slot):
            pass
    else:
        def start_brick(B, slot):
            _brick_dma(vol_refs, brick_ref.at[slot], sem.at[slot],
                       org_ref, B, bz, by, wx)[0]()

        def wait_brick(B, slot):
            _brick_dma(vol_refs, brick_ref.at[slot], sem.at[slot],
                       org_ref, B, bz, by, wx)[1]()

    @pl.when(ng_live > 0)
    def _():
        start_brick(0, 0)

    def body(carry):
        B, accr, accg, accb, acca, fin, novf = carry
        slot = B & 1
        wait_brick(B, slot)

        @pl.when(B + 1 < ng_live)
        def _():
            start_brick(B + 1, (B + 1) & 1)

        bzo = org_ref[0, B, F_BZO]
        byo = pl.multiple_of(org_ref[0, B, F_BYO], 8)
        xo = org_ref[0, B, F_XO]
        tx, ty, tz, m_ana, pw = _geometry(
            rays, org_ref[0, B, F_B0], ray_step, dims,
            z_off=(scal_ref[0, 5] if slab else None), local_d=vref_d)

        if shade:
            tx2, ty2, tz2 = _light_coords(
                pw, scal_ref, dims,
                z_off=(scal_ref[0, 5] if slab else None),
                local_d=float(v0_ref.shape[0]))
        svals, ovfs, svals2, ovfs2 = [], [], [], []
        grads = []
        w_, h_, d_ = dims
        for g in range(G):
            z0g, y0g = _band_scalars(
                org_ref, B, g, bzo, byo, bz, by, wz, wy)
            bview = brick_ref[
                slot, pl.ds(z0g - bzo, wz),
                pl.ds(pl.multiple_of((y0g - byo) & ~7, 8), wy), :
            ].reshape(wz * wy, 128)[:, :wx]
            sval, ovf, (wmat, xw_c, lx_c, xrows) = _band_sample(
                bview, (zrow, yrow, xrow), tx, ty, tz, z0g, y0g, xo,
                g, wz, wy, wx, dtype, prec)
            svals.append(sval)
            ovfs.append(ovf.astype(jnp.float32))
            if phong:
                # Central-difference gradient from shifted hat weights:
                # the +-1-voxel field samples of the reference Phong
                # (renderers/common.py:gradient_normal) fall out of the
                # same window matmul with shifted weights; clipping the
                # shifted coordinate globally reproduces the reference's
                # tap clamps at volume borders.
                lz = tz[g:g + 1] - z0g.astype(jnp.float32)
                ly = ty[g:g + 1] - y0g.astype(jnp.float32)
                txg = tx[g:g + 1]
                lxp = jnp.clip(txg + 1.0, 0.0, w_ - 1.0) - xo
                lxm = jnp.clip(txg - 1.0, 0.0, w_ - 1.0) - xo
                xw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lxp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lxm)))
                gx = jnp.sum(xrows * xw_d, axis=0, keepdims=True)
                tyg = ty[g:g + 1]
                lyp = jnp.clip(tyg + 1.0, 0.0, h_ - 1.0) \
                    - y0g.astype(jnp.float32)
                lym = jnp.clip(tyg - 1.0, 0.0, h_ - 1.0) \
                    - y0g.astype(jnp.float32)
                yw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lyp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lym)))
                wzw = jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lz))
                wmat_dy = _expand_taps(wzw, yw_d, wz, wy, dtype)
                gy = jnp.sum(jax.lax.dot_general(
                    bview, wmat_dy, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec) * xw_c, axis=0, keepdims=True)
                tzg = tz[g:g + 1]
                zoffv = (scal_ref[0, 5] if slab else jnp.float32(0.0))
                lzp = jnp.clip(tzg + 1.0, 0.0, d_ - 1.0 - zoffv) \
                    - z0g.astype(jnp.float32)
                lzm = jnp.clip(tzg - 1.0, 0.0, d_ - 1.0 - zoffv) \
                    - z0g.astype(jnp.float32)
                zw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzm)))
                wyw = jnp.maximum(0.0, 1.0 - jnp.abs(yrow - ly))
                wmat_dz = _expand_taps(zw_d, wyw, wz, wy, dtype)
                gz = jnp.sum(jax.lax.dot_general(
                    bview, wmat_dz, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec) * xw_c, axis=0, keepdims=True)
                grads.append((gx, gy, gz))
            if shade:
                sval2, ovf2, _ = _band_sample(
                    bview, (zrow, yrow, xrow), tx2, ty2, tz2, z0g, y0g,
                    xo, g, wz, wy, wx, dtype, prec)
                svals2.append(sval2)
                ovfs2.append(ovf2.astype(jnp.float32))
        sv8 = jnp.concatenate(svals, axis=0)     # (G, R)
        ovf8 = jnp.concatenate(ovfs, axis=0)
        if save_sv:
            # Stream the group's sampled values to HBM: the backward
            # reads them instead of replaying the gather matmuls (and
            # needs no brick DMA at all) — bit-identical in every mode.
            sv_ref[0, pl.ds(B * G, G), :] = sv8
            if phong:
                # Phong backward additionally needs the raw density
                # gradient (the six ±1-voxel taps collapse to these
                # three per-sample components).
                svg_refs[0][0, pl.ds(B * G, G), :] = jnp.concatenate(
                    [gr_[0] for gr_ in grads], axis=0)
                svg_refs[1][0, pl.ds(B * G, G), :] = jnp.concatenate(
                    [gr_[1] for gr_ in grads], axis=0)
                svg_refs[2][0, pl.ds(B * G, G), :] = jnp.concatenate(
                    [gr_[2] for gr_ in grads], axis=0)
        if "tf" in _FWD_ABLATE:
            cr8 = cg8 = cb8 = ca8 = sv8 * 0.01
        else:
            (cr8, cg8, cb8, ca8), _ = _tf_gather(
                sv8, ovf8, lutl, pack=_TF_PACK_BF16 and fast)
        if shade:
            sv8_2 = jnp.concatenate(svals2, axis=0)
            if save_sv:
                sv2_ref[0, pl.ds(B * G, G), :] = sv8_2
            kd = scal_ref[0, 1]
            dshade8 = (sv8_2 - sv8) * kd  # gated per band below

        if not phong:
            # Batched group composite: one cumulative-product reweighting
            # replaces G sequential (1, R) transmittance updates.
            ca = ca8[:, :R]
            cr = cr8[:, :R]
            cg = cg8[:, :R]
            cb = cb8[:, :R]
            if shade:
                gate_sh = (
                    (ca > SHADE_ALPHA_GATE)
                    & (scal_ref[0, 1] > SHADE_KD_GATE))
                dsh = jnp.where(gate_sh, dshade8[:, :R], 0.0)
                cr = cr + dsh
                cg = cg + dsh
                cb = cb + dsh
            if "groupw" in _FWD_ABLATE:
                f = m = m_ana
                acca = acca + jnp.sum(ca * f, axis=0,
                                      keepdims=True) * 1e-8
            else:
                f, m, acca, fin = _group_weights(
                    ca, m_ana, acca, fin, thr, no_ert=no_ert)
            accr = accr + jnp.sum(cr * f, axis=0, keepdims=True)
            accg = accg + jnp.sum(cg * f, axis=0, keepdims=True)
            accb = accb + jnp.sum(cb * f, axis=0, keepdims=True)
            miss8 = ovf8[:, :R] > 0.0
            if shade:
                # A clipped LIGHT tap only matters where its shade gate
                # is on (alpha and kd above the reference thresholds,
                # GPURenderer4.cu:78): gated-off taps contribute exactly
                # zero, so counting them would flag phantom drops on
                # every unshaded-by-value render (light_kd == 0 with
                # the diffuse shade path traced).
                ovf2_8 = jnp.concatenate(ovfs2, axis=0)
                miss8 = miss8 | ((ovf2_8[:, :R] > 0.0) & gate_sh)
            novf = novf + jnp.sum(
                jnp.where(miss8 & (m > 0.0), 1.0, 0.0),
                axis=0, keepdims=True)
            return B + 1, accr, accg, accb, acca, fin, novf

        px_, py_, pz_ = pw
        dxr, dyr, dzr = rays[3:4], rays[4:5], rays[5:6]
        vinv = jax.lax.rsqrt(
            dxr * dxr + dyr * dyr + dzr * dzr + 1e-20)
        vx, vy, vz = -dxr * vinv, -dyr * vinv, -dzr * vinv
        kd = scal_ref[0, 1]

        for g in range(G):
            cr = cr8[g:g + 1, :R]
            cg = cg8[g:g + 1, :R]
            cb = cb8[g:g + 1, :R]
            ca = ca8[g:g + 1, :R]
            if phong:
                from volrt.constants import (
                    PHONG_KA, PHONG_KS, PHONG_SHININESS)
                gx, gy, gz = grads[g]
                ginv = jax.lax.rsqrt(
                    gx * gx + gy * gy + gz * gz + 1e-16)
                nx, ny, nz = -gx * ginv, -gy * ginv, -gz * ginv
                lx_ = scal_ref[0, 2] - px_[g:g + 1]
                ly_ = scal_ref[0, 3] - py_[g:g + 1]
                lz_ = scal_ref[0, 4] - pz_[g:g + 1]
                linv = jax.lax.rsqrt(
                    lx_ * lx_ + ly_ * ly_ + lz_ * lz_ + 1e-20)
                lxn, lyn, lzn = lx_ * linv, ly_ * linv, lz_ * linv
                hx, hy, hz = lxn + vx, lyn + vy, lzn + vz
                hinv = jax.lax.rsqrt(
                    hx * hx + hy * hy + hz * hz + 1e-20)
                ndl = jnp.maximum(
                    nx * lxn + ny * lyn + nz * lzn, 0.0)
                ndh = jnp.maximum(
                    (nx * hx + ny * hy + nz * hz) * hinv, 0.0)
                # ndh^16 by repeated squaring (PHONG_SHININESS == 16)
                assert PHONG_SHININESS == 16.0
                s2 = ndh * ndh
                s4 = s2 * s2
                s8 = s4 * s4
                spec = PHONG_KS * (s8 * s8) * ca
                lit = PHONG_KA + kd * ndl
                gate_p = ((ca > SHADE_ALPHA_GATE)
                          & (kd > SHADE_KD_GATE)).astype(jnp.float32)
                keep = 1.0 - gate_p
                cr = cr * (keep + gate_p * lit) + gate_p * spec
                cg = cg * (keep + gate_p * lit) + gate_p * spec
                cb = cb * (keep + gate_p * lit) + gate_p * spec
            if shade:
                gate = ((ca > SHADE_ALPHA_GATE)
                        & (scal_ref[0, 1] > SHADE_KD_GATE))
                dsh = jnp.where(gate, dshade8[g:g + 1, :R], 0.0)
                cr = cr + dsh
                cg = cg + dsh
                cb = cb + dsh
            m = m_ana[g:g + 1] * (1.0 - fin)
            f = m * (1.0 - acca)
            accr = accr + cr * f
            accg = accg + cg * f
            accb = accb + cb * f
            acca = acca + ca * f
            novf = novf + jnp.where(
                (ovf8[g:g + 1] > 0.0) & (m > 0.0), 1.0, 0.0)
            fin = jnp.maximum(
                fin, m_ana[g:g + 1] * (acca > thr).astype(jnp.float32))
        return B + 1, accr, accg, accb, acca, fin, novf

    def cond(carry):
        B, fin = carry[0], carry[5]
        if no_ert:
            # Threshold >= 1 can never finish a ray: skip the per-group
            # cross-lane reduction + scalar sync of the early-exit test.
            return B < ng_live
        return (B < ng_live) & jnp.any(alive0 * (1.0 - fin) > 0.0)

    z = jnp.zeros((1, R), jnp.float32)
    acc0 = rays[CH_ACC0:CH_ACC0 + 1]
    fin0 = jnp.maximum(
        1.0 - alive0, alive0 * (acc0 > thr).astype(jnp.float32))
    init = (0, z, z, z, acc0, fin0, z)
    B_exit, accr, accg, accb, acca, _, novf = jax.lax.while_loop(
        cond, body, init)

    # Drain the prefetched-but-unconsumed DMA on ERT early exit so the
    # slot semaphores are clean for the next grid step.
    @pl.when(B_exit < ng_live)
    def _():
        wait_brick(B_exit, B_exit & 1)

    # Row 5, lane-uniform: executed march bands (B_exit groups x G bands
    # — every executed group runs its full per-band gather matmuls for
    # all R rays regardless of liveness, so this is the tile's real MXU
    # work unit for measured-MFU accounting; ESL compaction and ERT exit
    # are both reflected in B_exit).
    nbands = jnp.full(
        (1, R), (B_exit * G).astype(jnp.float32), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [accr, accg, accb, acca, novf, nbands,
         jnp.zeros((2, R), jnp.float32)], axis=0)


def _bwd_kernel(
    scal_ref, org_ref, rays_ref, v0_ref, v1_ref, v2_ref, v3_ref,
    tfl_ref, lutl_ref,
    g_ref, dv0_in_ref, dv1_in_ref, dv2_in_ref, dv3_in_ref,
    *rest,
    dims, ray_step, wz, wy, wx, n_phases, fast, shade=False,
    flush_shape=None, have_sv=False, brick_shape=None, slab=False,
    phong=False, no_ert=False, window=(), need_dtf=True,
    need_dvol=True,
):
    # rest = [sv_in(, sv2_in)(, gx, gy, gz)] (have_sv inputs), sorg,
    # dv0..dv3, dtf[, dacc0] outputs, [brick scratch, sem] (replay mode
    # only), acc, rmw (2-slot), sem_r, sem_w, dtfacc.
    assert not (phong and (shade or slab))
    i = 0
    sv_in_ref = sv2_in_ref = svg_in_refs = None
    if have_sv:
        sv_in_ref = rest[i]
        i += 1
        if shade:
            sv2_in_ref = rest[i]
            i += 1
        if phong:
            svg_in_refs = rest[i:i + 3]
            i += 3
    sorg_ref = rest[i]
    i += 1
    dv0_ref, dv1_ref, dv2_ref, dv3_ref, dtf_ref = rest[i:i + 5]
    i += 5
    dr_ref = None
    if slab:
        dr_ref = rest[i]
        i += 1
    if have_sv:
        brick_ref = sem = None
        bz, by = brick_shape
    else:
        brick_ref, sem = rest[i], rest[i + 1]
        i += 2
        bz, by = brick_ref.shape[1], brick_ref.shape[2]
    acc_ref, rmw_ref, sem_r, sem_w, dtfacc_ref, pers_ref = \
        rest[i:i + 6]
    # Gradient-scatter x box: the per-band planned x line bounds the tap
    # footprint, so Dx is written sparsely into a zeroed (wx, R) scratch
    # (XBOX rows) instead of building the dense hat matrix. Misses are
    # counted (pad cell [1, 7]); shade/phong keep the dense path (their
    # light/gradient taps have their own x coordinates).
    xbw = window[5] if len(window) > 5 else 0
    use_xbox = not shade and not phong and 0 < xbw < wx
    dxs_ref = rest[i + 6] if use_xbox else None
    use_sep = _DTF_SEP and not shade and not phong
    if use_sep:
        j = i + 6 + (1 if use_xbox else 0)
        ohf_ref, oht_ref = rest[j], rest[j + 1]
    del dv0_in_ref, dv1_in_ref, dv2_in_ref, dv3_in_ref  # aliased
    abl = _BWD_ABLATE
    dtype = v0_ref.dtype
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGHEST)
    vol_refs = [v0_ref, v1_ref, v2_ref, v3_ref][:n_phases]
    dv_refs = [dv0_ref, dv1_ref, dv2_ref, dv3_ref][:n_phases]
    rays = rays_ref[0]
    alive0 = rays[8:9]
    thr = scal_ref[0, 0]
    gg_ = g_ref[0]
    gr, ggn, gb, ga = gg_[0:1], gg_[1:2], gg_[2:3], gg_[3:4]
    G_total = gg_[4:5]
    acc0_row = rays[CH_ACC0:CH_ACC0 + 1]
    if slab:
        # The saved output's alpha includes the seeded upstream opacity;
        # the suffix total must count march contributions only.
        G_total = G_total - ga * acc0_row
    zrow, yrow, xrow, brow = _make_iotas(wz, wy, wx)
    xbw_i = window[5] if len(window) > 5 else 0
    xrow16 = (jax.lax.broadcasted_iota(
        jnp.int32, (xbw_i, R), 0).astype(jnp.float32)
        if 0 < xbw_i < wx else None)
    lut = tfl_ref[:]                             # (TF_SIZE, 8)
    lutl = lutl_ref[:]                           # (8, TF_SIZE) lane-major
    # Lane-major TF slope LUT: slope[i] = (tf[i+1] - tf[i]) * TF_SIZE,
    # last entry 0 (clamped lerp has zero slope there).
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (8, TF_SIZE), 1)
    slopel = jnp.where(
        lane_idx < TF_SIZE - 1,
        (pltpu.roll(lutl, TF_SIZE - 1, axis=1) - lutl) * TF_SIZE, 0.0)
    fz, fy = rmw_ref.shape[1], rmw_ref.shape[2]
    ng_live = org_ref[0, 0, F_NG]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtf_ref[...] = jnp.zeros_like(dtf_ref)

    use_xtile = (_RMW_XTILE and _RMW_DEFER_READ and need_dvol
                 and "flush" not in abl)
    if use_xtile:
        @pl.when(pl.program_id(0) == 0)
        def _():
            pers_ref[0] = 0
            pers_ref[1] = 0
    pw_pers = [pers_ref[0], pers_ref[1]] if use_xtile else None

    dtfacc_ref[...] = jnp.zeros_like(dtfacc_ref)
    if need_dvol:
        if _ACC_ZERO_ONCE:
            @pl.when(pl.program_id(0) == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)
    if use_xbox:
        dxs_ref[...] = jnp.zeros_like(dxs_ref)
    if use_sep:
        ohf_ref[...] = jnp.zeros_like(ohf_ref)
        oht_ref[...] = jnp.zeros_like(oht_ref)

    if not have_sv:
        def start_brick(B, slot):
            _brick_dma(vol_refs, brick_ref.at[slot], sem.at[slot],
                       org_ref, B, bz, by, wx)[0]()

        def wait_brick(B, slot):
            _brick_dma(vol_refs, brick_ref.at[slot], sem.at[slot],
                       org_ref, B, bz, by, wx)[1]()

        @pl.when(ng_live > 0)
        def _():
            start_brick(0, 0)

    # Double-buffered flush RMW over plan-time sessions (plan_sessions):
    # each session's HBM gradient box is *prefetched* at session start
    # (read DMA issued alongside 4-6 groups of compute), and the
    # write-back drains asynchronously into the next session. Only the
    # VPU add is left on the critical path — round 2's blocking
    # read + add + blocking write per flush is fully overlapped.
    shift = wx // 2

    def _rmw_wait_read(s):
        # Wait-by-size: the descriptor only sizes the semaphore wait,
        # so static offsets stand in for the session's real box.
        pltpu.make_async_copy(
            dv_refs[0].at[pl.ds(0, fz), pl.ds(0, fy), pl.ds(0, 128)],
            rmw_ref.at[s], sem_r.at[s]).wait()

    def _rmw_wait_write(s):
        pltpu.make_async_copy(
            rmw_ref.at[s],
            dv_refs[0].at[pl.ds(0, fz), pl.ds(0, fy), pl.ds(0, 128)],
            sem_w.at[s]).wait()

    def _rmw_read(s, azo, ayo, axo, aph, zo, yo_):
        ayo = pl.multiple_of(ayo, 8)
        zo = pl.multiple_of(zo, 8)
        yo_ = pl.multiple_of(yo_, 8)
        for p in range(n_phases):
            @pl.when(aph == p)
            def _(p=p, s=s):
                sx = pl.multiple_of(axo - shift * p, 128)
                pltpu.make_async_copy(
                    dv_refs[p].at[pl.ds(azo + zo, fz),
                                  pl.ds(ayo + yo_, fy), pl.ds(sx, 128)],
                    rmw_ref.at[s], sem_r.at[s]).start()

    def flush(azo, ayo, axo, aph, zo, yo_, k):
        """Drain the session that just ended: wait its prefetched HBM
        box, fold the accumulator's written box into it, start the
        write-back (waited two sessions later / at kernel end), and
        re-zero exactly that box."""
        ayo = pl.multiple_of(ayo, 8)
        zo = pl.multiple_of(zo, 8)
        yo_ = pl.multiple_of(yo_, 8)
        if need_dvol and "flush" not in abl:
            for s in range(2):
                @pl.when((k & 1) == s)
                def _(s=s):
                    _rmw_wait_read(s)
                    rmw_ref[s] = rmw_ref[s] + acc_ref[
                        pl.ds(zo, fz), pl.ds(yo_, fy), :]
                    for p in range(n_phases):
                        @pl.when(aph == p)
                        def _(p=p, s=s):
                            sx = pl.multiple_of(axo - shift * p, 128)
                            pltpu.make_async_copy(
                                rmw_ref.at[s],
                                dv_refs[p].at[
                                    pl.ds(azo + zo, fz),
                                    pl.ds(ayo + yo_, fy),
                                    pl.ds(sx, 128)],
                                sem_w.at[s]).start()
        # Zero only the flushed box: rows outside it were never written
        # with nonzero values (window rows beyond the tap support add
        # exact zeros), so the accumulator stays all-zero inductively.
        if need_dvol:
            acc_ref[pl.ds(zo, fz), pl.ds(yo_, fy), :] = jnp.zeros(
                (fz, fy, 128), jnp.float32)

    def body(carry):
        (B, acca, fin, P, azo, ayo, axo, aph, rzo, ryo, k, wf,
         novfx, rdpend) = carry
        slot = B & 1
        if not have_sv:
            wait_brick(B, slot)

            @pl.when(B + 1 < ng_live)
            def _():
                start_brick(B + 1, (B + 1) & 1)

        if _RMW_DEFER_READ and need_dvol and "flush" not in abl:
            # Deferred session read (see _RMW_DEFER_READ): fire the
            # S_WAIT drain + box-read issue for the session started on
            # the PREVIOUS group, using the carried placement.
            for s in range(2):
                @pl.when((rdpend > 0) & ((k & 1) == s))
                def _(s=s):
                    if use_xtile:
                        # First session of the tile: drain the PREVIOUS
                        # tile's outstanding flush write-backs (flagged
                        # in pers) before any read touches the slots or
                        # their HBM boxes — issued one group ago at its
                        # exit flush, so they have already landed.
                        for q in range(2):
                            @pl.when((k == 0) & (pw_pers[q] > 0))
                            def _(q=q):
                                _rmw_wait_write(q)
                    @pl.when(wf > 0)
                    def _(s=s):
                        _rmw_wait_write(1 - s)
                    _rmw_read(s, azo, ayo, axo, aph, rzo, ryo)

        bzo = org_ref[0, B, F_BZO]
        byo = pl.multiple_of(org_ref[0, B, F_BYO], 8)
        xo = org_ref[0, B, F_XO]

        # Plan-time session schedule: flush the finished session, then
        # prefetch the new session's HBM gradient box (read overlaps the
        # next 4-6 groups of compute; the write drains into them too).
        new = sorg_ref[0, B, S_NEW] > 0
        kp = k + 1  # the new session's index (valid where new)

        @pl.when(new & (k >= 0))
        def _():
            flush(azo, ayo, axo, aph, rzo, ryo, k)

        n_azo = sorg_ref[0, B, S_AZO]
        n_ayo = pl.multiple_of(sorg_ref[0, B, S_AYO], 8)
        n_rzo = sorg_ref[0, B, S_RZO]
        n_ryo = sorg_ref[0, B, S_RYO]
        n_aph = org_ref[0, B, F_PH]
        if need_dvol and "flush" not in abl:
            for s in range(2):
                @pl.when(new & ((kp & 1) == s))
                def _(s=s):
                    # Slot reuse: the write issued two sessions ago must
                    # drain before this read lands in the buffer —
                    # unless the previous session's S_WAIT already
                    # drained it (each write is waited exactly once).
                    @pl.when((kp >= 2) & (sorg_ref[0, B, S_PW] == 0))
                    def _(s=s):
                        _rmw_wait_write(s)
                    if not _RMW_DEFER_READ:
                        # Overlapping HBM boxes (plan-time flag): the
                        # previous session's write must land before we
                        # read. (_RMW_DEFER_READ moves this drain + the
                        # read one group later, off the critical path.)
                        @pl.when(sorg_ref[0, B, S_WAIT] > 0)
                        def _(s=s):
                            _rmw_wait_write(1 - s)
                        _rmw_read(s, n_azo, n_ayo, xo, n_aph, n_rzo,
                                  n_ryo)

        azo = jnp.where(new, n_azo, azo)
        ayo = pl.multiple_of(jnp.where(new, n_ayo, ayo), 8)
        axo = jnp.where(new, xo, axo)
        aph = jnp.where(new, n_aph, aph)
        rzo = jnp.where(new, n_rzo, rzo)
        ryo = jnp.where(new, n_ryo, ryo)
        wf = jnp.where(new, sorg_ref[0, B, S_WAIT], wf)
        k = jnp.where(new, kp, k)
        rdpend = jnp.where(new, jnp.int32(1), jnp.int32(0))

        tx, ty, tz, m_ana, pw = _geometry(
            rays, org_ref[0, B, F_B0], ray_step, dims,
            z_off=(scal_ref[0, 5] if slab else None),
            local_d=float(v0_ref.shape[0]))

        # Pass 1: the group's samples (lane-major) — read back from the
        # forward's streamed HBM copy when available (have_sv), else
        # replay the gather matmuls against the brick.
        if shade:
            tx2, ty2, tz2 = _light_coords(
                pw, scal_ref, dims,
                z_off=(scal_ref[0, 5] if slab else None),
                local_d=float(v0_ref.shape[0]))
        w_, h_, d_ = dims
        if have_sv:
            sv8 = sv_in_ref[0, pl.ds(B * G, G), :]
            if shade:
                sv8_2_saved = sv2_in_ref[0, pl.ds(B * G, G), :]
            if phong:
                gx8 = svg_in_refs[0][0, pl.ds(B * G, G), :]
                gy8 = svg_in_refs[1][0, pl.ds(B * G, G), :]
                gz8 = svg_in_refs[2][0, pl.ds(B * G, G), :]
        else:
            svals, svals2 = [], []
            gxs, gys, gzs = [], [], []
            for g in range(G):
                z0g, y0g = _band_scalars(
                    org_ref, B, g, bzo, byo, bz, by, wz, wy)
                bview = brick_ref[
                    slot, pl.ds(z0g - bzo, wz),
                    pl.ds(pl.multiple_of((y0g - byo) & ~7, 8), wy), :
                ].reshape(wz * wy, 128)[:, :wx]
                if "pass1" in abl:
                    sval = tz[g:g + 1] * 1e-8
                else:
                    sval, _, aux = _band_sample(
                        bview, (zrow, yrow, xrow), tx, ty, tz, z0g, y0g,
                        xo, g, wz, wy, wx, dtype, prec)
                svals.append(sval)
                if phong and "pass1" not in abl:
                    # Replay the forward's gradient taps (fwd kernel
                    # phong block) for the 512^3-scale no-stream path.
                    _, xw_c, _, xrows = aux
                    lz = tz[g:g + 1] - z0g.astype(jnp.float32)
                    ly = ty[g:g + 1] - y0g.astype(jnp.float32)
                    txg = tx[g:g + 1]
                    lxp = jnp.clip(txg + 1.0, 0.0, w_ - 1.0) - xo
                    lxm = jnp.clip(txg - 1.0, 0.0, w_ - 1.0) - xo
                    xw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lxp))
                            - jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lxm)))
                    gxs.append(jnp.sum(xrows * xw_d, axis=0,
                                       keepdims=True))
                    tyg = ty[g:g + 1]
                    lyp = jnp.clip(tyg + 1.0, 0.0, h_ - 1.0) \
                        - y0g.astype(jnp.float32)
                    lym = jnp.clip(tyg - 1.0, 0.0, h_ - 1.0) \
                        - y0g.astype(jnp.float32)
                    yw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lyp))
                            - jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lym)))
                    wzw = jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lz))
                    wmat_dy = _expand_taps(wzw, yw_d, wz, wy, dtype)
                    gys.append(jnp.sum(jax.lax.dot_general(
                        bview, wmat_dy, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec) * xw_c, axis=0, keepdims=True))
                    tzg = tz[g:g + 1]
                    lzp = jnp.clip(tzg + 1.0, 0.0, d_ - 1.0) \
                        - z0g.astype(jnp.float32)
                    lzm = jnp.clip(tzg - 1.0, 0.0, d_ - 1.0) \
                        - z0g.astype(jnp.float32)
                    zw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzp))
                            - jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzm)))
                    wyw = jnp.maximum(0.0, 1.0 - jnp.abs(yrow - ly))
                    wmat_dz = _expand_taps(zw_d, wyw, wz, wy, dtype)
                    gzs.append(jnp.sum(jax.lax.dot_general(
                        bview, wmat_dz, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec) * xw_c, axis=0, keepdims=True))
                elif phong:
                    gxs.append(sval * 0.0)
                    gys.append(sval * 0.0)
                    gzs.append(sval * 0.0)
                if shade:
                    sval2, _, _ = _band_sample(
                        bview, (zrow, yrow, xrow), tx2, ty2, tz2, z0g,
                        y0g, xo, g, wz, wy, wx, dtype, prec)
                    svals2.append(sval2)
            sv8 = jnp.concatenate(svals, axis=0)
            if phong:
                gx8 = jnp.concatenate(gxs, axis=0)
                gy8 = jnp.concatenate(gys, axis=0)
                gz8 = jnp.concatenate(gzs, axis=0)
        if "tf" in abl:
            svp = (sv8 if R >= 128
                   else jnp.pad(sv8, ((0, 0), (0, 128 - R))))
            cr8 = cg8 = cb8 = ca8 = svp * 0.01
            tt8 = svp * 100.0
            lo8 = jnp.clip(tt8.astype(jnp.int32), 0, TF_SIZE - 1)
            rng8 = jnp.ones_like(svp)
        else:
            (cr8, cg8, cb8, ca8), (tt8, lo8, rng8) = _tf_gather(
                sv8, None, lutl, pack=_TF_PACK_BF16 and fast)
        # Batched slope gathers (replaces a per-band d(one-hot) matmul).
        lanes = max(R, 128)
        if "slopes" in abl:
            slopes = [tt8 * (0.001 * (c + 1)) for c in range(4)]
        elif _TF_PACK_BF16 and fast and lanes == 128:
            # Packed slope gathers (see _TF_PACK_BF16): 4 -> 2.
            slopes = []
            for pr in (_pack2_bf16(slopel[0:1], slopel[1:2]),
                       _pack2_bf16(slopel[2:3], slopel[3:4])):
                src = jnp.broadcast_to(pr, (G, 128))
                v = jnp.take_along_axis(src, lo8, axis=1)
                sa, sb = _unpack2_bf16(v)
                slopes.append(sa)
                slopes.append(sb)
        else:
            slopes = []
            for c in range(4):
                ssrc = jnp.broadcast_to(slopel[c:c + 1, :], (G, 128))
                parts = [
                    jnp.take_along_axis(
                        ssrc, lo8[:, k * 128:(k + 1) * 128], axis=1)
                    for k in range(lanes // 128)
                ]
                slopes.append(jnp.concatenate(parts, axis=1)
                              if len(parts) > 1 else parts[0])

        if shade:
            sv8_2 = (sv8_2_saved if have_sv
                     else jnp.concatenate(svals2, axis=0))
            kd = scal_ref[0, 1]

        # Pass 2: batched cotangent chain (same cumulative-product
        # factorization as the forward; the suffix-sum trick's running
        # prefix P becomes one exclusive cumulative sum), then per-band
        # gradient matmuls + accumulator RMW.
        ca = ca8[:, :R]
        cr = cr8[:, :R]
        cg = cg8[:, :R]
        cb = cb8[:, :R]
        if shade:
            gate_f = ((ca > SHADE_ALPHA_GATE)
                      & (kd > SHADE_KD_GATE)).astype(jnp.float32)
            dsh = gate_f * (sv8_2[:, :R] - sv8[:, :R]) * kd
            cr = cr + dsh
            cg = cg + dsh
            cb = cb + dsh
        if phong:
            # Recreate the forward's per-band Blinn-Phong terms (fwd
            # kernel phong block) batched over the group: normal from
            # the raw gradient, diffuse/specular factors, gate.
            from volrt.constants import (
                PHONG_KA, PHONG_KS, PHONG_SHININESS)
            assert PHONG_SHININESS == 16.0
            kd_p = scal_ref[0, 1]
            px_, py_, pz_ = pw
            gxr = gx8[:, :R]
            gyr = gy8[:, :R]
            gzr = gz8[:, :R]
            ginv = jax.lax.rsqrt(
                gxr * gxr + gyr * gyr + gzr * gzr + 1e-16)
            nx, ny, nz = -gxr * ginv, -gyr * ginv, -gzr * ginv
            lx_ = scal_ref[0, 2] - px_[:, :R]
            ly_ = scal_ref[0, 3] - py_[:, :R]
            lz_ = scal_ref[0, 4] - pz_[:, :R]
            linv = jax.lax.rsqrt(
                lx_ * lx_ + ly_ * ly_ + lz_ * lz_ + 1e-20)
            lxn, lyn, lzn = lx_ * linv, ly_ * linv, lz_ * linv
            dxr, dyr, dzr = rays[3:4], rays[4:5], rays[5:6]
            vinv = jax.lax.rsqrt(
                dxr * dxr + dyr * dyr + dzr * dzr + 1e-20)
            vx, vy, vz = -dxr * vinv, -dyr * vinv, -dzr * vinv
            hx, hy, hz = lxn + vx, lyn + vy, lzn + vz
            hinv = jax.lax.rsqrt(
                hx * hx + hy * hy + hz * hz + 1e-20)
            p_dl = nx * lxn + ny * lyn + nz * lzn
            ndl = jnp.maximum(p_dl, 0.0)
            q_dh = nx * hx + ny * hy + nz * hz
            ndh = jnp.maximum(q_dh * hinv, 0.0)
            s2 = ndh * ndh
            s4 = s2 * s2
            s8 = s4 * s4
            s16 = s8 * s8
            lit = PHONG_KA + kd_p * ndl
            gate_p = ((ca > SHADE_ALPHA_GATE)
                      & (kd_p > SHADE_KD_GATE)).astype(jnp.float32)
            scale_p = (1.0 - gate_p) + gate_p * lit
            spec = PHONG_KS * s16 * ca
            cr0, cg0, cb0 = cr, cg, cb
            cr = cr * scale_p + gate_p * spec
            cg = cg * scale_p + gate_p * spec
            cb = cb * scale_p + gate_p * spec
        f, m, acca, fin = _group_weights(
            ca, m_ana, acca, fin, thr, no_ert=no_ert)
        contrib = (gr * cr + ggn * cg + gb * cb + ga * ca) * f
        P_in = P + _excl_cumsum(contrib)
        P = P + jnp.sum(contrib, axis=0, keepdims=True)
        S_next = G_total - (P_in + contrib)
        denom = 1.0 - ca
        t8 = jnp.where(
            denom > 1e-6, S_next / jnp.maximum(denom, 1e-6), 0.0) * m
        dcr8, dcg8, dcb8 = gr * f, ggn * f, gb * f
        dca8 = ga * f - t8
        if phong:
            # Cotangent chain through the Blinn-Phong transform.
            # dcr8.. are dL/d(shaded rgb); the TF's base colors see the
            # lit scale, alpha additionally feeds the specular term, and
            # the normal chain scatters into the six gradient taps.
            drgb8 = dcr8 + dcg8 + dcb8                    # (G, R)
            dlit = gate_p * (cr0 * dcr8 + cg0 * dcg8 + cb0 * dcb8)
            dndl = kd_p * dlit
            dndh = (gate_p * PHONG_KS * 16.0 * (s8 * s4 * s2 * ndh)
                    * ca * drgb8)
            dca8 = dca8 + gate_p * PHONG_KS * s16 * drgb8
            dcr8 = dcr8 * scale_p
            dcg8 = dcg8 * scale_p
            dcb8 = dcb8 * scale_p
            m_l = (p_dl > 0.0).astype(jnp.float32)
            m_h = (q_dh * hinv > 0.0).astype(jnp.float32)
            dnx = dndl * m_l * lxn + dndh * m_h * hinv * hx
            dny = dndl * m_l * lyn + dndh * m_h * hinv * hy
            dnz = dndl * m_l * lzn + dndh * m_h * hinv * hz
            # n = -g * ginv: dg = -ginv*dn + ginv^3*(dn.g)*g
            dng = dnx * gxr + dny * gyr + dnz * gzr
            g3 = ginv * ginv * ginv
            dgx8 = -ginv * dnx + g3 * dng * gxr
            dgy8 = -ginv * dny + g3 * dng * gyr
            dgz8 = -ginv * dnz + g3 * dng * gzr
        if need_dvol:
            dsval8 = (
                slopes[0][:, :R] * dcr8
                + slopes[1][:, :R] * dcg8
                + slopes[2][:, :R] * dcb8
                + slopes[3][:, :R] * dca8
            ) * rng8[:, :R]
        else:
            dsval8 = dcr8 * 0.0
        if shade:
            # diffuse = gate * kd * (s2 - s): the rgb cotangents flow
            # -kd into this tap's density and +kd into the light tap's.
            drgb8 = dcr8 + dcg8 + dcb8
            dsval8 = dsval8 - gate_f * kd * drgb8
            dsval2_8 = gate_f * kd * drgb8

        def dcol_f(g):
            return jnp.concatenate(
                [dcr8[g:g + 1], dcg8[g:g + 1], dcb8[g:g + 1],
                 dca8[g:g + 1], jnp.zeros((4, R), jnp.float32)],
                axis=0)                              # (8, R)

        # Applies to the shade/phong paths too: their cotangent columns
        # (dcr8..dca8, incl. phong's lit/spec chain) are group-batched
        # (G, R) arrays before the band loop, exactly like the
        # unshaded ones.
        use_kmerge = (bool(_DTF_KMERGE) and need_dtf
                      and "dtf" not in abl and "bandtail" not in abl)
        if use_kmerge:
            # One (TF_SIZE, G*R) @ (G*R, 8) matmul replaces the group's
            # G per-band N=8 matmuls (see _DTF_KMERGE above). Same
            # contraction, G-fold fewer MXU issues.
            GR = G * R

            def _flat(a):
                if _DTF_KMERGE == "concat":
                    return jnp.concatenate(
                        [a[g:g + 1, :R] for g in range(G)], axis=1)
                return a[:, :R].reshape(1, GR)

            tt_flat = _flat(tt8)
            dcol_big = jnp.concatenate(
                [_flat(dcr8), _flat(dcg8), _flat(dcb8), _flat(dca8),
                 jnp.zeros((4, GR), jnp.float32)], axis=0)  # (8, GR)
            if _DTF_KMERGE == "trans2":
                # Two-tap equality form: the hat's two taps at
                # (floor(tt), floor(tt)+1) with weights (1-frac, frac)
                # become TWO transposed matmuls against ONE integer-
                # equality one-hot E = (brow == floor(tt)) — E costs a
                # single compare per element vs the hat's 4-op build
                # (the build was ~20 ms exposed once the matmul shrank,
                # j123). The +1 tap folds in as a one-lane shift of the
                # second result; out-of-range taps drop exactly as the
                # hat's missing rows did (floor is UNclipped).
                brow_big = jax.lax.broadcasted_iota(
                    jnp.int32, (TF_SIZE, GR), 0).astype(jnp.float32)
                lo_u = jnp.floor(tt_flat)
                fr = tt_flat - lo_u
                # bf16 E-matrix probe (j205): halves the equality
                # one-hot's build/store bandwidth; E entries (0/1) stay
                # exact, A quantizes to bf16 (~0.4% dTF-grad error) —
                # fast-mode only, default off pending parity budget.
                e_bf16 = _DTF_E_BF16 and fast
                e_dt = jnp.bfloat16 if e_bf16 else jnp.float32
                if "dtfoh" in abl:
                    E = jnp.broadcast_to(
                        (tt_flat * 1e-30).astype(e_dt), (TF_SIZE, GR))
                else:
                    E = (brow_big == lo_u).astype(e_dt)
                A = jnp.concatenate(
                    [dcol_big[:4] * (1.0 - fr), dcol_big[:4] * fr],
                    axis=0).astype(e_dt)             # (8, GR)
                X = jax.lax.dot_general(
                    A, E, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)                  # (8, TF_SIZE)
                lo_part = X[:4]
                # One-lane right shift (tap at floor+1): roll + zero
                # lane 0 (jnp.pad's lane concat trips a Mosaic offset
                # bug at (4, 129)).
                hi_roll = pltpu.roll(X[4:], 1, axis=1)
                lane0 = jax.lax.broadcasted_iota(
                    jnp.int32, (4, TF_SIZE), 1) == 0
                hi_part = jnp.where(lane0, 0.0, hi_roll)
                tfc_t = jnp.concatenate(
                    [lo_part + hi_part, jnp.zeros((4, TF_SIZE),
                                                  jnp.float32)], axis=0)
                dtfacc_ref[...] += tfc_t.T
                ohb = None
            elif "dtfoh" in abl:
                # Build skipped, matmul kept (hat-build share probe).
                ohb = jnp.broadcast_to(tt_flat * 1e-30, (TF_SIZE, GR))
            else:
                brow_big = jax.lax.broadcasted_iota(
                    jnp.int32, (TF_SIZE, GR), 0).astype(jnp.float32)
                ohb = jnp.maximum(0.0, 1.0 - jnp.abs(brow_big - tt_flat))
            if _DTF_KMERGE == "trans2":
                pass
            elif _DTF_KMERGE == "trans":
                # Transposed orientation: the 4-row cotangent block
                # rides the M (sublane, granularity-8) axis instead of
                # the N (lane, granularity-128) axis, so the physical
                # MXU tile is (8, K, 128) — 1/16 the padded MACs of the
                # (TF_SIZE, K, 8->128) orientation. One (8, TF_SIZE)
                # transpose per group folds the result back.
                tfc_t = jax.lax.dot_general(
                    dcol_big, ohb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)                  # (8, TF_SIZE)
                dtfacc_ref[...] += tfc_t.T
            elif _DTF_BF16 and fast:
                tfc_big = jax.lax.dot_general(
                    ohb.astype(jnp.bfloat16),
                    dcol_big.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dtfacc_ref[...] += tfc_big
            else:
                tfc_big = jax.lax.dot_general(
                    ohb, dcol_big, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)                  # (TF_SIZE, 8)
                dtfacc_ref[...] += tfc_big

        dtf_g = None
        for g in (() if "bandtail" in abl else range(G)):
            # dTF scatter. Separable path (use_sep): accumulate the
            # f- and t-weighted one-hots into the per-tile (TF_SIZE, R)
            # VMEM accumulators; the two closing matmuls run once per
            # tile (see the epilogue) — j012 measured the 8-per-group
            # N=8 matmuls at ~24 ms of the headline step. Non-separable
            # (shade/phong): per-band oh @ dcol^T -> (TF_SIZE, 8),
            # accumulated in registers across the group's bands, one
            # VMEM RMW per group. (Measured dead end: splitting the hat
            # into an integer-equality one-hot with the 2-tap weights
            # folded into dcol costs 288.9 vs 243.9 ms — the second
            # matmul + accumulator exceed the 4-pass hat build.)
            if need_dtf and "dtf" not in abl and not use_kmerge:
                if "dtfoh" in abl:
                    # Constant one-hot (build skipped, matmul kept):
                    # isolates the (TF_SIZE, R) hat build's VPU share
                    # from the N=8 matmul's MXU-issue share.
                    oh = jnp.broadcast_to(
                        tt8[g:g + 1, :R] * 1e-30, (TF_SIZE, R))
                else:
                    oh = jnp.maximum(
                        0.0, 1.0 - jnp.abs(brow - tt8[g:g + 1, :R]))
                if use_sep:
                    ohf_ref[...] += oh * f[g:g + 1]
                    oht_ref[...] += oh * t8[g:g + 1]
                elif "dtfmm" in abl:
                    # Build kept, matmul replaced by a cheap row sink.
                    tfc = oh[:, 0:8] * 1e-30
                    dtf_g = tfc if dtf_g is None else dtf_g + tfc
                elif _DTF_BF16 and fast:
                    tfc = jax.lax.dot_general(
                        oh.astype(jnp.bfloat16),
                        dcol_f(g).astype(jnp.bfloat16),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dtf_g = tfc if dtf_g is None else dtf_g + tfc
                else:
                    tfc = jax.lax.dot_general(
                        oh, dcol_f(g), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)
                    dtf_g = tfc if dtf_g is None else dtf_g + tfc

            if not need_dvol:
                # TF-only training: the whole density
                # scatter (tap rebuild, dbrick matmul,
                # acc RMW, xbox) drops out; dv outputs
                # stay their aliased zero inits.
                continue
            dsval = dsval8[g:g + 1]
            if shade:
                dsval2 = dsval2_8[g:g + 1]

            # Rebuild the band's tap weights for the dBrick transpose
            # (measured no cheaper to stash in VMEM: the store/load
            # round-trip costs what the ~6-op rebuild does).
            z0g, y0g = _band_scalars(
                org_ref, B, g, bzo, byo, bz, by, wz, wy)
            lz = tz[g:g + 1] - z0g.astype(jnp.float32)
            ly = ty[g:g + 1] - y0g.astype(jnp.float32)
            lx = tx[g:g + 1] - xo.astype(jnp.float32)
            if "expand" in abl:
                wmat = jnp.full((wz * wy, R), 0.01, jnp.float32)
            elif "wmat" in abl:
                wmat = jnp.broadcast_to(
                    (zrow - lz)[:, None, :], (wz, wy, R)).reshape(
                        wz * wy, R)
            else:
                wzw = jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lz))
                wyw = jnp.maximum(0.0, 1.0 - jnp.abs(yrow - ly))
                wmat = _expand_taps(wzw, wyw, wz, wy, jnp.float32)
            if use_xbox and "xbox" not in abl:
                # Sparse Dx: write the XBOX-row footprint into the
                # zeroed scratch, hand the full (wx, R) view to the
                # matmul, then re-zero the box. Taps outside the
                # planned box are dropped and counted (novfx).
                x0b = (org_ref[0, B, F_X0L]
                       + ((org_ref[0, B, F_DXL] * g) >> SLOPE_BITS))
                x0loc = pl.multiple_of(
                    jnp.clip(x0b - xo, 0, wx - xbw) & ~7, 8)
                lxl = lx - x0loc.astype(jnp.float32)
                novfx = novfx + jnp.where(
                    ((lxl < 0.0) | (lxl > xbw - 1.0)) & (m[g:g + 1] > 0),
                    1.0, 0.0)
                xw16 = jnp.maximum(0.0, 1.0 - jnp.abs(xrow16 - lxl))
                dxs_ref[pl.ds(x0loc, xbw), :] = dsval * xw16
                Dx = dxs_ref[:, :]                   # (wx, R)
            else:
                xw = jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lx))
                Dx = dsval * xw                      # (wx, R)
            if phong:
                # gx's x-difference weights share the base (z, y) tap
                # matrix, so that scatter folds into the same matmul.
                txg = tx[g:g + 1]
                lxp = jnp.clip(txg + 1.0, 0.0, w_ - 1.0) - xo
                lxm = jnp.clip(txg - 1.0, 0.0, w_ - 1.0) - xo
                xw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lxp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lxm)))
                Dx = Dx + dgx8[g:g + 1] * xw_d
            if "dbrick" in abl:
                dbrick = (jnp.zeros((wz * wy, wx), jnp.float32)
                          + wmat[:, 0:1] + jnp.sum(Dx) * 1e-30)
            elif _SHADE_KCAT and ((shade and "shadetap" not in abl)
                                  or (phong
                                      and "phongtaps" not in abl)):
                dbrick = None  # folded into the tap K-concat below
            else:
                dbrick = jax.lax.dot_general(
                    wmat, Dx, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)                  # (wz*wy, wx)
            if (phong and "phongtaps" not in abl
                    and _SHADE_KCAT and "dbrick" not in abl):
                # 3-way K-concat (see _SHADE_KCAT): base + gy + gz
                # scatters in ONE (wz*wy, 3R) @ (3R, wx) matmul.
                tyg = ty[g:g + 1]
                lyp = jnp.clip(tyg + 1.0, 0.0, h_ - 1.0) \
                    - y0g.astype(jnp.float32)
                lym = jnp.clip(tyg - 1.0, 0.0, h_ - 1.0) \
                    - y0g.astype(jnp.float32)
                yw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lyp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lym)))
                wzw_p = jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lz))
                wmat_dy = _expand_taps(wzw_p, yw_d, wz, wy, jnp.float32)
                tzg = tz[g:g + 1]
                lzp = jnp.clip(tzg + 1.0, 0.0, d_ - 1.0) \
                    - z0g.astype(jnp.float32)
                lzm = jnp.clip(tzg - 1.0, 0.0, d_ - 1.0) \
                    - z0g.astype(jnp.float32)
                zw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzm)))
                wyw_p = jnp.maximum(0.0, 1.0 - jnp.abs(yrow - ly))
                wmat_dz = _expand_taps(zw_d, wyw_p, wz, wy, jnp.float32)
                dbrick = jax.lax.dot_general(
                    jnp.concatenate([wmat, wmat_dy, wmat_dz], axis=1),
                    jnp.concatenate(
                        [Dx, dgy8[g:g + 1] * xw, dgz8[g:g + 1] * xw],
                        axis=1),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
            elif phong and "phongtaps" not in abl:
                # gy / gz scatters: the shifted-hat difference matrices
                # of the forward's central-difference taps, transposed.
                tyg = ty[g:g + 1]
                lyp = jnp.clip(tyg + 1.0, 0.0, h_ - 1.0) \
                    - y0g.astype(jnp.float32)
                lym = jnp.clip(tyg - 1.0, 0.0, h_ - 1.0) \
                    - y0g.astype(jnp.float32)
                yw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lyp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(yrow - lym)))
                wzw_p = jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lz))
                wmat_dy = _expand_taps(wzw_p, yw_d, wz, wy, jnp.float32)
                tzg = tz[g:g + 1]
                lzp = jnp.clip(tzg + 1.0, 0.0, d_ - 1.0) \
                    - z0g.astype(jnp.float32)
                lzm = jnp.clip(tzg - 1.0, 0.0, d_ - 1.0) \
                    - z0g.astype(jnp.float32)
                zw_d = (jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzp))
                        - jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lzm)))
                wyw_p = jnp.maximum(0.0, 1.0 - jnp.abs(yrow - ly))
                wmat_dz = _expand_taps(zw_d, wyw_p, wz, wy, jnp.float32)
                dbrick = dbrick + jax.lax.dot_general(
                    wmat_dy, dgy8[g:g + 1] * xw,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec) + jax.lax.dot_general(
                    wmat_dz, dgz8[g:g + 1] * xw,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
            if shade and "shadetap" not in abl:
                # Second scatter: the light tap's footprint.
                lz2 = tz2[g:g + 1] - z0g.astype(jnp.float32)
                ly2 = ty2[g:g + 1] - y0g.astype(jnp.float32)
                lx2 = tx2[g:g + 1] - xo.astype(jnp.float32)
                wzw2 = jnp.maximum(0.0, 1.0 - jnp.abs(zrow - lz2))
                wyw2 = jnp.maximum(0.0, 1.0 - jnp.abs(yrow - ly2))
                wmat2 = _expand_taps(wzw2, wyw2, wz, wy, jnp.float32)
                xw2 = jnp.maximum(0.0, 1.0 - jnp.abs(xrow - lx2))
                if _SHADE_KCAT:
                    # Fold the light tap into the base scatter as a
                    # K-concat: one (wz*wy, 2R) @ (2R, wx) matmul
                    # replaces two — same MACs, half the MXU issues.
                    dbrick = jax.lax.dot_general(
                        jnp.concatenate([wmat, wmat2], axis=1),
                        jnp.concatenate([Dx, dsval2 * xw2], axis=1),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)
                else:
                    dbrick = dbrick + jax.lax.dot_general(
                        wmat2, dsval2 * xw2, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)
            if wx < 128:
                dbrick = jnp.pad(dbrick, ((0, 0), (0, 128 - wx)))
            if "accrmw" not in abl:
                acc_ref[
                    pl.ds(z0g - azo, wz),
                    pl.ds(pl.multiple_of((y0g - ayo) & ~7, 8), wy), :
                ] += dbrick.reshape(wz, wy, 128)
            else:
                # Keep dbrick live so DCE can't drop the matmul itself
                # (cheap sink: one row, no full reduction).
                acca = acca + dbrick[0:1, 0:1] * 1e-30
            if use_xbox and "xbox" not in abl:
                # Restore the scratch's all-zero invariant for the next
                # band (the store above is the only nonzero box).
                dxs_ref[pl.ds(x0loc, xbw), :] = jnp.zeros(
                    (xbw, R), jnp.float32)
        if dtf_g is not None:
            dtfacc_ref[...] += dtf_g
        return (B + 1, acca, fin, P, azo, ayo, axo, aph, rzo, ryo,
                k, wf, novfx, rdpend)

    def cond(carry):
        B, fin = carry[0], carry[2]
        if no_ert:
            return B < ng_live
        return (B < ng_live) & jnp.any(alive0 * (1.0 - fin) > 0.0)

    z = jnp.zeros((1, R), jnp.float32)
    zi = jnp.int32(0)
    acca0 = acc0_row if slab else z
    fin0 = jnp.maximum(
        1.0 - alive0, alive0 * (acc0_row > thr).astype(jnp.float32)
    ) if slab else (1.0 - alive0)
    res = jax.lax.while_loop(
        cond, body, (0, acca0, fin0, z, zi, zi, zi, zi, zi, zi,
                     jnp.int32(-1), zi, z, zi))
    B_exit = res[0]
    azo, ayo, axo, aph = res[4], res[5], res[6], res[7]
    rzo, ryo, k, wf = res[8], res[9], res[10], res[11]

    if not have_sv:
        @pl.when(B_exit < ng_live)
        def _():
            wait_brick(B_exit, B_exit & 1)

    if _RMW_DEFER_READ and need_dvol and "flush" not in abl:
        # A read still pending at loop exit (session started on the
        # final processed group, or ERT exit) must be issued before the
        # exit flush waits on it.
        rdpend_x = res[13]
        for s in range(2):
            @pl.when((k >= 0) & (rdpend_x > 0) & ((k & 1) == s))
            def _(s=s):
                if use_xtile:
                    for q in range(2):
                        @pl.when((k == 0) & (pw_pers[q] > 0))
                        def _(q=q):
                            _rmw_wait_write(q)
                @pl.when(wf > 0)
                def _(s=s):
                    _rmw_wait_write(1 - s)
                _rmw_read(s, azo, ayo, axo, aph, rzo, ryo)

    @pl.when(k >= 0)
    def _():
        flush(azo, ayo, axo, aph, rzo, ryo, k)

    # Outstanding write-backs at grid-step end: the final session's,
    # and the one before it unless the final session's S_WAIT already
    # drained it (never wait a semaphore twice). With use_xtile they
    # are RECORDED (pers flags) and drained by the next tile's first
    # deferred read instead of blocking here; the last grid step (and
    # trailing sessionless tiles' inherited flags) drain for real.
    if need_dvol and "flush" not in abl:
        outw = [((k >= 0) & ((k & 1) == s))
                | ((k >= 1) & ((k & 1) != s) & (wf == 0))
                for s in range(2)]
        if use_xtile:
            last = pl.program_id(0) == pl.num_programs(0) - 1
            for s in range(2):
                @pl.when(last & jnp.where(k >= 0, outw[s],
                                          pw_pers[s] > 0))
                def _(s=s):
                    _rmw_wait_write(s)

            @pl.when(k >= 0)
            def _():
                pers_ref[0] = outw[0].astype(jnp.int32)
                pers_ref[1] = outw[1].astype(jnp.int32)
        else:
            for s in range(2):
                @pl.when(outw[s])
                def _(s=s):
                    _rmw_wait_write(s)

    if slab:
        # Seed cotangent: out = seed + (1 - acc0) * U with U the unseeded
        # march sum, so dL/dacc0 = g_a - <g, U> = g_a - P / (1 - acc0).
        # (ERT truncation depends on acc0 only through a measure-zero
        # jump, ignored exactly as XLA autodiff does for masked marches.)
        P_final = res[3]
        dacc0 = ga - P_final / jnp.maximum(1.0 - acc0_row, 1e-6)
        dr_ref[0] = jnp.concatenate(
            [dacc0, jnp.zeros((7, R), jnp.float32)], axis=0)

    if use_xbox:
        # Surface the gradient-scatter x-box miss count through the
        # (autodiff-stripped) dTF padding cell [1, 7] — the runtime
        # detector matching planned_window_ovf(xbox=True)'s plan check.
        novfx_t = res[12]
        cell = ((jax.lax.broadcasted_iota(jnp.int32, tuple(
            dtfacc_ref.shape), 0) == 1)
            & (jax.lax.broadcasted_iota(jnp.int32, tuple(
                dtfacc_ref.shape), 1) == 7)).astype(jnp.float32)
        dtfacc_ref[...] += cell * jnp.sum(novfx_t)

    if (use_sep and need_dtf and "dtf" not in abl
            and "bandtail" not in abl):
        # Close the separable scatter: dTF = OHF @ [g_r;g_g;g_b;g_a]^T
        # minus the alpha column's OHT row-sum (the non-separable
        # downstream-transmittance term). Two matmuls per tile.
        gvec = jnp.concatenate(
            [gr, ggn, gb, ga, jnp.zeros((4, R), jnp.float32)], axis=0)
        dtf_sep = jax.lax.dot_general(
            ohf_ref[...], gvec, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        asum = jnp.sum(oht_ref[...], axis=1, keepdims=True)
        acol = (jax.lax.broadcasted_iota(
            jnp.int32, (TF_SIZE, 8), 1) == 3).astype(jnp.float32)
        dtfacc_ref[...] += dtf_sep - acol * asum

    dtf_ref[...] += dtfacc_ref[...]


def _fused_kernel(
    scal_ref, org_ref, rays_ref, v0_ref, v1_ref, v2_ref, v3_ref,
    tfl_ref, lutl_ref, tgt_ref,
    dv0_in_ref, dv1_in_ref, dv2_in_ref, dv3_in_ref, sorg_ref,
    out_ref, dv0_ref, dv1_ref, dv2_ref, dv3_ref, dtf_ref,
    brick_ref, sem, *scr,
    dims, ray_step, wz, wy, wx, n_phases, fast, no_ert, window,
    need_dtf, need_dvol, shade=False, phong=False,
):
    """One-pass fused L2 step: forward march, per-ray MSE cotangent, and
    the analytic backward in a SINGLE kernel. The per-tile streamed
    sample values (sv — plus the light-tap/gradient channels under
    shade/phong) live in VMEM scratch between the two in-kernel passes
    instead of round-tripping through HBM (2 x ~1.07 GB unshaded at the
    256^3/1024^2 headline; phong's 4.3 GB made the two-kernel path
    REPLAY its whole forward instead — here the channels are free), and
    the image->cotangent XLA pass + second kernel launch disappear.
    Non-slab (that keeps the two-kernel custom_vjp path).
    ``scal[0, 6]`` carries the loss scale 2/denom; ``tgt`` rows 0..3
    the target RGBA tile."""
    n_sv = 1 + int(shade) + 3 * int(phong)
    sv_scrs = scr[:n_sv]
    g_scr = scr[n_sv]
    rest_scr = scr[n_sv + 1:]
    _fwd_kernel(
        scal_ref, org_ref, rays_ref, v0_ref, v1_ref, v2_ref, v3_ref,
        tfl_ref, lutl_ref, out_ref, *sv_scrs, brick_ref, sem,
        dims=dims, ray_step=ray_step, wz=wz, wy=wy, wx=wx,
        n_phases=n_phases, fast=fast, save_sv=True, no_ert=no_ert,
        shade=shade, phong=phong)
    o = out_ref[0]
    # dL/dout for L = sum((out - tgt)^2) * (scale/2): masked by the
    # alive flag (dead/padded lanes must not seed cotangent — identical
    # to the XLA path where untile_rays drops them before the loss).
    alive = rays_ref[0][8:9]
    g4 = (o[0:4] - tgt_ref[0][0:4]) * (scal_ref[0, 6] * alive)
    gt = jnp.sum(g4 * o[0:4], axis=0, keepdims=True)
    g_scr[0] = jnp.concatenate(
        [g4, gt, jnp.zeros((3, R), jnp.float32)], axis=0)
    _bwd_kernel(
        scal_ref, org_ref, rays_ref, v0_ref, v1_ref, v2_ref, v3_ref,
        tfl_ref, lutl_ref, g_scr,
        dv0_in_ref, dv1_in_ref, dv2_in_ref, dv3_in_ref,
        *sv_scrs, sorg_ref, dv0_ref, dv1_ref, dv2_ref, dv3_ref,
        dtf_ref, *rest_scr,
        dims=dims, ray_step=ray_step, wz=wz, wy=wy, wx=wx,
        n_phases=n_phases, fast=fast, have_sv=True,
        brick_shape=(brick_ref.shape[1], brick_ref.shape[2]),
        no_ert=no_ert, window=window, need_dtf=need_dtf,
        need_dvol=need_dvol, shade=shade, phong=phong)


def _pallas_fused(scal, org, rays_t, vols, tfl, tgt8, *, dims, ray_step,
                  window, fast, flush=None, no_ert=False, need_dtf=True,
                  need_dvol=True, shade=False, phong=False):
    """One-launch fused L2 fwd+bwd -> (out_tiles, dvs, dtf)."""
    assert not (shade and phong)
    t = rays_t.shape[0]
    ngr = org.shape[1]
    wz, wy, wx = window[:3]
    n_phases = len(vols)
    v4 = list(vols) + [vols[0]] * (4 - n_phases)
    bz, by = _brick_shape(v4[0].shape, wz, wy, window[3:5])
    az, ay = _acc_shape(v4[0].shape, wz, wy, window[3:5])
    if flush is None:
        fz, fy = az, ay
    else:
        fz = min(-(-int(flush[0]) // 8) * 8, az)
        fy = min(-(-int(flush[1]) // 8) * 8, ay)
    lutl = jnp.pad(tfl[:, :4].T, ((0, 4), (0, 0)))  # (8, TF_SIZE)
    kernel = functools.partial(
        _fused_kernel, dims=dims, ray_step=ray_step, wz=wz, wy=wy,
        wx=wx, n_phases=n_phases, fast=fast, no_ert=no_ert,
        window=window, need_dtf=need_dtf, need_dvol=need_dvol,
        shade=shade, phong=phong)
    vshape = v4[0].shape
    dv_shapes = [vshape if p < n_phases else (8, 8, 128)
                 for p in range(4)]
    dv_inits = [jnp.zeros(s, jnp.float32) for s in dv_shapes]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, ngr, ORG_C), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, layout.N_CHANNELS, R), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, R), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, ngr, SORG_C), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    sorg, lost_t = plan_sessions(org, vshape, wz, wy, fz, fy, wx,
                                 bpad=window[3:5])
    out_specs = (
        pl.BlockSpec((1, 8, R), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(tfl.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((t, 8, R), jnp.float32),
        *(jax.ShapeDtypeStruct(s, jnp.float32) for s in dv_shapes),
        jax.ShapeDtypeStruct(tfl.shape, jnp.float32),
    )
    xbw = window[5] if len(window) > 5 else 0
    n_sv = 1 + int(shade) + 3 * int(phong)
    use_xbox = not shade and not phong and 0 < xbw < wx
    use_sep = _DTF_SEP and not shade and not phong
    outs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, bz, by, 128), v4[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ] + [pltpu.VMEM((1, ngr * G, R), jnp.float32)
             for _ in range(n_sv)] + [
            pltpu.VMEM((1, 8, R), jnp.float32),
            pltpu.VMEM((az, ay, 128), jnp.float32),
            pltpu.VMEM((2, fz, fy, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM(tfl.shape, jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
        ] + ([pltpu.VMEM((wx, R), jnp.float32)] if use_xbox else [])
        + ([pltpu.VMEM((TF_SIZE, R), jnp.float32),
            pltpu.VMEM((TF_SIZE, R), jnp.float32)] if use_sep else []),
        input_output_aliases={10: 1, 11: 2, 12: 3, 13: 4},
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, org, rays_t, *v4, tfl, lutl, tgt8, *dv_inits, sorg)
    dtf = outs[5]
    if (fz, fy) != (az, ay):
        dtf = dtf.at[0, 7].add(jnp.sum(lost_t).astype(jnp.float32))
    return outs[0], outs[1:1 + n_phases], dtf


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11,
                                                    12, 13, 14, 15))
def _loss_tiles_fused(scal, org, rays_t, vols, tfl, tgt8,
                      dims, ray_step, window, fast, flush, no_ert,
                      need_dtf, need_dvol, shade=False, phong=False):
    out, _, _ = _pallas_fused(
        scal, org, rays_t, vols, tfl, tgt8, dims=dims,
        ray_step=ray_step, window=window, fast=fast, flush=flush,
        no_ert=no_ert, need_dtf=need_dtf, need_dvol=need_dvol,
        shade=shade, phong=phong)
    diff = out[:, :4, :] - tgt8[:, :4, :]
    return jnp.sum(diff * diff) * (scal[0, 6] * 0.5)


def _loss_fused_fwd(scal, org, rays_t, vols, tfl, tgt8, dims, ray_step,
                    window, fast, flush, no_ert, need_dtf, need_dvol,
                    shade=False, phong=False):
    out, dvs, dtf = _pallas_fused(
        scal, org, rays_t, vols, tfl, tgt8, dims=dims,
        ray_step=ray_step, window=window, fast=fast, flush=flush,
        no_ert=no_ert, need_dtf=need_dtf, need_dvol=need_dvol,
        shade=shade, phong=phong)
    diff = out[:, :4, :] - tgt8[:, :4, :]
    loss = jnp.sum(diff * diff) * (scal[0, 6] * 0.5)
    return loss, (scal, org, rays_t, tgt8, dvs, dtf)


def _loss_fused_bwd(dims, ray_step, window, fast, flush, no_ert,
                    need_dtf, need_dvol, shade, phong, res, gbar):
    scal, org, rays_t, tgt8, dvs, dtf = res
    return (jnp.zeros_like(scal), jnp.zeros_like(org),
            jnp.zeros_like(rays_t), tuple(dv * gbar for dv in dvs),
            dtf * gbar, jnp.zeros_like(tgt8))


_loss_tiles_fused.defvjp(_loss_fused_fwd, _loss_fused_bwd)


def l2_loss_grads_v3_onepass(scene, view, target, ray_threshold=0.95,
                             window=None, fast=False, flush=None,
                             plan=None, need_dtf=True, need_dvol=True,
                             esl=False, shaded=False, phong=False,
                             light_kd=0.6):
    """Full-image MSE loss + scene gradients in ONE kernel launch.

    Mathematically identical to ``value_and_grad(lambda s:
    mean((render_image_v3(s, view, ...) - target) ** 2))`` through the
    fused two-kernel path, but the forward march, the per-ray L2
    cotangent, and the analytic backward run in a single Pallas kernel:
    the per-tile sample values stay in VMEM scratch between the
    in-kernel passes, removing the streamed-sv HBM round-trip and a
    kernel launch. Unshaded, non-slab (train paths with shading keep
    the two-kernel route). ``flush``/``window``/``plan`` as in
    :func:`render_view_v3`. ``esl=True`` re-derives plan-time
    empty-group compaction from the live scene TF (mutually exclusive
    with ``plan``, which would embed a stale empty set)."""
    if esl and plan is not None:
        raise ValueError(
            "plan embeds a fixed empty set; use esl=True without a plan")
    if shaded and phong:
        raise ValueError("shaded and phong are mutually exclusive")
    d, h, w = scene.density.shape
    dims = (w, h, d)
    wv, hv = view.dims
    window = _view_window(dims, view, window, shaded, phong)
    no_ert = (isinstance(ray_threshold, (int, float))
              and ray_threshold >= 1.0)
    wp, hp = layout.pad_dims(wv, hv, TILE, TILE)
    tgt = jnp.asarray(target, jnp.float32)
    tgt = jnp.pad(tgt, ((0, hp - hv), (0, wp - wv), (0, 0)))
    tgt_t = layout.tile_rays(tgt, wv, hv, tile_w=TILE, tile_h=TILE)
    tgt8 = jnp.pad(jnp.swapaxes(tgt_t, 1, 2),
                   ((0, 0), (0, 4), (0, 0)))          # (T, 8, R)
    denom = float(hv) * float(wv) * 4.0
    lp = view.light_pos.astype(jnp.float32).reshape(3)
    scal = jnp.concatenate([
        jnp.asarray(ray_threshold, jnp.float32).reshape(1),
        jnp.asarray(light_kd if (shaded or phong) else 0.0,
                    jnp.float32).reshape(1),
        lp, jnp.zeros(1, jnp.float32),
        jnp.asarray(2.0 / denom, jnp.float32).reshape(1),
        jnp.zeros(1, jnp.float32)]).reshape(1, 8)
    if plan is None:
        tiles = layout.prepare_ray_tiles_raw(
            view, scene.ray_step, None, tile_w=TILE, tile_h=TILE)
        rays_t = jnp.swapaxes(tiles, 1, 2)
        vshape = _padded_vshape(scene.density.shape, window[2])
        bz, by = _brick_shape(vshape, window[0], window[1],
                              window[3:5])
        empty = esl_block = None
        if esl:
            from volrt.diff.render import scene_empty_grid

            empty, esl_block, _ = scene_empty_grid(scene)
        org = plan_windows(
            tiles, dims, vshape, scene.ray_step, window[0], window[1],
            bz, by, wx=window[2], view_dims=view.dims,
            empty=empty, esl_block=esl_block)
    else:
        org, rays_t = plan.org, plan.rays_t
    fl = None if flush is None else tuple(flush)

    def outer(density, tf_base):
        premult = jnp.concatenate(
            [tf_base[:, :3] * tf_base[:, 3:4], tf_base[:, 3:4]],
            axis=-1)
        tfl = jnp.pad(premult, ((0, 0), (0, 4)))
        vols = _phase_volumes(
            density, window[2],
            storage=jnp.bfloat16 if fast else None)
        return _loss_tiles_fused(
            scal, org, rays_t, vols, tfl, tgt8, dims, scene.ray_step,
            window, fast, fl, no_ert, bool(need_dtf), bool(need_dvol),
            bool(shaded) and not phong, bool(phong))

    loss, (dd, dtfb) = jax.value_and_grad(outer, argnums=(0, 1))(
        scene.density, scene.tf_base)
    grads = jax.tree.map(jnp.zeros_like, scene).replace(
        density=dd, tf_base=dtfb)
    return loss, grads


def _brick_shape(vol_shape, wz, wy, bpad=None):
    bpz, bpy = bpad if bpad else (BPAD_Z, BPAD_Y)
    bz = min(vol_shape[0], wz + bpz)
    by = min(vol_shape[1], -(-(wy + bpy) // 8) * 8)
    return bz, by


def _acc_shape(vol_shape, wz, wy, bpad=None):
    bz, by = _brick_shape(vol_shape, wz, wy, bpad)
    az = min(vol_shape[0], bz + APAD_Z)
    ay = min(vol_shape[1], -(-(by + APAD_Y) // 8) * 8)
    return az, ay


# NOTE (JAX 0.9, CPU interpret mode): after grad-of-shard_map and
# shard_map'ed forward kernels have both run in one process (e.g. the
# volume-sharded XLA backward followed by the pallas slab backend), a
# later *single-device* re-trace of these kernels inside a pjit
# transpose can inherit mesh-typed avals from cached jaxprs and fail
# with "Mesh for all inputs should be equal ... Auto ... Manual".
# ``jax.clear_caches()`` before the single-device trace clears it.
# Clamping the ambient mesh via use_abstract_mesh here instead breaks
# pjit const handling ("Execution supplied N buffers but compiled
# program expected M"), so no in-library workaround is applied; the
# test suite isolates the affected orderings (tests/test_dist.py).
def _pallas_fwd(scal, org, rays_t, vols, tfl, *, dims, ray_step,
                window, fast, shade=False, slab=False, phong=False,
                save_sv=False, no_ert=False):
    t = rays_t.shape[0]
    ngr = org.shape[1]
    wz, wy, wx = window[:3]
    n_phases = len(vols)
    v4 = list(vols) + [vols[0]] * (4 - n_phases)
    bz, by = _brick_shape(v4[0].shape, wz, wy, window[3:5])
    lutl = jnp.pad(tfl[:, :4].T, ((0, 4), (0, 0)))  # (8, TF_SIZE)
    kernel = functools.partial(
        _fwd_kernel, dims=dims, ray_step=ray_step, wz=wz, wy=wy, wx=wx,
        n_phases=n_phases, fast=fast, shade=shade, slab=slab,
        phong=phong, save_sv=save_sv, no_ert=no_ert)
    out_specs = [pl.BlockSpec((1, 8, R), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((t, 8, R), jnp.float32)]
    n_sv = (1 + int(shade) + 3 * int(phong)) if save_sv else 0
    for _ in range(n_sv):
        out_specs.append(pl.BlockSpec(
            (1, ngr * G, R), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((t, ngr * G, R), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ngr, ORG_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, layout.N_CHANNELS, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if save_sv else out_specs[0],
        out_shape=tuple(out_shape) if save_sv else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((2, bz, by, 128), v4[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, org, rays_t, *v4, tfl, lutl)
    return outs


def _pallas_bwd(scal, org, rays_t, vols, tfl, gG, *, dims, ray_step,
                window, fast, shade=False, flush=None, sv=None,
                sv2=None, sv_g=None, slab=False, phong=False,
                no_ert=False, need_dtf=True, need_dvol=True):
    t = rays_t.shape[0]
    ngr = org.shape[1]
    wz, wy, wx = window[:3]
    n_phases = len(vols)
    v4 = list(vols) + [vols[0]] * (4 - n_phases)
    bz, by = _brick_shape(v4[0].shape, wz, wy, window[3:5])
    az, ay = _acc_shape(v4[0].shape, wz, wy, window[3:5])
    if flush is None:
        fz, fy = az, ay
    else:
        fz = min(-(-int(flush[0]) // 8) * 8, az)
        fy = min(-(-int(flush[1]) // 8) * 8, ay)
    have_sv = sv is not None
    lutl = jnp.pad(tfl[:, :4].T, ((0, 4), (0, 0)))  # (8, TF_SIZE)
    kernel = functools.partial(
        _bwd_kernel, dims=dims, ray_step=ray_step, wz=wz, wy=wy, wx=wx,
        n_phases=n_phases, fast=fast, shade=shade, have_sv=have_sv,
        brick_shape=(bz, by), slab=slab, phong=phong, no_ert=no_ert,
        window=window, need_dtf=need_dtf, need_dvol=need_dvol)
    vshape = v4[0].shape
    # Unused phase slots get token-sized buffers (the kernel touches only
    # dv_refs[:n_phases]) — at 512^3 full-size zeros here waste ~1.2 GB.
    dv_shapes = [vshape if p < n_phases else (8, 8, 128)
                 for p in range(4)]
    dv_inits = [jnp.zeros(s, jnp.float32) for s in dv_shapes]
    sv_ins = [x for x in (sv, sv2) if x is not None]
    if sv_g is not None:
        sv_ins += list(sv_g)
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ngr, ORG_C), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, layout.N_CHANNELS, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, R), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
    ] + [
        pl.BlockSpec((1, ngr * G, R), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in sv_ins
    ] + [
        pl.BlockSpec((1, ngr, SORG_C), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    sorg, lost_t = plan_sessions(org, v4[0].shape, wz, wy, fz, fy, wx,
                                 bpad=window[3:5])
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(tfl.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        *(jax.ShapeDtypeStruct(s, jnp.float32) for s in dv_shapes),
        jax.ShapeDtypeStruct(tfl.shape, jnp.float32),
    ]
    if slab:
        # Per-ray cotangent of the seeded opacity (row 0; rows 1-7 zero).
        out_specs.append(pl.BlockSpec((1, 8, R), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((t, 8, R), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=([] if have_sv else [
            pltpu.VMEM((2, bz, by, 128), v4[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]) + [
            pltpu.VMEM((az, ay, 128), jnp.float32),
            pltpu.VMEM((2, fz, fy, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM(tfl.shape, jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
        ] + ([pltpu.VMEM((wx, R), jnp.float32)]
             if (not shade and not phong
                 and 0 < (window[5] if len(window) > 5 else 0) < wx)
             else [])
        + ([pltpu.VMEM((TF_SIZE, R), jnp.float32),
            pltpu.VMEM((TF_SIZE, R), jnp.float32)]
           if (_DTF_SEP and not shade and not phong) else []),
        input_output_aliases={10: 0, 11: 1, 12: 2, 13: 3},
        compiler_params=tpu_compiler_params(),
        interpret=interpret_mode(),
    )(scal, org, rays_t, *v4, tfl, lutl, gG, *dv_inits, *sv_ins, sorg)
    dtf = outs[4]
    if (fz, fy) != (az, ay):
        # Surface the plan-time flush-clip count through the (otherwise
        # zero) dTF padding cell [0, 7] — same observable as round 2's
        # in-kernel counter, but computed from planned (not realized)
        # coverage, so ERT early exit cannot mask an undersized box.
        dtf = dtf.at[0, 7].add(jnp.sum(lost_t).astype(jnp.float32))
    return outs[:n_phases], dtf, (outs[5] if slab else None)


def _pack_gG(g, out):
    """(T, 8, R): rows 0..3 cotangent, row 4 G = g . C (from saved out)."""
    gt = jnp.sum(g[:, :4] * out[:, :4], axis=1, keepdims=True)
    return jnp.concatenate(
        [g[:, :4], gt, jnp.zeros_like(g[:, :3])], axis=1)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                                    15))
def render_tiles_v3(scal, org, rays_t, vols, tfl,
                    dims, ray_step, window, fast=False, shade=False,
                    flush=None, slab=False, phong=False, no_ert=False,
                    need_dtf=True, need_dvol=True):
    """Differentiable v3 tile render.

    Inputs: ``rays_t (T, C, R)`` lane-major ray tiles, ``org`` planned
    windows, ``vols`` the tuple of x-phase HBM volume copies,
    ``tfl (TF_SIZE, 8)`` premultiplied TF (cols 0..3).
    Output ``(T, 8, R)``: rows 0..3 premultiplied RGBA, row 4 per-ray
    window-overflow count. Differentiable w.r.t. vols/tfl.
    ``flush``: static (fz, fy) backward RMW box (None = full
    accumulator); undersized boxes are detected via the dTF cotangent's
    padding cell [0, 7] (clipped-row count, zero when sized right).
    ``slab=True`` is volume-sharded Z-slab mode: the march z-remaps by
    ``scal[0, 5]``, each ray's opacity accumulator seeds from the
    CH_ACC0 tile channel, and the backward additionally returns the
    seed's cotangent through ``rays_t`` (its other channels stay zero)
    — the hook the cross-slab transmittance scan differentiates through.
    ``need_dtf=False`` (static) skips the backward's per-band dTF
    one-hot scatter entirely and returns a zero TF cotangent — for
    density-only training (``fit(train_tf=False)``), where the TF
    gradient would be zeroed by the optimizer anyway; the dTF matmul is
    ~21 ms of the 256^3/1024^2 headline step. Plan-validation counters
    (flush-lost pad cell [0,7], xbox pad cell [1,7]) still flow.
    """
    return _pallas_fwd(
        scal, org, rays_t, vols, tfl,
        dims=dims, ray_step=ray_step, window=window, fast=fast,
        shade=shade, slab=slab, phong=phong, no_ert=no_ert)


def _sv_limit_bytes() -> int:
    """HBM budget for the forward's streamed sample values (sv). Above
    this the backward falls back to replaying the gather matmuls (the
    512^3/2048^2 config's sv would be ~10 GB)."""
    return int(os.environ.get("VOLRT_SV_LIMIT_MB", "4096")) * (1 << 20)


def _use_sv(t, ngr, shade, phong=False) -> bool:
    n = 1 + int(shade) + 3 * int(phong)
    return t * ngr * G * R * 4 * n <= _sv_limit_bytes()


def _fwd_rule(scal, org, rays_t, vols, tfl, dims, ray_step, window,
              fast=False, shade=False, flush=None, slab=False,
              phong=False, no_ert=False, need_dtf=True,
              need_dvol=True):
    if phong and (shade or slab):
        raise NotImplementedError(
            "phong composes with neither the diffuse tap nor slab mode")
    save_sv = _use_sv(rays_t.shape[0], org.shape[1], shade, phong)
    outs = _pallas_fwd(
        scal, org, rays_t, vols, tfl,
        dims=dims, ray_step=ray_step, window=window, fast=fast,
        shade=shade, slab=slab, phong=phong, save_sv=save_sv,
        no_ert=no_ert)
    out, svs = (outs[0], tuple(outs[1:])) if save_sv else (outs, ())
    return out, (scal, org, rays_t, vols, tfl, out, svs)


def _bwd_rule(dims, ray_step, window, fast, shade, flush, slab, phong,
              no_ert, need_dtf, need_dvol, res, g):
    scal, org, rays_t, vols, tfl, out, svs = res
    dvs, dtf, dacc = _pallas_bwd(
        scal, org, rays_t, vols, tfl, _pack_gG(g, out),
        dims=dims, ray_step=ray_step, window=window, fast=fast,
        shade=shade, flush=flush,
        sv=svs[0] if svs else None,
        sv2=svs[1] if (shade and len(svs) > 1) else None,
        sv_g=(svs[1:4] if (phong and len(svs) > 3) else None),
        slab=slab, phong=phong, no_ert=no_ert, need_dtf=need_dtf,
        need_dvol=need_dvol)
    drays = jnp.zeros_like(rays_t)
    if slab:
        drays = drays.at[:, CH_ACC0, :].set(dacc[:, 0, :])
    return (jnp.zeros_like(scal), jnp.zeros_like(org),
            drays, tuple(dvs), dtf)


render_tiles_v3.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Scene-level API
# ---------------------------------------------------------------------------


def _phase_volumes(density, wx, storage=None):
    """Pad the density grid and build the x-phase copies: copy p is the
    volume shifted left by ``p * wx//2`` voxels, so every
    (wx//2)-aligned window origin is 128-aligned in one copy.

    ``storage`` (e.g. ``jnp.bfloat16`` under ``fast=True``) sets the HBM
    dtype of the copies — and therefore the brick DMA width. fast mode's
    MXU passes truncate volume operands to bf16 regardless, so bf16
    storage is numerically identical there while halving DMA traffic
    (the analog of the reference's 8-bit 3D textures,
    GPURenderer4.cu:115-143). Autodiff casts gradients back to f32."""
    if storage is not None:
        density = density.astype(storage)
    d, h, w = density.shape
    shift = wx // 2
    dp = -(-d // 8) * 8
    hp = -(-h // 8) * 8
    # DMA fetches are always a full 128 lanes (Mosaic slice-width
    # constraint), so copies carry a 128-XW tail beyond the last window
    # origin even when the compute window wx is narrower.
    xp = max(128, -(-w // shift) * shift + (128 - wx))
    pad = jnp.pad(density, ((0, dp - d), (0, hp - h), (0, xp - w)))
    if xp <= wx:
        return (pad,)
    n_ph = 128 // shift
    vols = [pad]
    for p in range(1, n_ph):
        s = shift * p
        vols.append(
            jnp.pad(pad[:, :, s:], ((0, 0), (0, 0), (0, s))))
    return tuple(vols)


def render_image_v3(scene, view, ray_threshold=0.95,
                    window=None, fast=False, esl=False,
                    light_kd=0.0, shaded=False, flush=None,
                    phong=False, plan=None, need_dtf=True,
                    need_dvol=True):
    """Differentiable render -> ``f32[H, W, 4]`` via the v3 kernels.

    Semantics match diff.render.render_diff_image (including ``esl``,
    the ``shaded`` diffuse light tap, and gradient Blinn-Phong via
    ``phong=True``); gradients flow to ``scene.density`` and
    ``scene.tf_base``. ``plan``: a precomputed :class:`ViewPlan`.
    """
    return render_image_v3_with_ovf(
        scene, view, ray_threshold, window, fast, esl,
        light_kd, shaded, flush, phong, plan, need_dtf, need_dvol)[0]


def render_image_v3_with_ovf(scene, view, ray_threshold=0.95,
                             window=None, fast=False, esl=False,
                             light_kd=0.0, shaded=False, flush=None,
                             phong=False, plan=None, need_dtf=True,
                             need_dvol=True):
    """As render_image_v3 but also returns the total overflow count."""
    esl_grid = None
    if esl:
        # Plan-time empty-group compaction (see plan_windows): replaces
        # round 2's per-ray XLA leading-leap loop, which cost more than
        # the march it saved (BASELINE.md round-2 ESL accounting).
        from volrt.diff.render import scene_empty_grid

        empty, block, _ = scene_empty_grid(scene)
        esl_grid = (empty, block)
    premult = jnp.concatenate(
        [scene.tf_base[:, :3] * scene.tf_base[:, 3:4],
         scene.tf_base[:, 3:4]], axis=-1)
    return render_view_v3(
        scene.density, premult, scene.ray_step, view,
        ray_threshold=ray_threshold, window=window, fast=fast,
        esl_grid=esl_grid, light_kd=light_kd, shaded=shaded, flush=flush,
        phong=phong, plan=plan, need_dtf=need_dtf, need_dvol=need_dvol)


def loss_grads_v3_chunked(scene, view, target, n_chunks,
                          ray_threshold=0.95, window=None, fast=False,
                          flush=None, light_kd=0.0, shaded=False,
                          phong=False, plan=None, esl=False,
                          need_dtf=True, need_dvol=True):
    """Full-image MSE loss + scene gradients, accumulated over ray-tile
    chunks -> ``(loss, grads)`` (grads a DiffScene-shaped pytree).

    Mathematically identical to
    ``value_and_grad(lambda s: mean((render_image_v3(s, view, ...) -
    target) ** 2))`` — the loss is additive over tiles, so per-chunk
    gradients sum exactly — but each chunk's forward+backward completes
    before the next starts (``lax.fori_loop``), so only one chunk's
    streamed sample values (sv) are resident at a time. This lets
    configs whose full-image sv exceeds the HBM budget (512^3 / 2048^2:
    ~14 GB) still use the no-replay backward: 8 chunks of ~1.8 GB each.
    Jit-compatible; ``n_chunks`` must be static. ``esl=True`` re-derives
    plan-time empty-group compaction from the live scene TF each step
    (mutually exclusive with ``plan``, which would embed a stale set).
    """
    if plan is not None and esl:
        raise ValueError(
            "plan embeds a fixed empty set; use esl=True without a plan")
    d, h, w = scene.density.shape
    dims = (w, h, d)
    wv, hv = view.dims
    window = _view_window(dims, view, window, shaded, phong)
    wp, hp = layout.pad_dims(wv, hv, TILE, TILE)
    tgt = jnp.asarray(target, jnp.float32)
    tgt = jnp.pad(tgt, ((0, hp - hv), (0, wp - wv), (0, 0)))
    tgt_t = layout.tile_rays(tgt, wv, hv, tile_w=TILE, tile_h=TILE)
    t_total = tgt_t.shape[0]
    tc = -(-t_total // n_chunks)
    t_pad = tc * n_chunks - t_total
    if t_pad:
        # Dead padding tiles render zero against a zero target.
        tgt_t = jnp.pad(tgt_t, ((0, t_pad), (0, 0), (0, 0)))
    denom = float(hv) * float(wv) * 4.0
    fl = None if flush is None else tuple(flush)
    no_ert = (isinstance(ray_threshold, (int, float))
              and ray_threshold >= 1.0)

    def chunk_loss(sc, tgt_t, t0):
        premult = jnp.concatenate(
            [sc.tf_base[:, :3] * sc.tf_base[:, 3:4],
             sc.tf_base[:, 3:4]], axis=-1)
        tfl = jnp.pad(premult, ((0, 0), (0, 4)))
        vols = _phase_volumes(
            sc.density, window[2],
            storage=jnp.bfloat16 if fast else None)
        if plan is None:
            tiles = layout.prepare_ray_tiles_raw(
                view, sc.ray_step, None, tile_w=TILE, tile_h=TILE)
            if t_pad:
                tiles = jnp.pad(tiles, ((0, t_pad), (0, 0), (0, 0)))
            tiles_c = jax.lax.dynamic_slice_in_dim(tiles, t0, tc, 0)
            rays_t = jnp.swapaxes(tiles_c, 1, 2)
            bz, by = _brick_shape(vols[0].shape, window[0], window[1],
                                  window[3:5])
            empty = esl_block = None
            if esl:
                from volrt.diff.render import scene_empty_grid

                empty, esl_block, _ = scene_empty_grid(sc)
            org = plan_windows(
                tiles_c, dims, vols[0].shape, sc.ray_step, window[0],
                window[1], bz, by, wx=window[2], view_dims=view.dims,
                empty=empty, esl_block=esl_block)
        else:
            # Precomputed full-image ViewPlan: slice the chunk's rows.
            # Padding tiles are all-zero (F_NG = 0 -> the kernel's group
            # loop never runs; alive0 = 0 -> dead rays).
            org_f, rays_f = plan.org, plan.rays_t
            if t_pad:
                org_f = jnp.pad(org_f, ((0, t_pad), (0, 0), (0, 0)))
                rays_f = jnp.pad(rays_f, ((0, t_pad), (0, 0), (0, 0)))
            org = jax.lax.dynamic_slice_in_dim(org_f, t0, tc, 0)
            rays_t = jax.lax.dynamic_slice_in_dim(rays_f, t0, tc, 0)
        lp = view.light_pos.astype(jnp.float32).reshape(3)
        scal = jnp.concatenate([
            jnp.asarray(ray_threshold, jnp.float32).reshape(1),
            jnp.asarray(light_kd, jnp.float32).reshape(1),
            lp, jnp.zeros(3, jnp.float32)]).reshape(1, 8)
        out = render_tiles_v3(
            scal, org, rays_t, vols, tfl, dims, sc.ray_step, window,
            fast, bool(shaded), fl, False, bool(phong), no_ert,
            bool(need_dtf), bool(need_dvol))
        tgt_c = jax.lax.dynamic_slice_in_dim(tgt_t, t0, tc, 0)
        diff = out[:, :4, :] - jnp.swapaxes(tgt_c, 1, 2)
        return jnp.sum(diff * diff) / denom

    vag = jax.value_and_grad(chunk_loss)

    def body(i, carry):
        loss, grads = carry
        li, gi = vag(scene, tgt_t, i * tc)
        return loss + li, jax.tree.map(jnp.add, grads, gi)

    init = (jnp.float32(0.0), jax.tree.map(jnp.zeros_like, scene))
    return jax.lax.fori_loop(0, n_chunks, body, init)


def _view_window(dims, view, window, shaded, phong):
    """Resolve the static window for a view (shared by the render path
    and :func:`prepare_view_plan` — they must agree exactly)."""
    if window is None:
        window = default_window(dims, view.dims, view.perspective)
        if shaded or phong:
            # The light tap samples SHADE_LIGHT_OFFSET world units away
            # (and the Phong gradient taps +-1 voxel): widen the window
            # accordingly (clamped to the padded volume).
            off = (int(0.01 * 0.5 * max(dims)) + 2) if shaded else 2
            window = (
                min(window[0] + off, -(-dims[2] // 8) * 8),
                min(-(-(window[1] + off) // 8) * 8,
                    -(-dims[1] // 8) * 8),
                window[2])
    window = _norm_window(window)
    if len(window) == 5:
        # Gradient-scatter x box: OFF by default (hardware-measured
        # regression at wx=64 — 250.3 vs 243.5 ms on the headline: the
        # scratch store/load round-trip costs more than the dense
        # (wx, R) weight build it replaces once wx is 64). Opt in by
        # passing a 6-element window whose last entry is the box width
        # (e.g. from _xbox_width); validate with
        # planned_window_ovf(xbox=True) or the dTF pad cell [1, 7].
        window = window + (0,)
    return window


def _padded_vshape(density_shape, wx):
    """Shape of the x-phase HBM copies without materializing them
    (mirrors :func:`_phase_volumes`)."""
    d, h, w = density_shape
    shift = wx // 2
    return (-(-d // 8) * 8, -(-h // 8) * 8,
            max(128, -(-w // shift) * shift + (128 - wx)))


class ViewPlan(NamedTuple):
    """Precomputed per-view render plan: the planned window-origin table
    and the lane-major ray tiles. Both depend only on (view geometry,
    ray_step, window, ESL grid) — NOT on the density values or TF — so a
    fixed-camera training loop computes each view's plan once and reuses
    it every step (the TPU analog of the reference's per-frame
    ``RaycasterBase::set_view`` snapshot, VolR.cpp:107, amortized). The
    per-call XLA plan prologue is ~10-14 ms at 1024^2, i.e. ~5% of a
    fwd+bwd step. Pass the SAME window/ray_step to the render call."""
    org: jax.Array     # (T, NG, ORG_C) int32
    rays_t: jax.Array  # (T, C, R) float32


def prepare_view_plan(density_shape, view, ray_step, window=None,
                      shaded=False, phong=False, esl_grid=None,
                      esl_fn=None):
    """Build a reusable :class:`ViewPlan` for ``render_view_v3`` /
    ``render_image_v3`` / the fused scene API. With ``esl_grid`` the
    plan embeds empty-group compaction, so it must be re-prepared when
    the TF's empty set changes (see ``plan_windows``)."""
    d, h, w = density_shape
    dims = (w, h, d)
    window = _view_window(dims, view, window, shaded, phong)
    tiles = layout.prepare_ray_tiles_raw(
        view, ray_step, esl_fn, tile_w=TILE, tile_h=TILE)
    vshape = _padded_vshape(density_shape, window[2])
    bz, by = _brick_shape(vshape, window[0], window[1], window[3:5])
    org = plan_windows(
        tiles, dims, vshape, ray_step, window[0], window[1],
        bz, by, wx=window[2], view_dims=view.dims,
        empty=esl_grid[0] if esl_grid is not None else None,
        esl_block=esl_grid[1] if esl_grid is not None else None)
    return ViewPlan(org, jnp.swapaxes(tiles, 1, 2))


def render_view_v3(density, premult_tf, ray_step, view,
                   ray_threshold=0.95, window=None, fast=False,
                   esl_fn=None, light_kd=0.0, shaded=False,
                   phong=False, flush=None, esl_grid=None, _vjp=True,
                   plan=None, need_dtf=True, need_dvol=True,
                   stats=False):
    """Premult-level v3 render -> (f32[H, W, 4], overflow count).

    ``density`` is the float grid (D, H, W); ``premult_tf`` the
    premultiplied RGBA LUT (TF_SIZE, 4). Used by the scene-level diff API
    and the forward renderer-ladder rung (which has a uint8 Raycaster
    instead of a DiffScene). Differentiable w.r.t. density/premult_tf.
    ``esl_grid=(empty_bool_grid, block_voxels)`` enables plan-time
    empty-group compaction (see :func:`plan_windows`); ``esl_fn`` is the
    legacy per-ray leading-leap hook (still honored; both may combine).
    ``plan``: a :class:`ViewPlan` from :func:`prepare_view_plan` (same
    window/ray_step/esl settings) — skips the per-call plan prologue.
    """
    d, h, w = density.shape
    dims = (w, h, d)
    wv, hv = view.dims
    window = _view_window(dims, view, window, shaded, phong)
    lp = view.light_pos.astype(jnp.float32).reshape(3)
    scal = jnp.concatenate([
        jnp.asarray(ray_threshold, jnp.float32).reshape(1),
        jnp.asarray(light_kd, jnp.float32).reshape(1),
        lp, jnp.zeros(3, jnp.float32)]).reshape(1, 8)
    # Static no-ERT fast path: a concrete threshold >= 1 can never be
    # crossed (acca <= 1), so the kernels skip the per-group early-exit
    # sync and gate chains. Only derivable when the threshold is a
    # trace-time constant (the bench/training configs pass floats).
    no_ert = (isinstance(ray_threshold, (int, float))
              and ray_threshold >= 1.0)

    # Phase copies participate in autodiff: the vjp returns per-phase
    # cotangents that recombine through these XLA ops automatically.
    vols = _phase_volumes(
        density, window[2],
        storage=jnp.bfloat16 if fast else None)
    if plan is None:
        tiles = layout.prepare_ray_tiles_raw(
            view, ray_step, esl_fn, tile_w=TILE, tile_h=TILE)
        rays_t = jnp.swapaxes(tiles, 1, 2)  # (T, C, R)
        bz, by = _brick_shape(vols[0].shape, window[0], window[1],
                              window[3:5])
        org = plan_windows(
            tiles, dims, vols[0].shape, ray_step, window[0], window[1],
            bz, by, wx=window[2], view_dims=view.dims,
            empty=esl_grid[0] if esl_grid is not None else None,
            esl_block=esl_grid[1] if esl_grid is not None else None)
    else:
        org, rays_t = plan.org, plan.rays_t
    tfl = jnp.pad(premult_tf, ((0, 0), (0, 4)))

    if _vjp:
        out = render_tiles_v3(
            scal, org, rays_t, vols, tfl, dims, ray_step,
            window, fast, bool(shaded) and not phong,
            None if flush is None else tuple(flush), False, bool(phong),
            no_ert, bool(need_dtf), bool(need_dvol))
    else:
        # Forward-only rung path (renderer id 5): skip the custom_vjp
        # wrapper entirely. Identical primal; avoids tracing the vjp'd
        # callable under the rung's outer jit with multiple static
        # configurations (JAX 0.9 CPU executable-lookup bug).
        out = _pallas_fwd(
            scal, org, rays_t, vols, tfl, dims=dims, ray_step=ray_step,
            window=window, fast=fast,
            shade=bool(shaded) and not phong, phong=bool(phong),
            no_ert=no_ert)
    colors = jnp.swapaxes(out[:, :4, :], 1, 2)    # (T, R, 4)
    img = layout.untile_rays(colors, wv, hv, tile_w=TILE, tile_h=TILE)
    if stats:
        # Row 5 is lane-uniform per tile: executed march bands (the
        # measured-MFU work counter — see _fwd_kernel).
        return img, jnp.sum(out[:, 4, :]), jnp.sum(out[:, 5, 0])
    return img, jnp.sum(out[:, 4, :])

# ---------------------------------------------------------------------------
# Z-slab segment rendering (volume-sharded mode's per-device march)
# ---------------------------------------------------------------------------


def render_slab_v3(slab_density, premult_tf, ray_step, view,
                   z_start, full_d, ray_threshold=0.95, acc0=None,
                   window=None, fast=False, esl_grid=None,
                   halo=1, shaded=False, light_kd=0.0):
    """March one Z-slab's global-lattice samples through the v3 forward
    kernel -> ``(f32[H, W, 4], overflow)``.

    ``slab_density (sd + 2*halo, H, W)`` covers global z voxels
    ``[z_start - halo, z_start + sd + halo - 1]`` (``halo=1`` covers
    trilinear taps; ``shaded=True`` — the reference's one-tap diffuse,
    applied slab-locally with ``light_kd``/``view.light_pos`` — needs
    ``halo >= volrt.dist.volume_sharded.shading_halo(full_d,
    "diffuse")`` so the light tap resolves in-slab);
    ``z_start`` may be traced (shard_map axis index). ``acc0 (H, W)``
    seeds each ray's accumulated opacity (the cross-slab ERT /
    transmittance-prescaling input); the returned alpha channel includes
    it (subtract for the segment delta). Samples lie on the ray's global
    lattice ``knear + i*step``, so slab segments compose exactly to the
    unsharded march. Differentiable w.r.t. ``slab_density``,
    ``premult_tf`` AND ``acc0`` (the analytic backward emits the seed's
    cotangent, so autodiff flows through the cross-slab opacity scan
    into upstream slabs). ``esl_grid=(empty_bool_grid, block_voxels)``
    (GLOBAL-volume blocks) enables plan-time empty-group compaction for
    the slab march too — the plan shifts slab-local footprints back to
    global z before the block test.
    """
    sdl, h, w = slab_density.shape
    sd = sdl - 2 * halo
    dims = (w, h, full_d)
    wv, hv = view.dims
    if window is None:
        window = default_window(
            (w, h, sdl), view.dims, view.perspective)
        if shaded:
            # Light-tap reach (see _view_window's shaded widening),
            # clamped to the padded slab extent.
            off = int(0.01 * 0.5 * max(dims)) + 2
            window = (
                min(window[0] + off, -(-sdl // 8) * 8),
                min(-(-(window[1] + off) // 8) * 8, -(-h // 8) * 8),
                window[2])
    window = _norm_window(window)
    if len(window) == 5:
        window = window + (0,)  # xbox opt-in only (see _view_window)

    origins, directions = _padded_rays(view)
    o = origins.reshape(-1, 3)
    dvec = directions.reshape(-1, 3)
    from volrt.core import rays as rays_mod

    knear, kfar, hit = rays_mod.intersect_aabb(o, dvec)
    hit = hit & _valid_mask(view)
    z_lo = -1.0 + 2.0 * z_start / full_d
    z_hi = -1.0 + 2.0 * (z_start + sd) / full_d
    oz = o[:, 2]
    dz = jnp.where(dvec[:, 2] == 0.0, 1e-5, dvec[:, 2])
    ka = (z_lo - oz) / dz
    kb = (z_hi - oz) / dz
    k_in = jnp.maximum(jnp.minimum(ka, kb), knear)
    k_out = jnp.minimum(jnp.maximum(ka, kb), kfar)
    j0g = jnp.ceil(jnp.maximum(k_in - knear, 0.0) / ray_step)
    k0 = knear + j0g * ray_step
    alive = hit & (k0 <= k_out)
    a0 = (jnp.zeros_like(k0) if acc0 is None
          else _pad_image_scalar(acc0, view).reshape(-1))

    tiles = _pack_tiles(o, dvec, k0, k_out, alive, a0, view, ray_step)
    rays_t = jnp.swapaxes(tiles, 1, 2)
    z_off = jnp.float32(z_start - halo)
    lp = view.light_pos.astype(jnp.float32).reshape(3)
    scal = jnp.concatenate([
        jnp.asarray(ray_threshold, jnp.float32).reshape(1),
        jnp.asarray(light_kd, jnp.float32).reshape(1),
        lp, z_off.reshape(1), jnp.zeros(2, jnp.float32),
    ]).reshape(1, 8)

    vols = _phase_volumes(
        slab_density, window[2],
        storage=jnp.bfloat16 if fast else None)
    bz, by = _brick_shape(vols[0].shape, window[0], window[1],
                          window[3:5])
    org = plan_windows(
        tiles, dims, vols[0].shape, ray_step, window[0], window[1],
        bz, by, wx=window[2], view_dims=view.dims, z_off=z_off,
        empty=esl_grid[0] if esl_grid is not None else None,
        esl_block=esl_grid[1] if esl_grid is not None else None)
    tfl = jnp.pad(premult_tf, ((0, 0), (0, 4)))
    out = render_tiles_v3(
        scal, org, rays_t, vols, tfl, dims, ray_step, window,
        fast, bool(shaded), None, True)
    colors = jnp.swapaxes(out[:, :4, :], 1, 2)
    img = layout.untile_rays(colors, wv, hv, tile_w=TILE, tile_h=TILE)
    return img, jnp.sum(out[:, 4, :])


def _padded_rays(view):
    from volrt.core import rays as rays_mod

    w, h = view.dims
    wp, hp = layout.pad_dims(w, h, TILE, TILE)
    origins, directions = rays_mod.get_rays(view)
    pad = ((0, hp - h), (0, wp - w), (0, 0))
    return jnp.pad(origins, pad), jnp.pad(directions, pad)


def _valid_mask(view):
    w, h = view.dims
    wp, hp = layout.pad_dims(w, h, TILE, TILE)
    px = jnp.arange(wp)[None, :] < w
    py = jnp.arange(hp)[:, None] < h
    return (px & py).reshape(-1)


def _pad_image_scalar(img, view):
    w, h = view.dims
    wp, hp = layout.pad_dims(w, h, TILE, TILE)
    return jnp.pad(img, ((0, hp - h), (0, wp - w)))


def _pack_tiles(o, dvec, k0, kfar, alive, acc0, view, ray_step):
    """Pack per-ray channels (incl. the seeded opacity) into v3 tiles."""
    w, h = view.dims
    wp, hp = layout.pad_dims(w, h, TILE, TILE)
    packed = jnp.zeros((hp * wp, layout.N_CHANNELS), jnp.float32)
    packed = packed.at[:, layout.CH_OX:layout.CH_OZ + 1].set(o)
    packed = packed.at[:, layout.CH_DX:layout.CH_DZ + 1].set(dvec)
    packed = packed.at[:, layout.CH_K0].set(k0)
    packed = packed.at[:, layout.CH_KFAR].set(kfar)
    packed = packed.at[:, layout.CH_ALIVE].set(alive.astype(jnp.float32))
    packed = packed.at[:, CH_ACC0].set(acc0)
    tiles = layout.tile_rays(
        packed.reshape(hp, wp, layout.N_CHANNELS), w, h, TILE, TILE)
    tk0 = tiles[..., layout.CH_K0]
    talive = tiles[..., layout.CH_ALIVE] > 0.0
    kbase = jnp.min(
        jnp.where(talive, tk0, jnp.inf), axis=1, keepdims=True)
    kbase = jnp.where(jnp.isfinite(kbase), kbase, 0.0)
    j0 = jnp.where(talive, jnp.ceil((tk0 - kbase) / ray_step), 0.0)
    return tiles.at[..., layout.CH_J0].set(j0)


def planned_window_ovf(density_shape, view, ray_step, window,
                       esl_grid=None, xbox=False):
    """Exact plan-time count of base-tap window overflows for a pose.

    Replays the kernel's per-band window arithmetic (origin line,
    fixed-point slope, brick clamp) in pure XLA against the exact ray
    footprints and counts taps the static ``window`` would zero — the
    same events the kernel's overflow output counts (ERT-ungated, so
    >= the kernel's count), available WITHOUT compiling or running a
    kernel. This is the measured replacement for
    guessing window sizes from a divergence model: a zero here proves
    the window exact for this (volume, pose, ray_step).

    Counts the trilinear base taps (shaded/phong renders widen the
    window by their tap offsets before calling this — see
    render_view_v3 — so a zero on the widened window stays valid for
    the gated light/gradient taps, whose contributions vanish exactly
    where the base sample is TF-empty).
    """
    d, h, w = density_shape
    dims = (w, h, d)
    win = _norm_window(window)
    wz, wy, wx = win[:3]
    xbw_replay = (win[5] if len(win) > 5
                  else _xbox_width(dims, view.dims, view.perspective, wx))
    shift = wx // 2
    vshape = (-(-d // 8) * 8, -(-h // 8) * 8,
              max(128, -(-w // shift) * shift + (128 - wx)))
    tiles = layout.prepare_ray_tiles_raw(
        view, ray_step, None, tile_w=TILE, tile_h=TILE)
    bz, by = _brick_shape(vshape, wz, wy, win[3:5])
    org = plan_windows(
        tiles, dims, vshape, ray_step, wz, wy, bz, by, wx=wx,
        view_dims=view.dims,
        empty=esl_grid[0] if esl_grid is not None else None,
        esl_block=esl_grid[1] if esl_grid is not None else None)
    ng = org.shape[1]
    ox, oy, oz = tiles[..., 0], tiles[..., 1], tiles[..., 2]
    dx, dy, dz = tiles[..., 3], tiles[..., 4], tiles[..., 5]
    k0, kfar = tiles[..., 6], tiles[..., 7]
    alive = tiles[..., 8] > 0.0
    j0 = tiles[..., 9]
    ngl = org[:, 0, F_NG]

    def band_count(bg):
        B, g = bg // G, bg % G
        o_t = org[:, B, :]                      # (T, ORG_C)
        live = B < ngl                          # (T,)
        bzo = o_t[:, F_BZO]
        byo = o_t[:, F_BYO]
        z0g = jnp.clip(
            o_t[:, F_Z0] + ((o_t[:, F_DZ] * g) >> SLOPE_BITS),
            bzo, bzo + bz - wz)
        y0g = jnp.clip(
            (o_t[:, F_Y0] + ((o_t[:, F_DY] * g) >> SLOPE_BITS)) & ~7,
            byo, byo + by - wy) & ~7
        b = (o_t[:, F_B0] + g).astype(jnp.float32)[:, None]
        kk = k0 + (b - j0) * ray_step
        m = alive & (b >= j0) & (kk <= kfar) & live[:, None]
        tx = jnp.clip((ox + dx * kk + 1.0) * (0.5 * w) - 0.5, 0.0, w - 1.0)
        ty = jnp.clip((oy + dy * kk + 1.0) * (0.5 * h) - 0.5, 0.0, h - 1.0)
        tz = jnp.clip((oz + dz * kk + 1.0) * (0.5 * d) - 0.5, 0.0, d - 1.0)
        lz = tz - z0g[:, None].astype(jnp.float32)
        ly = ty - y0g[:, None].astype(jnp.float32)
        lx = tx - o_t[:, F_XO, None].astype(jnp.float32)
        ovf = ((lz < 0.0) | (lz > wz - 1.0) | (ly < 0.0)
               | (ly > wy - 1.0) | (lx < 0.0) | (lx > wx - 1.0))
        if xbox and xbw_replay:
            # Replay the backward's gradient-scatter x box (see
            # _bwd_kernel use_xbox / the dTF pad cell [1, 7]): a miss
            # drops that sample's density-gradient contribution.
            x0b = o_t[:, F_X0L] + ((o_t[:, F_DXL] * g) >> SLOPE_BITS)
            x0loc = jnp.clip(
                x0b - o_t[:, F_XO], 0, wx - xbw_replay) & ~7
            lxl = lx - x0loc[:, None].astype(jnp.float32)
            ovf = ovf | (lxl < 0.0) | (lxl > xbw_replay - 1.0)
        return jnp.sum(jnp.where(ovf & m, 1, 0))

    counts = jax.lax.map(band_count, jnp.arange(ng * G))
    return jnp.sum(counts)


# Candidate (wz, wy) ladder for auto_window, tightest first. Each shape
# is a separate kernel compile (cached across calls), so the ladder is
# deliberately short.
AUTO_WINDOW_LADDER = (
    (4, 16, 64), (6, 16, 64),
    (6, 16, 128), (8, 16, 128), (12, 16, 128), (16, 16, 128),
    (16, 24, 128), (24, 32, 128), (32, 40, 128), (48, 56, 128),
)


def auto_window(density_shape, view, ray_step, esl_grid=None,
                ladder=AUTO_WINDOW_LADDER, shaded=False, phong=False):
    """Pick the tightest overflow-free static window for a pose.

    Walks ``ladder`` through :func:`planned_window_ovf` (pure XLA — no
    kernel compiles) and returns the first window whose planned overflow
    is zero, falling back to :func:`default_window`'s conservative
    derivation. Call once per pose at setup (host sync per candidate);
    the returned tuple is a static kernel parameter, so renders at a
    given window shape share one compiled kernel.

    ``shaded``/``phong``: widen the picked base-tap window by the
    light-tap offset (``SHADE_LIGHT_OFFSET`` world units in voxels)
    resp. the +-1-voxel gradient taps, the same margins
    :func:`_view_window` applies to the defaults — so shaded renders
    can use pose-tuned windows too (hardware job j033: the tuned
    (8, 24, 64) shaded window renders image-identical to the default
    ~(20, 32, 128) at 2.5-3x the speed at 256^3/1024^2).

    Replaces the fudge-factor divergence model as the way to tune
    windows: the plan replay is exact for the actual ray bundle, where
    default_window must bound all poses at once.
    """
    d, h, w = density_shape
    # The ESL block edge is a static plan parameter (it sizes the SAT
    # box arithmetic); concretize it outside the jit.
    empty = esl_grid[0] if esl_grid is not None else None
    blk = int(esl_grid[1]) if esl_grid is not None else None

    def _check(window, empty_g):
        return planned_window_ovf(
            density_shape, view, ray_step, window,
            esl_grid=None if empty_g is None else (empty_g, blk))

    check = jax.jit(_check, static_argnums=(0,))
    pd, ph = -(-d // 8) * 8, -(-h // 8) * 8
    off = 0
    if shaded:
        off = int(0.01 * 0.5 * max(w, h, d)) + 2
    elif phong:
        off = 2

    def widen(win):
        if not off:
            return _norm_window(win)
        return _norm_window((
            min(win[0] + off, pd),
            min(-(-(win[1] + off) // 8) * 8, ph),
            win[2]))

    seen = set()
    for cand in ladder:
        # Windows cannot exceed the (padded) volume extents — the brick
        # must contain them (same clamp as default_window).
        cand = (min(cand[0], pd), min(cand[1], ph), cand[2])
        if cand in seen:
            continue
        seen.add(cand)
        if int(check(cand, empty)) == 0:
            return widen(cand)
    return widen(default_window((w, h, d), view.dims, view.perspective))


def planned_flush_lost(scene, view, flush, window=None,
                       shaded=False, phong=False):
    """Plan-time coverage check for a pose-tuned backward ``flush`` box.

    Returns the number of written gradient-accumulator rows the static
    ``(fz, fy)`` flush box would fail to cover over the whole render —
    the same counter the backward surfaces through the dTF padding cell
    [0, 7], but computed without compiling or running a kernel (pure-XLA
    ``plan_windows`` + ``plan_sessions``), so callers can validate a
    tuned flush shape once at setup instead of discovering truncated
    density gradients after a training run. Zero means the flush box is
    safe for this (scene, view, window) combination; nonzero gradients
    WILL silently drop rows (autodiff strips the dTF padding columns, so
    the in-band counter never reaches ``scene`` gradients).

    The plan ignores ESL leading-leaps (they only shrink written
    extents), so a zero here is conservative for ``esl=True`` renders.
    """
    if flush is None:
        return jnp.zeros((), jnp.int32)
    d, h, w = scene.density.shape
    dims = (w, h, d)
    if window is None:
        window = default_window(dims, view.dims, view.perspective)
        if shaded or phong:
            off = (int(0.01 * 0.5 * max(dims)) + 2) if shaded else 2
            window = (
                min(window[0] + off, -(-dims[2] // 8) * 8),
                min(-(-(window[1] + off) // 8) * 8,
                    -(-dims[1] // 8) * 8),
                window[2])
    win = _norm_window(window)
    wz, wy, wx = win[:3]
    # Padded phase-volume shape without materializing the copies
    # (mirrors _phase_volumes).
    shift = wx // 2
    vshape = (-(-d // 8) * 8, -(-h // 8) * 8,
              max(128, -(-w // shift) * shift + (128 - wx)))
    tiles = layout.prepare_ray_tiles_raw(
        view, scene.ray_step, None, tile_w=TILE, tile_h=TILE)
    bz, by = _brick_shape(vshape, wz, wy, win[3:5])
    org = plan_windows(
        tiles, dims, vshape, scene.ray_step, wz, wy, bz, by, wx=wx,
        view_dims=view.dims)
    fz, fy = int(flush[0]), int(flush[1])
    _, lost_t = plan_sessions(org, vshape, wz, wy, fz, fy, wx,
                              bpad=win[3:5])
    return jnp.sum(lost_t)
