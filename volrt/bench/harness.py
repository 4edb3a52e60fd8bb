"""Scripted multi-configuration benchmark suite.

Rebuilds the reference benchmark mode (reference: VolR.cpp:225-321) on TPU:
the same sweep structure — datasets, optimization toggles (ERT/ESL), viewport
scales 0.9..0.3, ray-step factors 1.1..1.7 — across the renderer ladder, with
8 fixed camera poses per config (4 orientations x {ortho, perspective},
reference: VolR.cpp:233-248), a per-frame timeout analog, and avg/max/samples
CSV reports (reference: VolR.cpp:200-223). Adds derived rays/s and
rays*steps/s plus the differentiable fwd+bwd benchmark (no reference analog).
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from volrt.core.types import Raycaster, Volume, make_raycaster
from volrt.core.view import Camera
from volrt.utils.logger import get_logger
from volrt.utils.profiler import Profiler

MAX_BENCH_SAMPLE_MS = 7500.0  # reference: VolR.cpp:26

# 4 poses x {ortho, persp} (reference: VolR.cpp:233-248).
BENCH_ANGLES = [
    (0.0, 0.0, 0.0),
    (-90.0, 0.0, 0.0),
    (0.0, -90.0, 0.0),
    (45.0, 45.0, 0.0),
]


@dataclasses.dataclass
class BenchConfig:
    name: str
    volume_size: int = 64
    viewport: int = 256
    esl: bool = True
    ert: bool = True
    ray_step_factor: float = 1.0
    interpolation: str = "trilinear"
    light_kd: float = 0.6
    shading: str = "diffuse"  # "diffuse" (reference one-tap) | "phong"
    file: str | None = None  # PVM/RAW dataset (reference: VolR.cpp:255-268)


def synthetic_volume(n: int, seed: int = 0) -> np.ndarray:
    """Deterministic procedural volume: soft shell + central blob."""
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) / c
    shell = np.exp(-((r - 0.7) ** 2) / 0.02) * 200
    blob = np.exp(-(r ** 2) / 0.08) * 255
    rng = np.random.default_rng(seed)
    noise = rng.uniform(0, 20, size=(n, n, n))
    return np.clip(shell + blob + noise, 0, 255).astype(np.uint8)


def default_suite(small: bool = False,
                  files: list[str] | None = None) -> list[BenchConfig]:
    """The benchmark sweep, mirroring the reference's 24-config structure
    (reference: VolR.cpp:34-38,270-321) with synthetic datasets, plus any
    real PVM/RAW datasets passed in ``files`` (the reference loads seven
    named PVM files, VolR.cpp:255-268)."""
    import os

    cfgs: list[BenchConfig] = []
    for path in files or []:
        cfgs.append(BenchConfig(
            os.path.splitext(os.path.basename(path))[0], file=path))
    # Dataset sweep (reference configs 1-7: seven PVM datasets).
    sizes = [32, 64, 128] if small else [32, 64, 128, 256]
    for n in sizes:
        cfgs.append(BenchConfig(f"synthetic_{n}", volume_size=n))
    # Nearest-neighbor config so the constant-memory rung (pallas-nn, id 2)
    # is exercised by the default sweep.
    cfgs.append(BenchConfig(
        "nearest_64", volume_size=64, interpolation="nearest"))
    # Unshaded config: the flagship rung (pallas-v3, id 5) plus 3/4 with
    # the shade tap statically skippable.
    cfgs.append(BenchConfig(
        "noshade_128" if not small else "noshade_64",
        volume_size=64 if small else 128, light_kd=0.0))
    # BASELINE config 4: gradient Blinn-Phong + ESL (rung 5's phong path;
    # the reference's nearest analog is the diffuse tap every rung takes).
    cfgs.append(BenchConfig(
        "phong_esl_64" if small else "phong_esl_256",
        volume_size=64 if small else 256,
        viewport=256 if small else 512, shading="phong"))
    # Optimization toggles on one dataset (reference configs 8-10).
    base = 64 if small else 128
    cfgs.append(BenchConfig("no_optim", base, esl=False, ert=False))
    cfgs.append(BenchConfig("ert_only", base, esl=False, ert=True))
    cfgs.append(BenchConfig("ert_esl", base, esl=True, ert=True))
    # Viewport scale sweep (reference configs 11-17).
    for s in ([0.9, 0.5] if small else [0.9, 0.7, 0.5, 0.3]):
        cfgs.append(
            BenchConfig(f"viewport_{s}", base, viewport=int(512 * s))
        )
    # Ray-step factor sweep (reference configs 18-24).
    for f in ([1.1, 1.7] if small else [1.1, 1.3, 1.5, 1.7]):
        cfgs.append(BenchConfig(f"ray_step_{f}", base, ray_step_factor=f))
    return cfgs


def make_raycaster_for(cfg: BenchConfig, volume: Volume | None = None,
                       camera: Camera | None = None) -> Raycaster:
    from volrt.core.types import default_ray_step

    if volume is None:
        volume = Volume.from_numpy(synthetic_volume(cfg.volume_size))
    if camera is None:
        camera = Camera(dims=(cfg.viewport, cfg.viewport))
    step = default_ray_step(volume.dims) * cfg.ray_step_factor
    return make_raycaster(
        volume,
        view=camera.view(),
        ray_step=step,
        ray_threshold=0.95 if cfg.ert else 1.1,
        esl=cfg.esl,
        light_kd=cfg.light_kd,
        interpolation=cfg.interpolation,
        shading=cfg.shading,
    )


def renderer_fns(rc: Raycaster, renderers: list[int],
                 stats: bool = False, window=None):
    """(id, name, fn) for each requested ladder rung applicable to ``rc``.

    ``stats=True``: the windowed rungs (3/4/5) return their full
    ``(img, overflow, executed_bands)`` tuple (the in-kernel work
    counters feeding measured MFU) instead of the image alone.
    ``window``: static (wz, wy) override for rungs 3/4 — the harness's
    scoped-VMEM fallback ladder passes smaller windows here.
    """
    from volrt.renderers import get_renderer, renderer_name

    out = []
    for rid in renderers:
        mod = get_renderer(rid)
        if rid in (2,) and rc.interpolation != "nearest":
            continue
        if rid in (3, 4, 5) and rc.interpolation != "trilinear":
            continue
        if rid != 5 and rc.shading == "phong":
            continue  # gradient Blinn-Phong is a rung-5 capability
        if rid in (2, 3, 4, 5):
            kw = {}
            if window is not None and rid in (2, 3, 4):
                kw["window"] = tuple(window)
            if stats:
                fn = (lambda rc=rc, mod=mod, kw=kw:
                      mod.render_float_stats(rc, **kw))
            elif rid == 2:
                # rung 2's render_float returns the image alone
                fn = (lambda rc=rc, mod=mod, kw=kw:
                      mod.render_float(rc, **kw))
            else:
                fn = (lambda rc=rc, mod=mod, kw=kw:
                      mod.render_float(rc, **kw)[0])
        else:
            fn = lambda rc=rc, mod=mod: mod.render_float(rc)
        out.append((rid, renderer_name(rid), fn))
    return out


def _is_vmem_oom(msg: str) -> bool:
    """Deterministic Mosaic scoped-VMEM compile OOM (NOT a transient
    remote-compile failure — retrying the identical program cannot
    succeed; shrink the window or skip instead)."""
    m = msg.lower()
    return ("vmem" in m and ("out of memory" in m or "scoped" in m
                             or "exceeded" in m))


def _nominal_roofline(cfg: BenchConfig, rc: Raycaster, rid: int,
                      avg_ms: float) -> float | None:
    """Nominal roofline multiple for the windowed gather-matmul rungs
    (3/4/5): model FLOPs of a full march (every ray, ~2/ray_step steps,
    one (rows x x_width) one-hot MXU gather per sample) over chip peak.
    NOT a utilization — ERT/ESL prune real work below the nominal
    model, so values CAN exceed 1.0 on early-terminating scenes (the
    same nominal-step convention as the headline rays*steps/s metric);
    full-march configs (no_optim) read as true roofline distance.
    Measured MFU (executed-band counters) is reported separately.
    None for the non-windowed rungs (no matmul model applies)."""
    from volrt.utils import profiler as prof_mod

    if rid not in (3, 4, 5) or avg_ms <= 0.0:
        return None
    if rid == 5:
        from volrt.renderers.pallas.diff_v3 import (
            _norm_window, default_window)

        win = _norm_window(default_window(
            rc.volume.dims, rc.view.dims, bool(rc.view.perspective)))
        rows, x_width = win[0] * win[1], win[2]
    else:
        from volrt.renderers import get_renderer

        wz, wy = get_renderer(rid).default_window(rc)
        rows, x_width = wz * wy, 128
    n_rays = int(rc.view.dims[0]) * int(rc.view.dims[1])
    n_steps = int(2.0 / float(rc.ray_step))
    flops = prof_mod.windowed_kernel_flops(n_rays, n_steps, rows, x_width)
    u = prof_mod.mfu(avg_ms, flops, fast=False)
    return u if u > 0.0 else None


def run_suite(
    configs: list[BenchConfig] | None = None,
    renderers: list[int] = (0, 1, 2, 3, 4, 5),
    frames: int = 8,
    warmup: int = 1,
    profiler: Profiler | None = None,
    logger=None,
    trace_dir: str | None = None,
) -> Profiler:
    """Run the benchmark sweep; returns the filled profiler.

    Each (config, renderer) renders ``frames`` samples over the 8 reference
    camera poses; configs whose first frame exceeds the reference's 7.5 s
    timeout are skipped for that renderer (reference: VolR.cpp:237). The
    scalar golden rung (0) runs only on light configs — the reference's
    CPU-renderer skip for heavy configs (reference: VolR.cpp:228-230).
    ``trace_dir`` captures a ``jax.profiler`` trace of the timed frames
    (one directory per run; view with TensorBoard/XProf).
    """
    import contextlib

    log = (logger or get_logger()).log
    prof = profiler or Profiler()
    configs = configs if configs is not None else default_suite()

    for cfg in configs:
        if cfg.file:
            from volrt.io.pvm import load_volume

            data, _ = load_volume(cfg.file)
            volume = Volume.from_numpy(data)
        else:
            volume = Volume.from_numpy(synthetic_volume(cfg.volume_size))
        camera = Camera(dims=(cfg.viewport, cfg.viewport))
        poses = []
        for angles in BENCH_ANGLES:
            for persp in (False, True):
                camera.perspective = persp
                camera.toggle_perspective(update_mode=True)
                camera.set_camera_position(angles)
                poses.append(camera.view())

        for rid in renderers:
            if rid == 0 and (cfg.volume_size > 64 or cfg.viewport > 256
                             or cfg.file):
                # The vmapped per-ray golden rung is the CPURenderer
                # analog; the reference skips it on heavy configs
                # (reference: VolR.cpp:228-230).
                continue
            rc0 = make_raycaster_for(cfg, volume, camera)
            fns = renderer_fns(rc0, [rid], stats=True)
            if not fns:
                continue
            _, name, _ = fns[0]
            timed_out = False
            # Warm both projection modes: `perspective` is a static field,
            # so ortho and perspective poses compile separately. A
            # deterministic scoped-VMEM compile OOM falls back to a
            # smaller static window for the rung-3/4 kernels (overflow
            # counters flag the approximation); only genuinely transient
            # remote-compile failures (HTTP 500 without a VMEM cause)
            # retry the identical program.
            warm_err = None
            window_fb = None
            for attempt in range(4):
                try:
                    for wview in (poses[0], poses[1]):
                        result = renderer_fns(
                            rc0.replace(view=wview), [rid],
                            stats=True, window=window_fb,
                        )[0][2]()
                        img0 = (result[0] if isinstance(result, tuple)
                                else result)
                        jax.device_get(jnp.sum(img0))
                    warm_err = None
                    break
                except Exception as e:  # OOM / unsupported size
                    warm_err = e
                    msg = str(e)
                    if _is_vmem_oom(msg) and rid in (2, 3, 4):
                        from volrt.renderers import get_renderer

                        wz, wy = (window_fb or
                                  get_renderer(rid).default_window(rc0))
                        window_fb = (max(8, (wz // 2 + 7) & ~7),
                                     max(8, (wy // 2 + 7) & ~7))
                        log(f"bench {cfg.name}/{name}: scoped-VMEM OOM; "
                            f"falling back to window {window_fb}")
                        continue
                    if _is_vmem_oom(msg):
                        break  # deterministic: identical retry is futile
                    if "HTTP 500" in msg or "INTERNAL" in msg:
                        continue  # transient remote-compile failure
                    break
            if warm_err is not None:
                log(f"bench {cfg.name}/{name}: skipped ({warm_err})")
                continue
            if window_fb is not None:
                prof.note(cfg.name, name, window_fallback=1.0)
            # Build every pose's closure before the timed region so frame
            # timings measure device work, not Python dispatch setup.
            frame_rcs = [rc0.replace(view=poses[f % len(poses)])
                         for f in range(frames)]
            frame_fns = [
                renderer_fns(frc, [rid], stats=True,
                             window=window_fb)[0][2]
                for frc in frame_rcs
            ]
            trace_cm = (
                jax.profiler.trace(trace_dir) if trace_dir
                else contextlib.nullcontext()
            )
            flops_acc, flops_frames = 0.0, 0
            with trace_cm:
                for f, fn in enumerate(frame_fns):
                    prof.start(cfg.name, name)
                    try:
                        result = fn()
                        img0 = (result[0] if isinstance(result, tuple)
                                else result)
                        jax.device_get(jnp.sum(img0))
                    except Exception as e:
                        log(f"bench {cfg.name}/{name}: skipped ({e})")
                        timed_out = True
                        break
                    ms = prof.stop()
                    if isinstance(result, tuple) and len(result) == 3:
                        # Executed-band counter -> real FLOPs this frame
                        # (measured MFU; ESL/ERT pruning reflected).
                        from volrt.renderers import get_renderer

                        bands = float(jax.device_get(result[2]))
                        flops_acc += get_renderer(rid).bands_flops(
                            frame_rcs[f], bands, window_fb)
                        flops_frames += 1
                    if ms > MAX_BENCH_SAMPLE_MS:
                        timed_out = True
                        break
            if timed_out:
                continue
            avg_ms = prof.stats[cfg.name][name].avg_ms
            if flops_frames:
                from volrt.utils import profiler as prof_mod

                u = prof_mod.mfu(
                    avg_ms, flops_acc / flops_frames, fast=False)
                if u > 0.0:
                    prof.note(cfg.name, name, mfu=u)
            rx = _nominal_roofline(cfg, rc0, rid, avg_ms)
            if rx is not None:
                prof.note(cfg.name, name, roofline_x=rx)
        log(f"bench config {cfg.name} done")
    return prof


def run_diff_suite(
    configs: list[tuple[int, int]] | None = None,
    frames: int = 4,
    profiler: Profiler | None = None,
    logger=None,
    fused: bool = True,
) -> Profiler:
    """Differentiable fwd+bwd sweep in the reference CSV-report style
    (no reference analog — the reference has no backward): one row per
    (volume_size, viewport) config, each frame a full loss+grad step on
    the fused kernels, timed through the Profiler like the forward suite.
    """
    log = (logger or get_logger()).log
    prof = profiler or Profiler()
    if configs is None:
        configs = [(64, 256), (128, 512), (256, 1024)]
    name = "fused-v3" if fused else "xla-diff"
    for n, viewport in configs:
        cfg = f"diff_{n}_{viewport}"
        import functools

        from volrt.core.types import default_ray_step
        from volrt.core.tf import default_transfer_fn
        from volrt.diff.render import scene_from_volume

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(n)), default_transfer_fn(),
            default_ray_step((n, n, n)))
        cam = Camera(dims=(viewport, viewport))
        cam.zoom(-1.0)
        view = cam.view()
        target = jnp.zeros((viewport, viewport, 4), jnp.float32)

        variants = []
        if fused:
            from volrt.diff.fused import l2_loss_fused

            loss_fn = functools.partial(l2_loss_fused, fast=True)
            variants.append((name, jax.value_and_grad(loss_fn)))
            # One-launch L2 step (forward + cotangent + backward in a
            # single kernel; diff_v3.l2_loss_grads_v3_onepass) — the
            # round-5 production training path, as its own suite row.
            from volrt.renderers.pallas.diff_v3 import (
                l2_loss_grads_v3_onepass)

            variants.append((
                "fused-onepass",
                functools.partial(l2_loss_grads_v3_onepass, fast=True)))
        else:
            from volrt.diff.render import render_diff_image

            def loss_fn(s, v, t):
                return jnp.mean((render_diff_image(s, v) - t) ** 2)
            variants.append((name, jax.value_and_grad(loss_fn)))
        timed_out = False
        for vname, grad_fn in variants:
            if jax.default_backend() != "cpu":
                # The outer jit fuses the whole step on TPU; on CPU a
                # second differently-shaped outer-jit-of-grad-of-inner-
                # jit trace trips a JAX 0.9 executable-lookup bug
                # ("Execution supplied 8 buffers but compiled program
                # expected 15"), and the inner render jit already
                # carries the compute.
                grad_fn = jax.jit(grad_fn)
            try:
                loss, grads = grad_fn(scene, view, target)
                jax.device_get(jnp.sum(grads.density))
            except Exception as e:  # OOM / unsupported size
                log(f"bench {cfg}/{vname}: skipped ({e})")
                continue
            timed_out = False
            for _ in range(frames):
                prof.start(cfg, vname)
                loss, grads = grad_fn(scene, view, target)
                jax.device_get(jnp.sum(grads.density))
                ms = prof.stop()
                if ms > MAX_BENCH_SAMPLE_MS:
                    timed_out = True
                    break
        if fused and not timed_out:
            # Roofline column (SURVEY §5's Profiler-equivalent): model
            # FLOPs of the nominal fwd+bwd march over chip peak. Noted
            # as roofline_x, not mfu: ERT can prune real work below the
            # nominal model (bench.py's headline MFU disables ERT and
            # stays a true utilization).
            from volrt.renderers.pallas.diff_v3 import (
                _norm_window, default_window)
            from volrt.utils import profiler as prof_mod

            win = _norm_window(default_window(
                (n, n, n), view.dims, bool(view.perspective)))
            flops = prof_mod.windowed_kernel_flops(
                viewport * viewport, int(2.0 / float(scene.ray_step)),
                win[0] * win[1], win[2], backward=True)
            u = prof_mod.mfu(
                prof.stats[cfg][name].avg_ms, flops, fast=True)
            if u > 0.0:
                prof.note(cfg, name, roofline_x=u)
        log(f"bench config {cfg} done"
            + (" (timed out)" if timed_out else ""))
    return prof


def bench_diff_step(
    volume_size: int = 256,
    viewport: int = 1024,
    ray_step: float | None = None,
    iters: int = 10,
    fused: bool = True,
    window: tuple[int, int] | None = None,
    flush: tuple[int, int] | None = None,
    chunks: int | None = None,
    group_size: int | None = None,
    onepass: bool = False,
) -> dict:
    """Benchmark one differentiable forward+backward step (loss+grads) —
    the BASELINE.md headline metric: rays*steps/s for fwd+bwd.

    ``fused=True`` uses the fused Pallas forward/backward kernels (the TPU
    fast path); ``fused=False`` the XLA scan+remat reference path.
    ``onepass=True`` runs the whole L2 step as a SINGLE kernel launch
    (``diff_v3.l2_loss_grads_v3_onepass``): no streamed-sv HBM
    round-trip, no separate backward launch.
    """
    from volrt.core.types import default_ray_step
    from volrt.diff.render import scene_from_volume
    from volrt.train.fit import l2_loss

    if group_size is not None:
        from volrt.renderers.pallas.diff_v3 import set_group_size

        set_group_size(group_size)
    vol = synthetic_volume(volume_size)
    dims = (volume_size,) * 3
    if ray_step is None:
        ray_step = default_ray_step(dims)
    from volrt.core.tf import default_transfer_fn

    scene = scene_from_volume(
        jnp.asarray(vol), default_transfer_fn(), ray_step
    )
    # Honest accounting: zoom so the viewport covers exactly the volume cube
    # (every ray marches) and disable ERT (every ray takes the full
    # ~2/ray_step steps) — the reported rays*steps/s then counts real work.
    cam = Camera(dims=(viewport, viewport))
    cam.zoom(-1.0)  # distance 2.0 -> ortho view spans [-1, 1]
    view = cam.view()
    target = jnp.zeros((viewport, viewport, 4), jnp.float32)

    if fused and flush is not None:
        # Pose-tuned flush boxes silently truncate density gradients when
        # undersized (autodiff strips the dTF padding cell that carries
        # the in-band counter) — validate coverage once at plan time.
        from volrt.renderers.pallas.diff_v3 import planned_flush_lost

        lost = int(jax.jit(planned_flush_lost, static_argnums=(2, 3))(
            scene, view, tuple(flush),
            None if window is None else tuple(window)))
        if lost:
            raise ValueError(
                f"flush={flush} drops {lost} gradient rows for this "
                "config (planned_flush_lost > 0); enlarge the flush box")
    if fused and window is not None:
        # Pose-tuned windows/brick pads silently corrupt samples when the
        # brick clamp pulls a window off its planned line (j210 caught a
        # bpad sweep point altering the loss): the plan replay proves
        # the static window exact for this (volume, pose, ray_step).
        from volrt.renderers.pallas.diff_v3 import planned_window_ovf

        povf = int(planned_window_ovf(
            scene.density.shape, view, float(ray_step), tuple(window)))
        if povf:
            raise ValueError(
                f"window={window} drops {povf} planned taps for this "
                "config (planned_window_ovf > 0); widen the window or "
                "brick pads")

    if fused:
        import functools

        from volrt.diff.fused import render_image_fused
        from volrt.renderers.pallas.diff_v3 import prepare_view_plan

        # Plan-once/render-many: the window-origin plan depends only on
        # view geometry, so a fixed-camera training loop prepares each
        # view's plan once (diff_v3.ViewPlan) and reuses it every step —
        # the timed step below is the steady-state production step.
        plan = jax.jit(
            prepare_view_plan, static_argnums=(0, 2, 3))(
                scene.density.shape, view, float(scene.ray_step),
                None if window is None else tuple(window))

        # fast=True: native-bf16 MXU gathers (~CUDA 9-bit texture-lerp
        # quality) — the production training configuration. ERT disabled
        # (threshold 2.0) so the step count below reflects actual work.
        def loss_fn(scene, view, target, plan=None):
            img = render_image_fused(
                scene, view, ray_threshold=2.0, fast=True, window=window,
                flush=flush, plan=plan
            )
            return jnp.mean((img - target) ** 2)
    else:
        import functools
        plan = None

        def loss_fn(scene, view, target, plan=None):
            from volrt.diff.render import render_diff_image

            img = render_diff_image(scene, view, ray_threshold=2.0)
            return jnp.mean((img - target) ** 2)
    if chunks:
        # Chunked gradient accumulation: one chunk's streamed sv resident
        # at a time — lets 512^3/2048^2-scale configs use the no-replay
        # backward (see diff_v3.loss_grads_v3_chunked).
        from volrt.renderers.pallas.diff_v3 import loss_grads_v3_chunked

        grad_fn = jax.jit(lambda s, v, t, plan=None: loss_grads_v3_chunked(
            s, v, t, chunks, ray_threshold=2.0, fast=True,
            window=window, flush=flush, plan=plan))
        if not fused:
            plan = None
    elif fused and onepass:
        from volrt.renderers.pallas.diff_v3 import l2_loss_grads_v3_onepass

        grad_fn = jax.jit(
            lambda s, v, t, plan=None: l2_loss_grads_v3_onepass(
                s, v, t, ray_threshold=2.0, fast=True, window=window,
                flush=flush, plan=plan))
    else:
        grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def sync(x):
        # device_get of a dependent scalar: block_until_ready alone can
        # return before remote execution finishes on tunneled backends.
        return float(jax.device_get(jnp.sum(x)))

    loss, grads = grad_fn(scene, view, target, plan)
    sync(grads.density)
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = grad_fn(scene, view, target, plan)
    sync(grads.density)
    dt = (time.perf_counter() - t0) / iters

    n_rays = viewport * viewport
    n_steps = int(2.0 / ray_step)  # in-cube steps per ray (full march)
    out = {
        "ms": dt * 1e3,
        "rays_per_s": n_rays / dt,
        "ray_steps_per_s": n_rays * n_steps / dt,
        "loss": float(loss),
    }
    if fused:
        # MFU of the fwd+bwd step: model FLOPs = the windowed one-hot
        # gather matmul per sample (x3 for the backward's replay +
        # transposed dBrick matmul) vs chip bf16 peak (fast=True path).
        from volrt.renderers.pallas.diff_v3 import _view_window
        from volrt.utils import profiler as prof_mod

        win = _view_window(dims, view, window, False, False)
        flops = prof_mod.windowed_kernel_flops(
            n_rays, n_steps, win[0] * win[1], win[2], backward=True)
        out["model_flops"] = flops
        out["mfu"] = prof_mod.mfu(out["ms"], flops, fast=True)
    return out


def bench_fwd_step(
    volume_size: int = 256,
    viewport: int = 1024,
    ray_step: float | None = None,
    iters: int = 10,
    window: tuple[int, int] | None = None,
    shading: str | None = None,
    esl: bool = False,
    group_size: int | None = None,
) -> dict:
    """Benchmark one forward render through the v3 flagship kernel under
    the headline accounting (full-cube viewport, no ERT): rays*steps/s
    and MFU for the forward bound the fwd+bwd step is chasing.
    ``shading``: None (unshaded), "diffuse", or "phong" — the latter is
    BASELINE config 4 when combined with ``esl=True``."""
    from volrt.core.tf import default_transfer_fn
    from volrt.core.types import default_ray_step
    from volrt.diff.render import scene_from_volume
    from volrt.renderers.pallas.diff_v3 import (
        _view_window, prepare_view_plan, render_image_v3_with_ovf,
        set_group_size)
    from volrt.utils import profiler as prof_mod

    if group_size is not None:
        set_group_size(group_size)
    vol = synthetic_volume(volume_size)
    dims = (volume_size,) * 3
    if ray_step is None:
        ray_step = default_ray_step(dims)
    scene = scene_from_volume(
        jnp.asarray(vol), default_transfer_fn(), ray_step)
    cam = Camera(dims=(viewport, viewport))
    cam.zoom(-1.0)
    view = cam.view()
    shaded = shading == "diffuse"
    phong = shading == "phong"
    esl_grid = None
    if esl:
        from volrt.diff.render import scene_empty_grid

        empty, block, _ = scene_empty_grid(scene)
        esl_grid = (jax.device_get(empty), int(block))
    if esl_grid is None:
        plan = jax.jit(
            prepare_view_plan, static_argnums=(0, 2, 3, 4, 5))(
                scene.density.shape, view, float(ray_step),
                None if window is None else tuple(window), shaded, phong)
    else:
        # ESL plans embed the TF's empty-group compaction; the block
        # edge is a static plan parameter, so build unjitted (once).
        plan = prepare_view_plan(
            scene.density.shape, view, float(ray_step),
            None if window is None else tuple(window), shaded, phong,
            esl_grid)

    fn = jax.jit(lambda s: render_image_v3_with_ovf(
        s, view, ray_threshold=2.0, window=window, fast=True,
        light_kd=(0.6 if (shaded or phong) else 0.0),
        shaded=shaded, phong=phong, plan=plan))

    img, ovf = fn(scene)
    float(jax.device_get(jnp.sum(img)))
    t0 = time.perf_counter()
    for _ in range(iters):
        img, ovf = fn(scene)
    float(jax.device_get(jnp.sum(img)))
    dt = (time.perf_counter() - t0) / iters

    n_rays = viewport * viewport
    n_steps = int(2.0 / ray_step)
    win = _view_window(dims, view, window, shaded, phong)
    flops = prof_mod.windowed_kernel_flops(
        n_rays, n_steps, win[0] * win[1], win[2])
    ms = dt * 1e3
    return {
        "ms": ms,
        "rays_per_s": n_rays / dt,
        "ray_steps_per_s": n_rays * n_steps / dt,
        "model_flops": flops,
        "mfu": prof_mod.mfu(ms, flops, fast=True),
        "overflow": float(jax.device_get(ovf)),
    }


def bench_sharded_render(
    volume_size: int = 64,
    viewport: int = 512,
    iters: int = 10,
    renderer: str = "pallas-v3",
) -> dict:
    """Scaling benchmark: sharded render over all local devices vs one.

    On a pod slice this measures ray-tile data parallelism over ICI; under
    the CPU test mesh it validates the machinery (BASELINE.md scaling
    metric: >=90% linear to 2 hosts). Defaults to the flagship rung
    (``pallas-v3``) so the distributed number reflects the production
    kernels; ``pallas-blocked``/``pallas-trilinear`` remain selectable.
    """
    import jax

    from volrt.core.types import Volume
    from volrt.dist.mesh import make_mesh
    from volrt.dist.render import render_float_sharded

    volume = Volume.from_numpy(synthetic_volume(volume_size))
    cam = Camera(dims=(viewport, viewport))
    rc = make_raycaster_for(
        BenchConfig("sharded", volume_size, viewport), volume, cam
    )

    results = {}
    n = jax.device_count()
    for ndev in {1, n}:
        mesh = make_mesh(jax.devices()[:ndev])
        fn = jax.jit(
            lambda rc: render_float_sharded(rc, mesh, renderer=renderer)[0],
            static_argnames=(),
        )
        img = fn(rc)
        float(jax.device_get(jnp.sum(img)))
        t0 = time.perf_counter()
        for _ in range(iters):
            img = fn(rc)
        float(jax.device_get(jnp.sum(img)))
        dt = (time.perf_counter() - t0) / iters
        results[ndev] = dt
    eff = (
        results[1] / (results[n] * n) if n > 1 and results.get(n) else 1.0
    )
    return {
        "devices": n,
        "ms_1dev": results[1] * 1e3,
        "ms_ndev": results.get(n, results[1]) * 1e3,
        "scaling_efficiency": eff,
    }
