"""v3 fused kernels (lane-major, planned windows) vs the XLA autodiff
reference: forward image parity, gradient parity, overflow accounting."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import synthetic_volume
from volrt.core.tf import default_transfer_fn
from volrt.core.view import Camera
from volrt.diff.render import render_diff_image, scene_from_volume
from volrt.renderers.pallas.diff_v3 import (
    render_image_v3,
    render_image_v3_with_ovf,
)


def setup(n=16, wh=32, step=0.12, angles=(30.0, 20.0, 0.0)):
    scene = scene_from_volume(
        jnp.asarray(synthetic_volume(n)), default_transfer_fn(), step
    )
    cam = Camera(dims=(wh, wh))
    cam.set_camera_position(angles)
    return scene, cam.view()


class TestV3Forward:
    def test_matches_xla_diff(self):
        for angles in [(30.0, 20.0, 0.0), (0.0, 0.0, 0.0),
                       (45.0, 45.0, 0.0)]:
            scene, view = setup(angles=angles)
            a = np.asarray(render_diff_image(scene, view))
            b, ovf = jax.jit(
                lambda s, v: render_image_v3_with_ovf(s, v)
            )(scene, view)
            np.testing.assert_allclose(a, np.asarray(b), atol=2e-4)
            assert float(ovf) == 0.0

    def test_perspective(self):
        scene, _ = setup()
        cam = Camera(dims=(32, 32), perspective=True)
        cam.toggle_perspective(update_mode=True)
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        a = np.asarray(render_diff_image(scene, view))
        b, ovf = jax.jit(
            lambda s, v: render_image_v3_with_ovf(s, v)
        )(scene, view)
        np.testing.assert_allclose(a, np.asarray(b), atol=2e-4)
        assert float(ovf) == 0.0

    def test_nonsquare_viewport(self):
        scene, _ = setup()
        cam = Camera(dims=(40, 24))
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        a = np.asarray(render_diff_image(scene, view))
        b = np.asarray(jax.jit(render_image_v3)(scene, view))
        np.testing.assert_allclose(a, b, atol=2e-4)


class TestV3Backward:
    def test_grads_match_xla_autodiff(self):
        scene, view = setup()
        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)

        def loss_ref(s):
            img = render_diff_image(s, view)
            return jnp.mean((img - target) ** 2)

        def loss_v3(s):
            img = render_image_v3(s, view)
            return jnp.mean((img - target) ** 2)

        g_ref = jax.grad(loss_ref)(scene)
        g_v3 = jax.grad(loss_v3)(scene)
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_v3.density), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_ref.tf_base), np.asarray(g_v3.tf_base), atol=5e-6
        )
        assert float(jnp.linalg.norm(g_v3.density)) > 1e-4

    def test_grads_wide_volume_phases(self):
        """Volume wider than 128 voxels exercises the two x-phase copies
        and the per-phase gradient recombination."""
        vol = np.zeros((8, 8, 160), np.uint8)
        vol[2:6, 2:6, 10:150] = 180
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.1)
        # Viewport resolution must be in the same ballpark as the volume
        # resolution (the v3 design envelope: per-tile footprints fit one
        # 128-lane x window); heavily minified renders use the blocked
        # rung instead.
        cam = Camera(dims=(128, 128))
        cam.set_camera_position((20.0, 30.0, 0.0))
        view = cam.view()
        target = jnp.zeros((128, 128, 4), jnp.float32)

        def loss_ref(s):
            img = render_diff_image(s, view)
            return jnp.mean((img - target) ** 2)

        def loss_v3(s):
            img = render_image_v3(s, view)
            return jnp.mean((img - target) ** 2)

        a = np.asarray(render_diff_image(scene, view))
        b = np.asarray(jax.jit(render_image_v3)(scene, view))
        np.testing.assert_allclose(a, b, atol=2e-4)
        g_ref = jax.grad(loss_ref)(scene)
        g_v3 = jax.grad(loss_v3)(scene)
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_v3.density), atol=5e-6
        )


class TestV3NoErt:
    def test_static_threshold_matches_dynamic(self):
        """A concrete threshold >= 1 takes the static no-ERT kernel path
        (no early-exit sync, no gate chain); it must match the dynamic
        threshold-carrying path bit-for-bit in images and gradients."""
        scene, view = setup()
        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)
        img_s = jax.jit(lambda s, v: render_image_v3(
            s, v, ray_threshold=2.0))(scene, view)
        img_d = jax.jit(lambda s, v, t: render_image_v3(
            s, v, ray_threshold=t))(scene, view, jnp.float32(2.0))
        np.testing.assert_array_equal(np.asarray(img_s),
                                      np.asarray(img_d))

        def loss(s, thr):
            img = render_image_v3(s, view, ray_threshold=thr)
            return jnp.mean((img - target) ** 2)

        # Jit both sides: eager-vs-jit XLA fusion differences reassociate
        # float ops (~1e-7); the static/dynamic comparison is the point.
        g_s = jax.jit(jax.grad(loss), static_argnums=1)(scene, 2.0)
        g_d = jax.jit(jax.grad(loss))(scene, jnp.float32(2.0))
        np.testing.assert_allclose(
            np.asarray(g_s.density), np.asarray(g_d.density), atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(g_s.tf_base), np.asarray(g_d.tf_base), atol=1e-7)


class TestV3ViewPlan:
    def test_prepared_plan_matches_inline(self):
        """A precomputed ViewPlan (plan-once/render-many) must match
        the inline plan prologue. Tolerances, not bit-equality: jit
        reassociation in the XLA prologue can flip a floor boundary and
        shift a (correct, overflow-free) window origin by one voxel,
        which reorders the tap summation."""
        from volrt.renderers.pallas.diff_v3 import prepare_view_plan

        scene, view = setup()
        plan = jax.jit(
            prepare_view_plan, static_argnums=(0, 2, 3))(
                scene.density.shape, view, float(scene.ray_step), None)
        a = jax.jit(lambda s, v: render_image_v3(s, v))(scene, view)
        b = jax.jit(lambda s, v, p: render_image_v3(s, v, plan=p))(
            scene, view, plan)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)

        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)

        def loss(s, p):
            img = render_image_v3(s, view, plan=p)
            return jnp.mean((img - target) ** 2)

        def loss_inline(s):
            img = render_image_v3(s, view)
            return jnp.mean((img - target) ** 2)

        g_p = jax.jit(jax.grad(loss))(scene, plan)
        g_i = jax.jit(jax.grad(loss_inline))(scene)
        np.testing.assert_allclose(
            np.asarray(g_p.density), np.asarray(g_i.density), atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(g_p.tf_base), np.asarray(g_i.tf_base), atol=5e-6)

    def test_explicit_xbox_grads_match(self):
        """Opt-in gradient-scatter x box (window[5]): grads must match
        the dense-path reference when the plan replay is miss-free."""
        from volrt.renderers.pallas.diff_v3 import planned_window_ovf

        scene, view = setup()
        window = (16, 16, 128, 16, 16, 24)
        assert int(planned_window_ovf(
            scene.density.shape, view, scene.ray_step, window,
            xbox=True)) == 0
        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)

        def loss(s, win):
            img = render_image_v3(s, view, window=win)
            return jnp.mean((img - target) ** 2)

        g_x = jax.jit(jax.grad(loss), static_argnums=1)(scene, window)
        g_d = jax.jit(jax.grad(loss), static_argnums=1)(
            scene, window[:5] + (0,))
        np.testing.assert_allclose(
            np.asarray(g_x.density), np.asarray(g_d.density), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_x.tf_base), np.asarray(g_d.tf_base), atol=1e-6)

    def test_chunked_plan_matches_inline(self):
        from volrt.renderers.pallas.diff_v3 import (
            loss_grads_v3_chunked, prepare_view_plan)

        scene, view = setup()
        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)
        plan = prepare_view_plan(
            scene.density.shape, view, float(scene.ray_step), None)
        l_i, g_i = jax.jit(lambda s: loss_grads_v3_chunked(
            s, view, target, 2))(scene)
        l_p, g_p = jax.jit(lambda s, p: loss_grads_v3_chunked(
            s, view, target, 2, plan=p))(scene, plan)
        np.testing.assert_allclose(float(l_i), float(l_p), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_i.density), np.asarray(g_p.density), atol=1e-6)


class TestV3ESL:
    def test_esl_image_identical_grads_match_reference(self):
        """Plan-time empty-group compaction leaves the image unchanged
        (every skipped sample lerps to zero TF opacity) and the gradients
        match the XLA reference: density everywhere, TF on every entry a
        marched sample can reach (zero-run entries adjacent to skipped
        empty-block samples legitimately lose their — image-neutral —
        cotangent, as with any ESL mode; see plan_windows)."""
        vol = np.zeros((16, 16, 16), np.uint8)
        vol[10:14, 10:14, 10:14] = 220  # sparse corner blob
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.12)
        cam = Camera(dims=(32, 32))
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()

        img_plain = np.asarray(jax.jit(render_image_v3)(scene, view))
        img_esl, ovf = jax.jit(
            lambda s, v: render_image_v3_with_ovf(s, v, esl=True)
        )(scene, view)
        np.testing.assert_allclose(
            img_plain, np.asarray(img_esl), atol=1e-6)
        assert float(ovf) == 0.0

        target = jnp.zeros((32, 32, 4), jnp.float32)

        def loss_ref(s):
            img = render_diff_image(s, view, esl=True)
            return jnp.mean((img - target) ** 2)

        def loss_v3(s):
            img = render_image_v3(s, view, esl=True)
            return jnp.mean((img - target) ** 2)

        g_ref = jax.grad(loss_ref)(scene)
        g_v3 = jax.grad(loss_v3)(scene)
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_v3.density), atol=5e-6)
        # TF rows reachable only from TF-empty samples differ by design
        # (the XLA reference leaps leading empty space only; compaction
        # drops interior/trailing empty samples too). Compare where the
        # TF has opacity — the rows that shape the image.
        alpha = np.asarray(scene.tf_base[:, 3])
        live_rows = (alpha > 0) & (np.roll(alpha, 1) > 0)
        np.testing.assert_allclose(
            np.asarray(g_ref.tf_base)[live_rows],
            np.asarray(g_v3.tf_base)[live_rows], atol=5e-6)

    def test_esl_plan_compacts_groups(self):
        """The org table actually shrinks: a sparse scene's empty groups
        are deleted at plan time (the kernels never march them)."""
        from volrt.diff.render import scene_empty_grid
        from volrt.renderers.pallas import diff_v3, layout

        n = 64
        vol = np.zeros((n, n, n), np.uint8)
        vol[24:40, 24:40, 24:40] = 200
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 2.0 / n)
        cam = Camera(dims=(64, 64))
        cam.zoom(-1.0)
        view = cam.view()
        empty, block, _ = scene_empty_grid(scene)
        tiles = layout.prepare_ray_tiles_raw(
            view, scene.ray_step, None,
            tile_w=diff_v3.TILE, tile_h=diff_v3.TILE)
        dims = (n, n, n)
        window = diff_v3._norm_window(
            diff_v3.default_window(dims, view.dims, False))
        vshape = (n, n, 128)
        bz, by = diff_v3._brick_shape(vshape, window[0], window[1])
        kw = dict(wx=window[2], view_dims=view.dims)
        org0 = diff_v3.plan_windows(
            tiles, dims, vshape, scene.ray_step, window[0], window[1],
            bz, by, **kw)
        org1 = diff_v3.plan_windows(
            tiles, dims, vshape, scene.ray_step, window[0], window[1],
            bz, by, empty=empty, esl_block=block, **kw)
        full = int(jnp.sum(org0[:, 0, diff_v3.F_NG]))
        kept = int(jnp.sum(org1[:, 0, diff_v3.F_NG]))
        assert kept < full // 2, (kept, full)
        # Survivors keep their true band indices.
        ngl = np.asarray(org1[:, 0, diff_v3.F_NG])
        b0 = np.asarray(org1[..., diff_v3.F_B0])
        for t in range(org1.shape[0]):
            assert (np.diff(b0[t, :ngl[t]]) > 0).all()


class TestV3FaceWindows:
    def test_narrow_z_window_volume_face(self):
        """Regression: the window-origin line must be fitted unclipped —
        clipping the endpoints into [0, D - wz] flattens descending
        entry-face lines and drops the top tap (exactly one overflow per
        ray at wz=8)."""
        scene, _ = setup(n=48, wh=96, step=2.0 / 48, angles=(0.0, 0.0, 0.0))
        cam = Camera(dims=(96, 96))
        cam.zoom(-1.0)
        view = cam.view()
        a = np.asarray(render_diff_image(scene, view, ray_threshold=2.0))
        b, ovf = jax.jit(
            lambda s, v: render_image_v3_with_ovf(
                s, v, ray_threshold=2.0, window=(8, 16, 128))
        )(scene, view)
        assert float(ovf) == 0.0
        np.testing.assert_allclose(a, np.asarray(b), atol=2e-4)


class TestV3NarrowXWindow:
    def test_four_phase_grads(self):
        """wx=64 with a >128-wide volume exercises all four x-phase copies
        and their gradient recombination."""
        vol = np.zeros((8, 8, 160), np.uint8)
        vol[2:6, 2:6, 10:150] = 180
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.1)
        # Near-axis pose: the narrow x window is a pose-tuned opt-in
        # (it has no per-band drift slope, unlike z/y).
        cam = Camera(dims=(256, 256))
        cam.set_camera_position((8.0, 4.0, 0.0))
        view = cam.view()
        window = (8, 8, 64)
        a = np.asarray(render_diff_image(scene, view))
        b, ovf = jax.jit(
            lambda s, v: render_image_v3_with_ovf(s, v, window=window)
        )(scene, view)
        np.testing.assert_allclose(a, np.asarray(b), atol=2e-4)
        assert float(ovf) == 0.0
        target = jnp.zeros((256, 256, 4), jnp.float32)
        g_ref = jax.grad(lambda s: jnp.mean(
            (render_diff_image(s, view) - target) ** 2))(scene)
        g_v3 = jax.grad(lambda s: jnp.mean(
            (render_image_v3(s, view, window=window) - target) ** 2))(
            scene)
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_v3.density), atol=5e-6)


class TestV3ShadedDiff:
    def test_shaded_matches_xla_autodiff(self):
        """Diffuse-tap shading in the fused kernels: image and gradients
        match the XLA reference with the same shading (VERDICT: shaded
        scenes are trainable)."""
        scene, view = setup()
        kd = 0.6
        a = np.asarray(render_diff_image(
            scene, view, light_kd=kd, shaded=True))
        b, ovf = jax.jit(lambda s, v: render_image_v3_with_ovf(
            s, v, light_kd=kd, shaded=True))(scene, view)
        np.testing.assert_allclose(a, np.asarray(b), atol=2e-4)
        assert float(ovf) == 0.0
        # Shading actually changes the image.
        plain = np.asarray(render_diff_image(scene, view))
        assert np.abs(a - plain).max() > 1e-4

        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)

        def loss_ref(s):
            img = render_diff_image(s, view, light_kd=kd, shaded=True)
            return jnp.mean((img - target) ** 2)

        def loss_v3(s):
            img = render_image_v3(s, view, light_kd=kd, shaded=True)
            return jnp.mean((img - target) ** 2)

        g_ref = jax.grad(loss_ref)(scene)
        g_v3 = jax.grad(loss_v3)(scene)
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_v3.density), atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(g_ref.tf_base), np.asarray(g_v3.tf_base), atol=5e-6)


class TestV3PhongDiff:
    """Fused gradient-Blinn-Phong backward vs XLA autodiff (the diff
    path's phong mode is the oracle): six central-difference tap
    scatters + the normalize/ndl/ndh^16 cotangent chain."""

    def _check(self, view, thr=2.0, sv_limit=None, atol=1e-6):
        import os

        scene, _ = setup()
        tgt = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)
        kd = 0.6

        def loss_ref(s):
            img = render_diff_image(
                s, view, ray_threshold=thr, light_kd=kd, phong=True)
            return jnp.mean((img - tgt) ** 2)

        def loss_v3(s):
            img = render_image_v3(
                s, view, ray_threshold=thr, light_kd=kd, phong=True)
            return jnp.mean((img - tgt) ** 2)

        old = os.environ.get("VOLRT_SV_LIMIT_MB")
        if sv_limit is not None:
            os.environ["VOLRT_SV_LIMIT_MB"] = str(sv_limit)
            jax.clear_caches()
        try:
            a = render_diff_image(
                scene, view, ray_threshold=thr, light_kd=kd, phong=True)
            b = render_image_v3(
                scene, view, ray_threshold=thr, light_kd=kd, phong=True)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4)
            g0 = jax.grad(loss_ref)(scene)
            g1 = jax.grad(loss_v3)(scene)
            np.testing.assert_allclose(
                np.asarray(g0.density), np.asarray(g1.density), atol=atol)
            np.testing.assert_allclose(
                np.asarray(g0.tf_base), np.asarray(g1.tf_base), atol=atol)
        finally:
            if sv_limit is not None:
                if old is None:
                    os.environ.pop("VOLRT_SV_LIMIT_MB", None)
                else:
                    os.environ["VOLRT_SV_LIMIT_MB"] = old
                jax.clear_caches()

    def test_streamed_backward(self):
        scene, view = setup()
        self._check(view)

    def test_ert(self):
        scene, view = setup()
        self._check(view, thr=0.95)

    def test_replay_backward(self):
        """sv budget 0 forces the no-stream path: the backward replays
        the forward's gradient taps against the bricks."""
        scene, view = setup()
        self._check(view, sv_limit=0)


class TestPlanSessions:
    """Static invariants of the plan-time flush-session schedule.

    The kernel's double-buffered flush waits each write-back semaphore
    exactly once (a second wait would hang on hardware, and interpret
    mode cannot catch it — copies execute at start()), so the schedule
    fields that gate those waits are checked here directly."""

    def _plan(self, angles=(30.0, 20.0, 0.0), n=16, wh=32,
              perspective=False, flush=None):
        from volrt.renderers.pallas import diff_v3 as D
        from volrt.renderers.pallas import layout

        scene, _ = setup(n=n, wh=wh)
        cam = Camera(dims=(wh, wh), perspective=perspective)
        if perspective:
            cam.toggle_perspective(update_mode=True)
        cam.set_camera_position(angles)
        view = cam.view()
        d, h, w = scene.density.shape
        dims = (w, h, d)
        window = D._norm_window(
            D.default_window(dims, view.dims, view.perspective))
        tiles = layout.prepare_ray_tiles_raw(
            view, scene.ray_step, None, tile_w=D.TILE, tile_h=D.TILE)
        vols = D._phase_volumes(scene.density, window[2])
        bz, by = D._brick_shape(vols[0].shape, window[0], window[1])
        az, ay = D._acc_shape(vols[0].shape, window[0], window[1])
        if flush is None:
            fz, fy = az, ay
        else:
            fz = min(-(-int(flush[0]) // 8) * 8, az)
            fy = min(-(-int(flush[1]) // 8) * 8, ay)
        org = D.plan_windows(
            tiles, dims, vols[0].shape, scene.ray_step,
            window[0], window[1], bz, by, wx=window[2],
            view_dims=view.dims)
        sorg, lost = D.plan_sessions(
            org, vols[0].shape, window[0], window[1], fz, fy, window[2])
        return D, np.asarray(org), np.asarray(sorg), np.asarray(lost), (
            bz, by, az, ay, fz, fy)

    def test_schedule_invariants(self):
        for kwargs in ({}, {"angles": (45.0, 45.0, 0.0)},
                       {"perspective": True}, {"flush": (16, 16)}):
            D, org, sorg, lost, (bz, by, az, ay, fz, fy) = self._plan(
                **kwargs)
            ngl = org[:, 0, D.F_NG]
            for t in range(org.shape[0]):
                nl = int(ngl[t])
                proc = sorg[t, :nl]
                if nl == 0:
                    assert not sorg[t, :, D.S_NEW].any()
                    continue
                # Every live tile opens a session at group 0, and
                # session-start groups partition the processed range.
                assert proc[0, D.S_NEW] == 1
                assert not sorg[t, nl:, D.S_NEW].any()
                starts = np.flatnonzero(proc[:, D.S_NEW])
                # Wait-exactly-once: S_PW at a session start equals
                # S_WAIT of the previous session's start (the write that
                # wait already drained must not be waited again).
                for j, b in enumerate(starts):
                    if j == 0:
                        assert proc[b, D.S_WAIT] == 0
                        assert proc[b, D.S_PW] == 0
                    else:
                        assert (proc[b, D.S_PW]
                                == proc[starts[j - 1], D.S_WAIT])
                # Placement contains every member group's brick; the
                # session's flush box stays inside the accumulator.
                for j, b in enumerate(starts):
                    e = starts[j + 1] if j + 1 < len(starts) else nl
                    azo = proc[b, D.S_AZO]
                    ayo = proc[b, D.S_AYO]
                    assert 0 <= proc[b, D.S_RZO] <= az - fz
                    assert 0 <= proc[b, D.S_RYO] <= ay - fy
                    for g in range(b, e):
                        assert azo <= org[t, g, D.F_BZO]
                        assert org[t, g, D.F_BZO] + bz <= azo + az
                        assert ayo <= org[t, g, D.F_BYO]
                        assert org[t, g, D.F_BYO] + by <= ayo + ay
                        assert org[t, g, D.F_XO] == org[t, b, D.F_XO]
            if (fz, fy) == (az, ay):
                assert int(lost.sum()) == 0

    def test_full_box_covers_extents(self):
        """With the default full-accumulator flush box, every written
        row of every session lies inside its (azo, ayo) + box."""
        D, org, sorg, lost, (bz, by, az, ay, fz, fy) = self._plan()
        ngl = org[:, 0, D.F_NG]
        for t in range(org.shape[0]):
            nl = int(ngl[t])
            if nl == 0:
                continue
            starts = np.flatnonzero(sorg[t, :nl, D.S_NEW])
            for j, b in enumerate(starts):
                e = starts[j + 1] if j + 1 < len(starts) else nl
                zlo = sorg[t, b, D.S_AZO] + sorg[t, b, D.S_RZO]
                ylo = sorg[t, b, D.S_AYO] + sorg[t, b, D.S_RYO]
                for g in range(b, e):
                    wzl, wzh = org[t, g, D.F_WZL], org[t, g, D.F_WZH]
                    wyl, wyh = org[t, g, D.F_WYL], org[t, g, D.F_WYH]
                    if wzh <= wzl:  # dead group, writes exact zeros
                        continue
                    assert zlo <= wzl and wzh <= zlo + fz
                    assert ylo <= wyl and wyh <= ylo + fy


class TestV3FlushTrim:
    def test_trimmed_flush_grads_match(self):
        """A written-extent-sized backward flush box produces identical
        gradients to the default full-accumulator flush."""
        scene, view = setup()
        target = jnp.zeros((32, 32, 4), jnp.float32)

        def loss(s, flush):
            img = render_image_v3(s, view, flush=flush)
            return jnp.mean((img - target) ** 2)

        g_full = jax.grad(lambda s: loss(s, None))(scene)
        g_trim = jax.grad(lambda s: loss(s, (16, 16)))(scene)
        np.testing.assert_allclose(
            np.asarray(g_full.density), np.asarray(g_trim.density),
            atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(g_full.tf_base), np.asarray(g_trim.tf_base),
            atol=1e-7)

    def test_undersized_flush_is_detected(self):
        """An undersized flush box must raise the clipped-row counter
        (dTF padding cell [0, 7]) instead of silently dropping rows."""
        from volrt.renderers.pallas import diff_v3 as D
        from volrt.renderers.pallas import layout

        scene, view = setup()
        d, h, w = scene.density.shape
        dims = (w, h, d)
        premult = jnp.concatenate(
            [scene.tf_base[:, :3] * scene.tf_base[:, 3:4],
             scene.tf_base[:, 3:4]], axis=-1)
        window = D._norm_window(
            D.default_window(dims, view.dims, view.perspective))
        tiles = layout.prepare_ray_tiles_raw(
            view, scene.ray_step, None, tile_w=D.TILE, tile_h=D.TILE)
        rays_t = jnp.swapaxes(tiles, 1, 2)
        lp = view.light_pos.astype(jnp.float32).reshape(3)
        scal = jnp.concatenate([
            jnp.asarray(0.95, jnp.float32).reshape(1),
            jnp.asarray(0.0, jnp.float32).reshape(1),
            lp, jnp.zeros(3, jnp.float32)]).reshape(1, 8)
        vols = D._phase_volumes(
            scene.density.astype(jnp.float32), window[2])
        bz, by = D._brick_shape(vols[0].shape, window[0], window[1])
        org = D.plan_windows(
            tiles, dims, vols[0].shape, scene.ray_step,
            window[0], window[1], bz, by, wx=window[2],
            view_dims=view.dims)
        tfl = jnp.pad(premult, ((0, 0), (0, 4)))
        out = D._pallas_fwd(
            scal, org, rays_t, vols, tfl, dims=dims,
            ray_step=scene.ray_step, window=window, fast=False)
        gG = D._pack_gG(jnp.ones_like(out), out)

        def run(flush):
            _, dtf, _ = D._pallas_bwd(
                scal, org, rays_t, vols, tfl, gG, dims=dims,
                ray_step=scene.ray_step, window=window, fast=False,
                flush=flush)
            return float(dtf[0, 7])

        assert run((16, 16)) == 0.0
        assert run((8, 8)) > 0.0

    def test_planned_flush_lost(self):
        """The plan-time coverage checker agrees with the in-kernel
        counter: zero for a covering box, positive for an undersized
        one — without compiling any kernel (pure-XLA setup check for
        pose-tuned flush shapes, e.g. the bench headline's (32, 16))."""
        from volrt.renderers.pallas.diff_v3 import planned_flush_lost

        scene, view = setup()
        assert int(planned_flush_lost(scene, view, None)) == 0
        assert int(planned_flush_lost(scene, view, (16, 16))) == 0
        assert int(planned_flush_lost(scene, view, (8, 8))) > 0


class TestChunkedGrads:
    def test_chunked_matches_whole(self):
        """Chunk-accumulated loss+grads == whole-image value_and_grad
        (the loss is additive over tiles; reference for the 512^3-scale
        path where full-image sv exceeds HBM)."""
        from volrt.renderers.pallas.diff_v3 import loss_grads_v3_chunked

        scene, view = setup(n=16, wh=48)
        target = jnp.zeros((48, 48, 4), jnp.float32)

        def whole(s):
            img = render_image_v3(s, view, ray_threshold=2.0)
            return jnp.mean((img - target) ** 2)

        l_ref, g_ref = jax.value_and_grad(whole)(scene)
        for n_chunks in (1, 3, 4):
            l_c, g_c = jax.jit(
                lambda s: loss_grads_v3_chunked(
                    s, view, target, n_chunks, ray_threshold=2.0)
            )(scene)
            np.testing.assert_allclose(
                float(l_c), float(l_ref), rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(g_c.density), np.asarray(g_ref.density),
                atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(g_c.tf_base), np.asarray(g_ref.tf_base),
                atol=1e-6)


class TestAutoWindow:
    def test_planned_ovf_matches_kernel_and_auto_picks_clean(self):
        """planned_window_ovf replays the kernel's window arithmetic in
        pure XLA: zero planned == zero kernel overflow, an undersized
        window is flagged before any kernel compiles, and auto_window
        returns a zero-overflow pick per pose."""
        from volrt.renderers.pallas.diff_v3 import (
            auto_window, planned_window_ovf)

        scene, _ = setup(n=24, wh=48, step=2.0 / 24)
        for angles in [(0.0, 0.0, 0.0), (45.0, 45.0, 0.0)]:
            cam = Camera(dims=(48, 48))
            cam.zoom(-1.0)
            cam.set_camera_position(angles)
            view = cam.view()
            w = auto_window(scene.density.shape, view,
                            float(scene.ray_step))
            planned = int(planned_window_ovf(
                scene.density.shape, view, float(scene.ray_step), w))
            _, ovf = jax.jit(
                lambda s, v, w=w: render_image_v3_with_ovf(
                    s, v, ray_threshold=2.0, window=w))(scene, view)
            assert planned == 0 and float(ovf) == 0.0
            tiny = int(planned_window_ovf(
                scene.density.shape, view, float(scene.ray_step),
                (4, 8, 128)))
            assert tiny > 0

    def test_shaded_auto_window_image_exact(self):
        """auto_window(shaded=/phong=) widens the base pick by the
        light-tap / gradient-tap margins; shaded renders with the tuned
        window match the conservative default window exactly (the j033
        hardware result, 2.5-3x faster at 256^3)."""
        import numpy as np

        from volrt.renderers.pallas.diff_v3 import auto_window

        scene, _ = setup(n=24, wh=48, step=2.0 / 24)
        cam = Camera(dims=(48, 48))
        cam.zoom(-1.0)
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        base = auto_window(scene.density.shape, view,
                           float(scene.ray_step))
        for shaded, phong in ((True, False), (False, True)):
            w = auto_window(scene.density.shape, view,
                            float(scene.ray_step),
                            shaded=shaded, phong=phong)
            assert w[0] >= base[0] and w[1] >= base[1]
            from volrt.diff.fused import render_image_fused

            img_d = render_image_fused(
                scene, view, ray_threshold=2.0, shaded=shaded,
                phong=phong, light_kd=0.6)
            img_t = render_image_fused(
                scene, view, ray_threshold=2.0, shaded=shaded,
                phong=phong, light_kd=0.6, window=w)
            np.testing.assert_allclose(
                np.asarray(img_t), np.asarray(img_d), atol=1e-6)

    def test_fit_with_window(self):
        """fit(window=...) threads the static window through the fused
        loss; training still converges."""
        import jax.numpy as jnp

        from volrt.diff.render import DiffScene
        from volrt.train.fit import fit

        scene0, view = setup(n=16, wh=32, step=0.15)
        from volrt.diff.render import render_diff_image

        target = render_diff_image(scene0, view)
        start = DiffScene(
            density=jnp.full(scene0.density.shape, 0.3, jnp.float32),
            tf_base=scene0.tf_base, ray_step=scene0.ray_step)
        _, losses = fit(start, [(view, target)], steps=3, lr=0.05,
                        train_tf=False, fused=True,
                        window=(8, 16, 128))
        assert losses[-1] < losses[0]

    def test_need_tf_grad_false_density_identical(self):
        """need_tf_grad=False (density-only training) skips the dTF
        scatter: density gradients identical, TF gradient zero."""
        import numpy as np

        from volrt.diff.fused import l2_loss_fused

        scene, view = setup(n=24, wh=48, step=2.0 / 24)
        target = jnp.zeros((48, 48, 4), jnp.float32)
        _, g_full = jax.value_and_grad(l2_loss_fused)(
            scene, view, target)
        _, g_nod = jax.value_and_grad(
            lambda s: l2_loss_fused(s, view, target,
                                    need_tf_grad=False))(scene)
        np.testing.assert_array_equal(
            np.asarray(g_nod.density), np.asarray(g_full.density))
        assert float(jnp.max(jnp.abs(g_nod.tf_base))) == 0.0
        assert float(jnp.max(jnp.abs(g_full.tf_base))) > 0.0

    def test_need_density_grad_false_tf_identical(self):
        """need_density_grad=False (TF-only training) skips the whole
        density scatter (tap rebuild, dbrick matmul, acc RMW, flush):
        TF gradients identical, density gradient zero."""
        import numpy as np

        from volrt.diff.fused import l2_loss_fused

        scene, view = setup(n=24, wh=48, step=2.0 / 24)
        target = jnp.zeros((48, 48, 4), jnp.float32)
        _, g_full = jax.value_and_grad(l2_loss_fused)(
            scene, view, target)
        _, g_nod = jax.value_and_grad(
            lambda s: l2_loss_fused(s, view, target,
                                    need_density_grad=False))(scene)
        np.testing.assert_allclose(
            np.asarray(g_nod.tf_base), np.asarray(g_full.tf_base),
            atol=1e-7)
        assert float(jnp.max(jnp.abs(g_nod.density))) == 0.0
        assert float(jnp.max(jnp.abs(g_full.density))) > 0.0

    def test_fit_density_only_uses_no_dtf_path(self):
        """fit(train_tf=False, fused=True) trains through the
        dTF-skipping backward and converges."""
        from volrt.diff.render import DiffScene, render_diff_image
        from volrt.train.fit import fit

        scene0, view = setup(n=16, wh=32, step=0.15)
        target = render_diff_image(scene0, view)
        start = DiffScene(
            density=jnp.full(scene0.density.shape, 0.3, jnp.float32),
            tf_base=scene0.tf_base, ray_step=scene0.ray_step)
        _, losses = fit(start, [(view, target)], steps=3, lr=0.05,
                        train_tf=False, fused=True)
        assert losses[-1] < losses[0]

    def test_group_size_16_matches_default(self):
        """set_group_size(16) (the headline amortization tuning) keeps
        image + gradient parity with G=8 on a plan-validated pose."""
        import numpy as np

        import volrt.renderers.pallas.diff_v3 as d3
        from volrt.diff.fused import l2_loss_fused

        scene, view = setup(n=24, wh=48, step=2.0 / 24)
        target = jnp.zeros((48, 48, 4), jnp.float32)
        try:
            img8 = np.asarray(render_image_v3(scene, view))
            l8, g8 = jax.value_and_grad(l2_loss_fused)(
                scene, view, target)
            d3.set_group_size(16)
            w16 = d3.auto_window(
                scene.density.shape, view, float(scene.ray_step))
            ovf = int(d3.planned_window_ovf(
                scene.density.shape, view, float(scene.ray_step), w16))
            assert ovf == 0
            img16 = np.asarray(
                render_image_v3(scene, view, window=w16))
            l16, g16 = jax.value_and_grad(l2_loss_fused)(
                scene, view, target, window=w16)
            np.testing.assert_allclose(img16, img8, atol=1e-5)
            np.testing.assert_allclose(
                float(l16), float(l8), rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(g16.density), np.asarray(g8.density),
                atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(g16.tf_base), np.asarray(g8.tf_base),
                atol=2e-5)
        finally:
            d3.set_group_size(8)

    def test_rung5_esl_compaction_renders(self):
        """Rung 5 with rc.esl routes through plan-time compaction and
        stays pixel-identical to esl off."""
        import numpy as np

        from volrt.core.types import Volume, make_raycaster
        from volrt.renderers.pallas import fwd_v3

        vol = np.zeros((16, 16, 16), np.uint8)
        vol[10:14, 10:14, 10:14] = 220
        for esl in (False, True):
            rc = make_raycaster(
                Volume.from_numpy(vol), interpolation="trilinear",
                esl=esl)
            cam = Camera(dims=(32, 32))
            cam.set_camera_position((30.0, 20.0, 0.0))
            rc = rc.replace(view=cam.view())
            img, ovf = fwd_v3.render_float(rc)
            assert float(ovf) == 0.0
            if esl:
                np.testing.assert_allclose(
                    np.asarray(img), ref, atol=1e-6)
            else:
                ref = np.asarray(img)


class TestEslTfTrap:
    """The ESL TF-gradient trap (VERDICT round-4 #8) demonstrated and
    mitigated: under esl=True, TF entries whose density range the
    running TF maps to zero opacity receive no cotangent (the empty
    grid compacts those samples away), so a trained TF can never
    "switch on" such a range — unless fit(esl_refresh_every=N)
    periodically runs a full march."""

    def _setup(self):
        from volrt.diff.render import DiffScene

        # All density mass at ~200/255 -> TF entries around index 100;
        # the trainable TF starts with ZERO opacity there (and
        # everywhere), so every ESL block derives empty.
        vol = np.zeros((16, 16, 16), np.uint8)
        vol[4:12, 4:12, 4:12] = 200
        tf_open = jnp.asarray(default_transfer_fn())
        scene_gt = scene_from_volume(jnp.asarray(vol), tf_open, 0.15)
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        target = render_diff_image(scene_gt, view)
        tf_closed = tf_open.at[:, 3].set(0.0)
        scene0 = DiffScene(density=scene_gt.density,
                           tf_base=tf_closed, ray_step=0.15)
        return scene0, view, target

    def test_pure_esl_training_is_trapped(self):
        """esl=True alone: the TF alpha stays pinned at zero — zero
        gradient from compacted samples — and the loss never moves."""
        from volrt.train.fit import fit

        scene0, view, target = self._setup()
        fitted, losses = fit(
            scene0, [(view, target)], steps=4, lr=0.05,
            train_density=False, fused=True, esl=True)
        assert float(jnp.max(fitted.tf_base[:, 3])) == 0.0
        np.testing.assert_allclose(losses[-1], losses[0], rtol=1e-6)

    def test_esl_refresh_escapes_the_trap(self):
        """esl_refresh_every=2: the periodic full march hands the
        zero-opacity TF entries their cotangent, the TF opens, and the
        loss decreases below the trapped plateau."""
        from volrt.train.fit import fit

        scene0, view, target = self._setup()
        fitted, losses = fit(
            scene0, [(view, target)], steps=4, lr=0.05,
            train_density=False, fused=True, esl=True,
            esl_refresh_every=2)
        assert float(jnp.max(fitted.tf_base[:, 3])) > 0.0
        assert losses[-1] < losses[0]


class TestOnePassFused:
    """l2_loss_grads_v3_onepass: the single-launch L2 step (forward
    march + per-ray MSE cotangent + analytic backward in ONE kernel,
    sv in VMEM scratch) vs value_and_grad through the two-kernel
    custom_vjp path. Gradients must match bit-exactly (identical
    arithmetic, only the sv transport differs)."""

    def _check(self, thr, fast, window=None, flush=None):
        from volrt.renderers.pallas.diff_v3 import (
            l2_loss_grads_v3_onepass, prepare_view_plan)

        scene, view = setup()
        rng = np.random.RandomState(0)
        target = jnp.asarray(
            rng.rand(*view.dims[::-1], 4), jnp.float32)
        # Share one plan so both paths march identical planned windows
        # (plan-prologue jit reassociation can shift window origins by
        # one voxel at floor boundaries — a known tolerance-not-
        # bit-equality effect across differently-jitted plans).
        plan = prepare_view_plan(
            scene.density.shape, view, float(scene.ray_step), window)

        def loss_fn(s):
            img = render_image_v3(
                s, view, ray_threshold=thr, fast=fast, window=window,
                flush=flush, plan=plan)
            return jnp.mean((img - target) ** 2)

        l_ref, g_ref = jax.value_and_grad(loss_fn)(scene)
        l_op, g_op = jax.jit(lambda s: l2_loss_grads_v3_onepass(
            s, view, target, ray_threshold=thr, fast=fast,
            window=window, flush=flush, plan=plan))(scene)
        assert abs(float(l_ref) - float(l_op)) < 1e-6
        # Same arithmetic, but the two programs are compiled separately
        # and XLA may reassociate the phase-gradient recombination:
        # float-epsilon tolerance, not bit equality (on hardware the
        # axis-pose headline measured bit-identical grads).
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_op.density),
            atol=1e-8)
        np.testing.assert_allclose(
            np.asarray(g_ref.tf_base), np.asarray(g_op.tf_base),
            atol=1e-7)
        assert float(jnp.linalg.norm(g_op.density)) > 1e-6

    def test_no_ert_matches_two_kernel(self):
        self._check(2.0, False)

    def test_ert_matches_two_kernel(self):
        self._check(0.95, False)

    def test_fast_matches_two_kernel(self):
        self._check(2.0, True)

    def test_tuned_flush_matches(self):
        self._check(2.0, False, flush=(16, 16))

    def test_plan_matches_inline(self):
        from volrt.renderers.pallas.diff_v3 import (
            l2_loss_grads_v3_onepass, prepare_view_plan)

        scene, view = setup()
        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)
        plan = prepare_view_plan(
            scene.density.shape, view, float(scene.ray_step))
        l_a, g_a = l2_loss_grads_v3_onepass(
            scene, view, target, ray_threshold=2.0)
        l_b, g_b = l2_loss_grads_v3_onepass(
            scene, view, target, ray_threshold=2.0, plan=plan)
        np.testing.assert_array_equal(
            np.asarray(g_a.density), np.asarray(g_b.density))
        np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)

    def test_esl_matches_two_kernel(self):
        """esl=True onepass: plan-time empty-group compaction derived
        from the live TF, matching the two-kernel esl path."""
        from volrt.renderers.pallas.diff_v3 import (
            l2_loss_grads_v3_onepass)

        scene, view = setup()
        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)

        def loss_fn(s):
            img = render_image_v3(s, view, ray_threshold=2.0, esl=True)
            return jnp.mean((img - target) ** 2)

        l_ref, g_ref = jax.value_and_grad(loss_fn)(scene)
        l_op, g_op = jax.jit(lambda s: l2_loss_grads_v3_onepass(
            s, view, target, ray_threshold=2.0, esl=True))(scene)
        assert abs(float(l_ref) - float(l_op)) < 1e-6
        # ESL re-derives its plan inside each (differently-jitted)
        # program, so reassociation can shift a window origin by one
        # voxel — same tolerance class as TestV3ViewPlan.
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_op.density),
            atol=5e-6)
        np.testing.assert_allclose(
            np.asarray(g_ref.tf_base), np.asarray(g_op.tf_base),
            atol=5e-6)

    def test_shaded_matches_two_kernel(self):
        """Diffuse/phong onepass: the shaded channels (light-tap sample,
        phong gradient taps) ride VMEM scratch between the in-kernel
        passes; gradients must match the two-kernel custom_vjp path."""
        from volrt.renderers.pallas.diff_v3 import (
            l2_loss_grads_v3_onepass, prepare_view_plan)

        scene, view = setup()
        rng = np.random.RandomState(0)
        target = jnp.asarray(
            rng.rand(*view.dims[::-1], 4), jnp.float32)
        for sh, ph in ((True, False), (False, True)):
            plan = prepare_view_plan(
                scene.density.shape, view, float(scene.ray_step),
                None, sh, ph)

            def loss_fn(s, sh=sh, ph=ph, plan=plan):
                img = render_image_v3(
                    s, view, ray_threshold=0.95, shaded=sh, phong=ph,
                    light_kd=0.6, plan=plan)
                return jnp.mean((img - target) ** 2)

            l_ref, g_ref = jax.value_and_grad(loss_fn)(scene)
            l_op, g_op = jax.jit(
                lambda s, sh=sh, ph=ph, plan=plan:
                l2_loss_grads_v3_onepass(
                    s, view, target, ray_threshold=0.95, shaded=sh,
                    phong=ph, light_kd=0.6, plan=plan))(scene)
            assert abs(float(l_ref) - float(l_op)) < 1e-6
            np.testing.assert_allclose(
                np.asarray(g_ref.density), np.asarray(g_op.density),
                atol=1e-8)
            np.testing.assert_allclose(
                np.asarray(g_ref.tf_base), np.asarray(g_op.tf_base),
                atol=1e-7)
