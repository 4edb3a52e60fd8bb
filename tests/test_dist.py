"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest):
sharded render == unsharded render; sharded train step == single-device
train step; driver dryrun entry."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import synthetic_volume
from volrt.core.tf import default_transfer_fn
from volrt.core.types import Volume, make_raycaster
from volrt.core.view import Camera
from volrt.diff.render import scene_from_volume, render_diff_image
from volrt.dist.mesh import make_mesh, replicated, rows_sharding

needs_devices = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 devices"
)


@needs_devices
class TestShardedRender:
    def test_matches_unsharded(self):
        from volrt.dist.render import render_float_sharded
        from volrt.renderers.pallas import blocked

        rc = make_raycaster(
            Volume.from_numpy(synthetic_volume(16)),
            view=Camera(dims=(32, 64)).view(),  # 8 tiles over 8 devices
            interpolation="trilinear",
            light_kd=0.0,
        )
        mesh = make_mesh()
        a, ovf_a = blocked.render_float(rc)
        b, ovf_b = render_float_sharded(rc, mesh, renderer="pallas-blocked")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        assert float(ovf_a) == float(ovf_b)

    def test_uneven_tiles_padded(self):
        from volrt.dist.render import render_float_sharded
        from volrt.renderers.pallas import trilinear

        rc = make_raycaster(
            Volume.from_numpy(synthetic_volume(16)),
            view=Camera(dims=(48, 32)).view(),  # 6 tiles -> pad to 8
            interpolation="trilinear",
            light_kd=0.0,
        )
        mesh = make_mesh()
        a, _ = trilinear.render_float(rc)
        b, _ = render_float_sharded(rc, mesh, renderer="pallas-trilinear")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_v3_matches_unsharded(self):
        """The flagship rung shard_map'ed over ray tiles == the
        single-device rung-5 render (diffuse shade path included), so a
        distributed render runs the same fast kernels as training."""
        from volrt.dist.render import render_float_sharded
        from volrt.renderers.pallas import fwd_v3

        cam = Camera(dims=(32, 64))  # 8 tiles over 8 devices
        cam.set_camera_position((30.0, 20.0, 0.0))
        rc = make_raycaster(
            Volume.from_numpy(synthetic_volume(16)),
            view=cam.view(),
            interpolation="trilinear",
        )
        mesh = make_mesh()
        a, ovf_a = fwd_v3.render_float(rc)
        b, ovf_b = render_float_sharded(rc, mesh, renderer="pallas-v3")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6)
        assert float(ovf_a) == float(ovf_b)

    def test_bench_sharded_render_runs(self):
        """The scaling benchmark drives the flagship rung over the full
        mesh and reports a finite efficiency (machinery validation; the
        real scaling number needs real multi-chip hardware)."""
        from volrt.bench.harness import bench_sharded_render

        m = bench_sharded_render(volume_size=16, viewport=64, iters=1)
        assert m["devices"] == 8
        assert m["ms_1dev"] > 0 and m["ms_ndev"] > 0
        assert np.isfinite(m["scaling_efficiency"])

    def test_v3_esl_matches_unsharded(self):
        from volrt.dist.render import render_float_sharded
        from volrt.renderers.pallas import fwd_v3

        rc = make_raycaster(
            Volume.from_numpy(synthetic_volume(16)),
            view=Camera(dims=(32, 64)).view(),
            interpolation="trilinear",
            esl=True,
        )
        mesh = make_mesh()
        a, _ = fwd_v3.render_float(rc)
        b, _ = render_float_sharded(rc, mesh, renderer="pallas-v3")
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6)


@needs_devices
class TestShardedTraining:
    def test_step_matches_single_device(self):
        from volrt.train.fit import init_state, make_optimizer, make_train_step

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(8)), default_transfer_fn(), 0.2
        )
        cam = Camera(dims=(16, 16))
        cam.set_camera_position((30.0, 0.0, 0.0))
        view = cam.view()
        target = render_diff_image(scene, view) * 0.5

        opt = make_optimizer(0.01)
        mesh = make_mesh()

        s_single = init_state(scene, opt)
        step_single = make_train_step(opt)
        s1, loss1 = step_single(s_single, view, target)

        s_shard = jax.device_put(init_state(scene, opt), replicated(mesh))
        step_shard = make_train_step(opt, mesh=mesh)
        tgt = jax.device_put(target, rows_sharding(mesh))
        s2, loss2 = step_shard(s_shard, view, tgt)

        assert abs(float(loss1) - float(loss2)) < 1e-6
        np.testing.assert_allclose(
            np.asarray(s1.scene.density),
            np.asarray(s2.scene.density),
            atol=1e-6,
        )


@needs_devices
def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


@needs_devices
class TestVolumeSharded:
    def test_matches_unsharded(self):
        from volrt.core.tf import default_transfer_fn
        from volrt.diff.render import render_diff_image, scene_from_volume
        from volrt.dist.volume_sharded import render_volume_sharded

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(), 0.15
        )
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        a = np.asarray(render_diff_image(scene, view, ray_threshold=2.0))
        b = np.asarray(
            render_volume_sharded(scene, view, mesh, ray_threshold=2.0))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_cross_slab_ert_matches_unsharded(self):
        """v2's upstream-opacity scan makes ERT exact across slab
        boundaries: the sharded render matches the unsharded render at the
        same (enabled) threshold."""
        from volrt.core.tf import default_transfer_fn
        from volrt.diff.render import render_diff_image, scene_from_volume
        from volrt.dist.volume_sharded import render_volume_sharded

        # Dense volume so ERT actually triggers mid-volume.
        vol = np.full((16, 16, 16), 200, np.uint8)
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        a = np.asarray(render_diff_image(scene, view, ray_threshold=0.6))
        b = np.asarray(
            render_volume_sharded(scene, view, mesh, ray_threshold=0.6))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_device_placed_slabs(self):
        """shard_slabs_to_devices builds the sharded slab array without
        an in-graph full-volume stack and renders identically."""
        from volrt.core.tf import default_transfer_fn
        from volrt.diff.render import scene_from_volume
        from volrt.dist.volume_sharded import (
            render_volume_sharded, shard_slabs_to_devices)

        vol = synthetic_volume(16)
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.2)
        cam = Camera(dims=(16, 16))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        slabs = shard_slabs_to_devices(
            np.asarray(scene.density), mesh)
        a = np.asarray(render_volume_sharded(scene, view, mesh))
        b = np.asarray(
            render_volume_sharded(scene, view, mesh, slabs=slabs))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_differentiable(self):
        from volrt.core.tf import default_transfer_fn
        from volrt.diff.render import scene_from_volume
        from volrt.dist.volume_sharded import render_volume_sharded

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(), 0.2
        )
        cam = Camera(dims=(16, 16))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()

        def loss(s):
            return jnp.mean(render_volume_sharded(s, view, mesh) ** 2)

        g = jax.grad(loss)(scene)
        assert np.isfinite(np.asarray(g.density)).all()
        assert float(jnp.linalg.norm(g.density)) > 0


@needs_devices
class TestVolumeShardedPallas:
    def test_pallas_backend_matches_xla(self):
        """The per-slab segment march routed through the v3 forward kernel
        matches both the XLA slab backend and the unsharded reference,
        with cross-slab ERT enabled."""
        from volrt.core.tf import default_transfer_fn
        from volrt.diff.render import render_diff_image, scene_from_volume
        from volrt.dist.volume_sharded import render_volume_sharded

        vol = np.full((16, 16, 16), 160, np.uint8)
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(32, 32))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        ref = np.asarray(render_diff_image(scene, view, ray_threshold=0.7))
        out = np.asarray(render_volume_sharded(
            scene, view, mesh, ray_threshold=0.7, backend="pallas"))
        np.testing.assert_allclose(ref, out, atol=2e-4)

    def test_pallas_backend_grads_match_xla(self):
        """The slab-seeded v3 backward (dacc0 cotangent through the
        cross-device opacity scan) reproduces the XLA backend's scene
        gradients — including the cross-slab terms where one slab's
        density modulates downstream slabs' transmittance."""
        from volrt.core.tf import default_transfer_fn
        from volrt.diff.render import scene_from_volume
        from volrt.dist.volume_sharded import render_volume_sharded

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(),
            0.15)
        cam = Camera(dims=(32, 32))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        w = jnp.linspace(0.5, 1.5, 32 * 32 * 4).reshape(32, 32, 4)

        def loss(s, backend):
            img = render_volume_sharded(
                s, view, mesh, ray_threshold=2.0, backend=backend)
            return jnp.mean(w * img ** 2)

        g_xla = jax.grad(lambda s: loss(s, "xla"))(scene)
        g_pal = jax.grad(lambda s: loss(s, "pallas"))(scene)
        np.testing.assert_allclose(
            np.asarray(g_pal.density), np.asarray(g_xla.density),
            atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(g_pal.tf_base), np.asarray(g_xla.tf_base),
            atol=5e-5)


@needs_devices
class TestShardedFusedTraining:
    @pytest.fixture(autouse=True)
    def _fresh_trace_caches(self):
        # JAX 0.9 trace-cache pollution: after the volume-sharded tests'
        # grad-of-shard_map + shard_map'ed pallas forwards, a fresh
        # single-device trace of the fused kernels picks up mesh-typed
        # avals from cached jaxprs ("Mesh for all inputs should be
        # equal ... Auto ... Manual"). Clearing caches isolates the test.
        jax.clear_caches()
        yield

    def test_fused_loss_grads_match_single_device(self):
        """shard_map'ed v3 fused loss+grads == single-device fused path
        (tiles are data-parallel; replicated-operand cotangents psum)."""
        from volrt.diff.fused import render_image_fused
        from volrt.dist.render import l2_loss_grads_v3_sharded

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(), 0.12
        )
        cam = Camera(dims=(32, 64))  # 8 tiles over 8 devices
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        target = jnp.zeros((64, 32, 4), jnp.float32)

        def loss_single(s):
            img = render_image_fused(s, view)
            return jnp.mean((img - target) ** 2)

        l_ref, g_ref = jax.value_and_grad(loss_single)(scene)
        mesh = make_mesh()
        l_sh, g_sh = l2_loss_grads_v3_sharded(
            scene, view, target, mesh, fast=False)
        np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_sh.density), np.asarray(g_ref.density),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_sh.tf_base), np.asarray(g_ref.tf_base),
            atol=1e-6)

    def test_fused_shaded_loss_grads_match_single_device(self):
        """Mesh-sharded fused training with shading (diffuse AND phong)
        equals the single-device fused path."""
        from volrt.diff.fused import l2_loss_fused
        from volrt.dist.render import l2_loss_grads_v3_sharded

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(), 0.12
        )
        cam = Camera(dims=(32, 32))
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        target = jnp.zeros((32, 32, 4), jnp.float32)
        mesh = make_mesh()
        for shading in ("diffuse", "phong"):
            def loss_single(s, shading=shading):
                return l2_loss_fused(
                    s, view, target, fast=False,
                    shaded=(shading == "diffuse"),
                    phong=(shading == "phong"))

            l_ref, g_ref = jax.value_and_grad(loss_single)(scene)
            l_sh, g_sh = l2_loss_grads_v3_sharded(
                scene, view, target, mesh, fast=False, shading=shading)
            np.testing.assert_allclose(
                float(l_sh), float(l_ref), rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(g_sh.density), np.asarray(g_ref.density),
                atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(g_sh.tf_base), np.asarray(g_ref.tf_base),
                atol=1e-6)

    def test_fused_loss_grads_with_plan_match(self):
        """A precomputed ViewPlan (plan-once/render-many) gives the
        sharded step identical loss+grads to in-step planning — the
        BASELINE-config-5 step no longer re-runs the plan prologue."""
        from volrt.dist.render import l2_loss_grads_v3_sharded
        from volrt.renderers.pallas.diff_v3 import prepare_view_plan

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(), 0.12
        )
        cam = Camera(dims=(32, 64))
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        target = jnp.zeros((64, 32, 4), jnp.float32)
        mesh = make_mesh()
        l_ref, g_ref = l2_loss_grads_v3_sharded(
            scene, view, target, mesh, fast=False)
        plan = prepare_view_plan(
            scene.density.shape, view, float(scene.ray_step))
        l_p, g_p = l2_loss_grads_v3_sharded(
            scene, view, target, mesh, fast=False, plan=plan)
        np.testing.assert_allclose(float(l_p), float(l_ref), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_p.density), np.asarray(g_ref.density),
            atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(g_p.tf_base), np.asarray(g_ref.tf_base),
            atol=1e-7)

    def test_fused_loss_grads_esl_match_single_device(self):
        """Mesh-sharded fused training with plan-time ESL compaction
        equals the single-device fused esl path."""
        from volrt.diff.fused import l2_loss_fused
        from volrt.dist.render import l2_loss_grads_v3_sharded

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(), 0.12
        )
        cam = Camera(dims=(32, 64))
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        target = jnp.zeros((64, 32, 4), jnp.float32)
        mesh = make_mesh()

        def loss_single(s):
            return l2_loss_fused(s, view, target, fast=False, esl=True)

        l_ref, g_ref = jax.value_and_grad(loss_single)(scene)
        l_sh, g_sh = l2_loss_grads_v3_sharded(
            scene, view, target, mesh, fast=False, esl=True)
        np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_sh.density), np.asarray(g_ref.density),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_sh.tf_base), np.asarray(g_ref.tf_base),
            atol=1e-6)

    def test_chunked_esl_matches_full(self):
        """Chunked gradient accumulation with esl=True == the unchunked
        fused esl loss+grads (the 512^3-scale path keeps ESL)."""
        from volrt.diff.fused import l2_loss_fused
        from volrt.renderers.pallas.diff_v3 import loss_grads_v3_chunked

        scene = scene_from_volume(
            jnp.asarray(synthetic_volume(16)), default_transfer_fn(), 0.12
        )
        cam = Camera(dims=(32, 64))
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        target = jnp.zeros((64, 32, 4), jnp.float32)

        def loss_single(s):
            return l2_loss_fused(s, view, target, fast=False, esl=True)

        l_ref, g_ref = jax.value_and_grad(loss_single)(scene)
        l_c, g_c = loss_grads_v3_chunked(
            scene, view, target, 2, fast=False, esl=True)
        np.testing.assert_allclose(float(l_c), float(l_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_c.density), np.asarray(g_ref.density),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_c.tf_base), np.asarray(g_ref.tf_base),
            atol=1e-6)

    def test_fit_volume_sharded_trains(self):
        """End-to-end Z-slab-sharded training: loss decreases with the
        volume split across the mesh and marched by the v3 kernels."""
        from volrt.diff.render import DiffScene
        from volrt.train.fit import fit

        vol = synthetic_volume(16)
        gt = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(32, 32))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        target = render_diff_image(gt, view)
        scene = DiffScene(
            density=jnp.full(vol.shape, 0.3, jnp.float32),
            tf_base=default_transfer_fn(), ray_step=0.15)
        mesh = make_mesh()
        _, losses = fit(scene, [(view, target)], steps=3, lr=0.05,
                        train_tf=False, mesh=mesh, volume_sharded=True)
        assert losses[-1] < losses[0]

    def test_volume_sharded_shaded_matches_unsharded(self):
        """Shaded volume-sharded rendering (wider slab halos carry the
        light/gradient taps) equals the unsharded shaded diff renderer,
        for both diffuse and phong; gradients flow."""
        from volrt.dist.volume_sharded import render_volume_sharded

        vol = synthetic_volume(16)
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        for shading in ("diffuse", "phong"):
            ref = render_diff_image(
                scene, view, light_kd=0.6,
                shaded=(shading == "diffuse"),
                phong=(shading == "phong"))
            img = render_volume_sharded(
                scene, view, mesh, shading=shading, light_kd=0.6)
            np.testing.assert_allclose(
                np.asarray(img), np.asarray(ref), atol=2e-5)

            def loss(s, shading=shading):
                img = render_volume_sharded(
                    s, view, mesh, shading=shading, light_kd=0.6)
                return jnp.mean(img ** 2)

            g = jax.grad(loss)(scene)
            assert np.isfinite(np.asarray(g.density)).all()
            assert float(jnp.linalg.norm(g.density)) > 0

    def test_volume_sharded_esl_matches(self):
        """Plan-time ESL compaction on the slab marches (pallas backend,
        global emptiness grid shifted to slab-local plans) is
        image-exact vs the uncompacted slab render."""
        from volrt.dist.volume_sharded import render_volume_sharded

        vol = np.zeros((16, 16, 16), np.uint8)
        vol[10:14, 4:12, 4:12] = 220
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        a = render_volume_sharded(
            scene, view, mesh, backend="pallas")
        b = render_volume_sharded(
            scene, view, mesh, backend="pallas", esl=True)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-6)

        def loss(s):
            img = render_volume_sharded(
                s, view, mesh, backend="pallas", esl=True)
            return jnp.mean(img ** 2)

        g = jax.grad(loss)(scene)
        assert np.isfinite(np.asarray(g.density)).all()
        assert float(jnp.linalg.norm(g.density)) > 0

    def test_volume_sharded_shaded_pallas_matches_unsharded(self):
        """Diffuse shading through the PALLAS slab backend (the v3 slab
        kernel's shade tap, round 5) equals the unsharded shaded diff
        renderer on the 8-device mesh; the light-tap cotangent flows
        through the fused backward (VERDICT round-4 #5)."""
        from volrt.dist.volume_sharded import render_volume_sharded

        vol = synthetic_volume(16)
        scene = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        mesh = make_mesh()
        ref = render_diff_image(scene, view, light_kd=0.6, shaded=True)
        img = render_volume_sharded(
            scene, view, mesh, shading="diffuse", light_kd=0.6,
            backend="pallas")
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref), atol=2e-5)

        # ESL composes with the shaded pallas slab path (image-exact).
        img_esl = render_volume_sharded(
            scene, view, mesh, shading="diffuse", light_kd=0.6,
            backend="pallas", esl=True)
        np.testing.assert_allclose(
            np.asarray(img_esl), np.asarray(img), atol=1e-6)

        def loss(s):
            img = render_volume_sharded(
                s, view, mesh, shading="diffuse", light_kd=0.6,
                backend="pallas")
            return jnp.mean(img ** 2)

        g = jax.grad(loss)(scene)
        assert np.isfinite(np.asarray(g.density)).all()
        assert float(jnp.linalg.norm(g.density)) > 0

    def test_fit_volume_sharded_shaded_esl_trains(self):
        """fit(volume_sharded=True, shading="diffuse", esl=True): the
        shaded pallas slab backend trains with plan-time ESL compaction
        (the round-4 composition hole, VERDICT #5)."""
        from volrt.diff.render import DiffScene
        from volrt.train.fit import fit

        vol = synthetic_volume(16)
        gt = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        target = render_diff_image(gt, view, light_kd=0.6, shaded=True)
        scene = DiffScene(
            density=jnp.full(vol.shape, 0.3, jnp.float32),
            tf_base=default_transfer_fn(), ray_step=0.15)
        mesh = make_mesh()
        _, losses = fit(scene, [(view, target)], steps=3, lr=0.05,
                        train_tf=False, mesh=mesh, volume_sharded=True,
                        shading="diffuse", esl=True)
        assert losses[-1] < losses[0]

    def test_fit_volume_sharded_shaded_trains(self):
        from volrt.diff.render import DiffScene
        from volrt.train.fit import fit

        vol = synthetic_volume(16)
        gt = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        view = cam.view()
        target = render_diff_image(gt, view, light_kd=0.6, shaded=True)
        scene = DiffScene(
            density=jnp.full(vol.shape, 0.3, jnp.float32),
            tf_base=default_transfer_fn(), ray_step=0.15)
        mesh = make_mesh()
        _, losses = fit(scene, [(view, target)], steps=3, lr=0.05,
                        train_tf=False, mesh=mesh, volume_sharded=True,
                        shading="diffuse")
        assert losses[-1] < losses[0]

    def test_fit_fused_mesh_trains(self):
        from volrt.diff.render import DiffScene
        from volrt.train.fit import fit

        vol = synthetic_volume(12)
        gt = scene_from_volume(
            jnp.asarray(vol), default_transfer_fn(), 0.15)
        cam = Camera(dims=(32, 32))
        cam.set_camera_position((30.0, 20.0, 0.0))
        view = cam.view()
        target = render_diff_image(gt, view)
        scene = DiffScene(
            density=jnp.full(vol.shape, 0.3, jnp.float32),
            tf_base=default_transfer_fn(), ray_step=0.15)
        mesh = make_mesh()
        _, losses = fit(scene, [(view, target)], steps=3, lr=0.05,
                        train_tf=False, fused=True, mesh=mesh)
        assert losses[-1] < losses[0]
