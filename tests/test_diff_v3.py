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


class TestV3ESL:
    def test_esl_image_identical_grads_match_reference(self):
        """Leading-empty-space leaping leaves the image unchanged (skipped
        samples have zero TF contribution) and the fused ESL gradients match
        the XLA reference with the same ESL setting."""
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
        np.testing.assert_allclose(
            np.asarray(g_ref.tf_base), np.asarray(g_v3.tf_base), atol=5e-6)


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
