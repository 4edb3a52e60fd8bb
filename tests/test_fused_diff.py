"""Fused Pallas differentiable renderer vs the XLA autodiff reference."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import synthetic_volume
from volrt.core.tf import default_transfer_fn
from volrt.core.view import Camera
from volrt.diff.fused import l2_loss_fused, render_image_fused
from volrt.diff.render import render_diff_image, scene_from_volume
from volrt.train.fit import l2_loss


def setup(n=16, wh=32, step=0.12):
    scene = scene_from_volume(
        jnp.asarray(synthetic_volume(n)), default_transfer_fn(), step
    )
    cam = Camera(dims=(wh, wh))
    cam.set_camera_position((30.0, 20.0, 0.0))
    return scene, cam.view()


class TestFusedForward:
    def test_matches_xla_diff(self):
        scene, view = setup()
        a = np.asarray(render_diff_image(scene, view))
        b = np.asarray(render_image_fused(scene, view))
        np.testing.assert_allclose(a, b, atol=2e-4)


class TestFusedBackward:
    def test_grads_match_xla_autodiff(self):
        scene, view = setup()
        target = jnp.zeros(view.dims[::-1] + (4,), jnp.float32)
        g_ref = jax.grad(l2_loss)(scene, view, target)
        g_fused = jax.grad(l2_loss_fused)(scene, view, target)
        np.testing.assert_allclose(
            np.asarray(g_ref.density), np.asarray(g_fused.density),
            atol=5e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g_ref.tf_base), np.asarray(g_fused.tf_base),
            atol=5e-6,
        )
        # Gradients are substantial, not vanishing.
        assert float(jnp.linalg.norm(g_fused.density)) > 1e-4

    def test_width_guard(self):
        """W > 128 cannot use the VMEM-resident variant explicitly."""
        scene, view = setup()
        wide = scene.replace(
            density=jnp.zeros((8, 8, 200), jnp.float32)
        )
        import pytest

        with pytest.raises(ValueError, match="W <= 128"):
            render_image_fused(wide, view, blocked=False)


def test_fit_grad_chunks_trains():
    """fit(grad_chunks=2) goes through the chunked loss+grads path and
    reduces the loss (512^3-scale HBM-bounded training, small here)."""
    import jax.numpy as jnp

    from tests.conftest import synthetic_volume
    from volrt.core.tf import default_transfer_fn
    from volrt.core.view import Camera
    from volrt.diff.render import DiffScene, scene_from_volume
    from volrt.diff.render import render_diff_image
    from volrt.train.fit import fit

    vol = synthetic_volume(12)
    gt = scene_from_volume(jnp.asarray(vol), default_transfer_fn(), 0.15)
    cam = Camera(dims=(32, 32))
    cam.set_camera_position((30.0, 20.0, 0.0))
    view = cam.view()
    target = render_diff_image(gt, view)
    scene = DiffScene(
        density=jnp.full(vol.shape, 0.3, jnp.float32),
        tf_base=default_transfer_fn(), ray_step=0.15)
    _, losses = fit(scene, [(view, target)], steps=3, lr=0.05,
                    train_tf=False, fused=True, grad_chunks=2)
    assert losses[-1] < losses[0]


def test_fit_esl_density_only_matches_plain():
    """fit(esl=True) on a sparse scene: plan-time empty-group compaction
    is image-exact and density gradients are untouched, so a density-only
    fit walks the same loss trajectory as esl=False."""
    import jax.numpy as jnp
    import numpy as np

    from volrt.core.tf import default_transfer_fn
    from volrt.core.view import Camera
    from volrt.diff.render import DiffScene, scene_from_volume
    from volrt.diff.render import render_diff_image
    from volrt.train.fit import fit

    vol = np.zeros((16, 16, 16), np.uint8)
    vol[6:11, 6:11, 6:11] = 220
    gt = scene_from_volume(jnp.asarray(vol), default_transfer_fn(), 0.12)
    cam = Camera(dims=(32, 32))
    cam.set_camera_position((30.0, 20.0, 0.0))
    view = cam.view()
    target = render_diff_image(gt, view)
    init = DiffScene(
        density=jnp.full(vol.shape, 0.3, jnp.float32),
        tf_base=default_transfer_fn(), ray_step=0.12)
    _, l_esl = fit(init, [(view, target)], steps=3, lr=0.05,
                   train_tf=False, fused=True, esl=True)
    _, l_ref = fit(init, [(view, target)], steps=3, lr=0.05,
                   train_tf=False, fused=True)
    assert l_esl[-1] < l_esl[0]
    np.testing.assert_allclose(l_esl, l_ref, rtol=1e-4)
