"""Parity tests: Pallas renderer rungs vs the batched XLA renderer.

Run in interpreter mode on CPU (conftest). Cases are small because
interpret-mode marching is slow; the same parity is exercised at scale on
real TPU by the benchmark suite.

Tolerances: with shading off the kernels are bit-exact transcriptions of the
batched march (same f32 ops); the MXU one-hot gathers are exact because every
product is ``1.0 * value``. With shading on, the light-direction
normalization uses rsqrt vs divide — documented <=2e-3 image tolerance.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import synthetic_volume
from volrt.core.types import View, Volume, make_raycaster
from volrt.renderers import batched


def small_view(wh: int, oblique: bool = True, persp: bool = False) -> View:
    step_px = 3.0 / wh
    if oblique:
        d = jnp.array([-0.1, -0.05, -1.0], jnp.float32)
        d = d / jnp.linalg.norm(d)
        origin = jnp.array([0.3, 0.2, 3.0], jnp.float32)
    else:
        d = jnp.array([0.0, 0.0, -1.0], jnp.float32)
        origin = jnp.array([0.0, 0.0, 3.0], jnp.float32)
    return View(
        origin=origin,
        direction=d,
        right_plane=jnp.array([step_px, 0.0, 0.0], jnp.float32),
        up_plane=jnp.array([0.0, step_px, 0.0], jnp.float32),
        light_pos=jnp.array([2.0, 1.0, 3.0], jnp.float32),
        dims=(wh, wh),
        perspective=persp,
    )


def make_rc(n=16, wh=32, interp="nearest", esl=True, kd=0.0, **kw):
    vol = Volume.from_numpy(synthetic_volume(n))
    return make_raycaster(
        vol, view=small_view(wh, **kw), interpolation=interp, esl=esl,
        light_kd=kd,
    )


class TestPallasNN:
    def test_parity_exact_no_shading(self):
        from volrt.renderers.pallas import nn

        rc = make_rc(kd=0.0)
        a = np.asarray(batched.render_float(rc))
        b = np.asarray(nn.render_float(rc))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_parity_with_shading(self):
        from volrt.renderers.pallas import nn

        rc = make_rc(kd=0.6)
        a = np.asarray(batched.render_float(rc))
        b = np.asarray(nn.render_float(rc))
        np.testing.assert_allclose(a, b, atol=2e-3)

    def test_esl_off(self):
        from volrt.renderers.pallas import nn

        rc = make_rc(esl=False)
        a = np.asarray(batched.render_float(rc))
        b = np.asarray(nn.render_float(rc))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_size_guard(self):
        from volrt.renderers.pallas import nn

        vol = Volume.from_numpy(np.zeros((4, 4, 129), np.uint8))
        rc = make_raycaster(vol, view=small_view(16))
        with pytest.raises(ValueError, match="pallas-nn"):
            nn.render_float(rc)


class TestPallasTrilinear:
    def test_parity_no_shading(self):
        from volrt.renderers.pallas import trilinear

        rc = make_rc(interp="trilinear", kd=0.0)
        a = np.asarray(batched.render_float(rc))
        b, ovf = trilinear.render_float(rc)
        assert float(ovf) == 0.0, "window overflow in small ortho scene"
        # 1e-5: the kernel's matmul-folded z/y lerp sums 4 weighted taps in
        # one reduction vs the batched renderer's sequential lerps.
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)

    def test_parity_with_shading(self):
        from volrt.renderers.pallas import trilinear

        rc = make_rc(interp="trilinear", kd=0.6)
        a = np.asarray(batched.render_float(rc))
        b, ovf = trilinear.render_float(rc)
        assert float(ovf) == 0.0
        np.testing.assert_allclose(a, np.asarray(b), atol=2e-3)

    def test_perspective(self):
        from volrt.renderers.pallas import trilinear

        rc = make_rc(interp="trilinear", kd=0.0, persp=True)
        a = np.asarray(batched.render_float(rc))
        b, ovf = trilinear.render_float(rc)
        assert float(ovf) == 0.0
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)

    def test_mode_guard(self):
        from volrt.renderers.pallas import trilinear

        rc = make_rc(interp="nearest")
        with pytest.raises(ValueError, match="trilinear"):
            trilinear.render_float(rc)


class TestPallasBlocked:
    def test_parity_no_shading(self):
        from volrt.renderers.pallas import blocked

        rc = make_rc(interp="trilinear", kd=0.0)
        a = np.asarray(batched.render_float(rc))
        b, ovf = blocked.render_float(rc)
        assert float(ovf) == 0.0
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)

    def test_wide_volume(self):
        """W > 128 exercises the x-windowed DMA path (unavailable to rung 3)."""
        from volrt.renderers.pallas import blocked

        data = synthetic_volume(32)
        wide = np.concatenate([data] * 5, axis=2)  # (32, 32, 160): W=160
        vol = Volume.from_numpy(wide)
        rc = make_raycaster(
            vol, view=small_view(32), interpolation="trilinear", esl=True,
            light_kd=0.0,
        )
        a = np.asarray(batched.render_float(rc))
        b, ovf = blocked.render_float(rc)
        assert float(ovf) == 0.0
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-5)


class TestLayout:
    def test_tile_untile_roundtrip(self):
        from volrt.renderers.pallas import layout

        rng = np.random.default_rng(0)
        img = rng.standard_normal((40, 56, 3)).astype(np.float32)
        wp, hp = layout.pad_dims(56, 40)
        padded = np.zeros((hp, wp, 3), np.float32)
        padded[:40, :56] = img
        tiles = layout.tile_rays(jnp.asarray(padded), 56, 40)
        assert tiles.shape == (
            (hp // 16) * (wp // 16), layout.RAYS_PER_TILE, 3
        )
        back = np.asarray(layout.untile_rays(tiles, 56, 40))
        np.testing.assert_array_equal(back, img)

    def test_band_offsets_nonnegative(self):
        from volrt.renderers.pallas import layout

        rc = make_rc()
        tiles = np.asarray(layout.prepare_ray_tiles(rc))
        j0 = tiles[..., layout.CH_J0]
        alive = tiles[..., layout.CH_ALIVE] > 0
        assert (j0[alive] >= 0).all()
        # Every tile with an alive ray has one ray starting at band 0.
        for t in range(tiles.shape[0]):
            if alive[t].any():
                assert j0[t][alive[t]].min() == 0


class TestModes:
    def test_noshade_matches_when_kd_zero(self):
        from volrt.renderers.pallas import trilinear

        rc = make_rc(interp="trilinear", kd=0.0)
        a, _ = trilinear.render_float(rc)
        b, _ = trilinear.render_float(rc, shade=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_fast_mode_close(self):
        """bf16 gathers: ~8-bit mantissa weights (cf. CUDA's 9-bit texture
        lerp); image tolerance accordingly loose."""
        from volrt.renderers.pallas import trilinear

        rc = make_rc(interp="trilinear", kd=0.0)
        a, _ = trilinear.render_float(rc)
        b, _ = trilinear.render_float(rc, fast=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2)


class TestFwdV3Rung:
    def test_matches_unshaded_trilinear_rung(self):
        """Rung 5 (pallas-v3) matches rung 3's shade=False render."""
        import numpy as np

        from tests.conftest import synthetic_volume
        from volrt.core.types import Volume, make_raycaster
        from volrt.core.view import Camera
        from volrt.renderers import get_renderer, renderer_name

        cam = Camera(dims=(32, 32))
        cam.set_camera_position((30.0, 20.0, 0.0))
        rc = make_raycaster(
            Volume.from_numpy(synthetic_volume(16)),
            view=cam.view(), light_kd=0.0, interpolation="trilinear",
        )
        tri = get_renderer(3)
        v3 = get_renderer(5)
        assert renderer_name(5) == "pallas-v3"
        a, _ = tri.render_float(rc, shade=False)
        b, ovf = v3.render_float(rc)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4)
        assert float(ovf) == 0.0

    def test_esl_and_ert(self):
        """Rung 5 honors ESL (same image) and ERT (dense scene renders)."""
        import numpy as np

        from tests.conftest import synthetic_volume
        from volrt.core.types import Volume, make_raycaster
        from volrt.core.view import Camera
        from volrt.renderers import get_renderer

        cam = Camera(dims=(24, 24))
        cam.set_camera_position((25.0, 10.0, 0.0))
        vol = Volume.from_numpy(synthetic_volume(16))
        v3 = get_renderer(5)
        rc = make_raycaster(vol, view=cam.view(), light_kd=0.0,
                            interpolation="trilinear", esl=True)
        rc_noesl = rc.replace(esl=False)
        a, _ = v3.render_float(rc)
        b, _ = v3.render_float(rc_noesl)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6)

    def test_phong_matches_batched(self):
        """Rung 5 gradient Blinn-Phong matches the XLA reference shading
        (central-difference normals from shifted hat weights vs
        sample_trilinear at +-2/n world offsets — identical taps, rsqrt
        vs divide normalization => small tolerance)."""
        import numpy as np

        from tests.conftest import synthetic_volume
        from volrt.core.types import Volume, make_raycaster
        from volrt.core.view import Camera
        from volrt.renderers import batched, get_renderer

        for persp in (False, True):
            cam = Camera(dims=(32, 32), perspective=persp)
            if persp:
                cam.toggle_perspective(update_mode=True)
            cam.set_camera_position((30.0, 20.0, 0.0))
            rc = make_raycaster(
                Volume.from_numpy(synthetic_volume(16)),
                view=cam.view(), interpolation="trilinear",
                shading="phong",
            )
            a = np.asarray(batched.render_float(rc))
            b, ovf = get_renderer(5).render_float(rc)
            np.testing.assert_allclose(
                a, np.asarray(b), atol=3e-3)
            assert float(ovf) == 0.0
            # Phong actually lights the scene (differs from unshaded).
            c, _ = get_renderer(5).render_float(
                rc.replace(shading="diffuse", light_kd=jnp.float32(0.0)))
            assert np.abs(np.asarray(c) - np.asarray(b)).max() > 1e-3
