"""Cubic B-spline interpolation oracle tests (vs scipy.ndimage).

Elastix resamples final images at FinalBSplineInterpolationOrder 3
(``/root/reference/dosma/resources/elastix/params/parameters-affine.txt``);
these tests pin our TPU-native interpolator to the scipy implementation of
the same Unser prefilter + cubic kernel.
"""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from dosma_tpu.ops import interp
from dosma_tpu.ops.interp import (
    cubic_coeffs,
    cubic_map_coordinates,
    cubic_prefilter,
    cubic_sample_coeffs,
    nearest_sample,
)


@pytest.fixture(scope="module")
def vol():
    rng = np.random.RandomState(7)
    return rng.rand(20, 17, 13).astype(np.float32)


class TestCubicPrefilter:
    def test_matches_scipy_spline_filter(self, vol):
        ours = np.asarray(cubic_prefilter(vol))
        ref = ndimage.spline_filter(vol.astype(np.float64), order=3, mode="mirror")
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_single_sample_axis(self):
        # n=1 axes must pass through (no recursion possible).
        v = np.random.RandomState(0).rand(5, 1, 6).astype(np.float32)
        out = np.asarray(cubic_prefilter(v))
        ref = ndimage.spline_filter(v.astype(np.float64), order=3, mode="mirror")
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestCubicSample:
    def test_interpolates_at_integer_coords(self, vol):
        ii, jj, kk = np.meshgrid(
            np.arange(20), np.arange(17), np.arange(13), indexing="ij"
        )
        coords = np.stack([ii.ravel(), jj.ravel(), kk.ravel()]).astype(np.float32)
        out = np.asarray(cubic_map_coordinates(vol, coords))
        np.testing.assert_allclose(out, vol.ravel(), atol=1e-5)

    def test_matches_scipy_map_coordinates(self, vol):
        rng = np.random.RandomState(1)
        pts = rng.rand(3, 4000).astype(np.float32) * (
            np.array([19, 16, 12], np.float32)[:, None]
        )
        out = np.asarray(cubic_map_coordinates(vol, pts))
        ref = ndimage.map_coordinates(
            vol.astype(np.float64), pts, order=3, mode="mirror"
        )
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_outside_is_zero(self, vol):
        pts = np.array(
            [[-0.5, 20.0, 3.0], [3.0, 3.0, -1.0], [3.0, 3.0, 3.0]], np.float32
        )
        out = np.asarray(cubic_map_coordinates(vol, pts))
        np.testing.assert_array_equal(out, [0.0, 0.0, 0.0])

    def test_rows_and_scalar_paths_agree(self, vol):
        rng = np.random.RandomState(2)
        pts = jnp.asarray(
            rng.rand(3, 1000).astype(np.float32)
            * np.array([19, 16, 12], np.float32)[:, None]
        )
        cp = cubic_coeffs(vol)
        r1 = np.asarray(interp._cubic_sample_rows(cp, pts))
        r2 = np.asarray(interp._cubic_sample_scalar(cp, pts))
        np.testing.assert_allclose(r1, r2, atol=1e-5)

    def test_reproduces_linear_ramp(self):
        # Cubic B-splines reproduce polynomials up to degree 3 exactly; a
        # linear ramp must interpolate in the interior (mirror reflection
        # kinks the ramp at the borders; |pole|^d damps the kink to <1e-4
        # within ~6 samples).
        ii = np.arange(20, dtype=np.float32)
        v = np.broadcast_to(ii[:, None, None], (20, 16, 16)).copy()
        pts = np.stack(
            [
                np.linspace(6, 13, 50),
                np.full(50, 8.0),
                np.full(50, 8.0),
            ]
        ).astype(np.float32)
        out = np.asarray(cubic_map_coordinates(v, pts))
        np.testing.assert_allclose(out, pts[0], atol=1e-4)


class TestNearestSample:
    def test_rounding_and_outside(self, vol):
        pts = np.array(
            [[2.4, 2.6, -0.4, -0.6], [1.0, 1.0, 1.0, 1.0], [1.0, 1.0, 1.0, 1.0]],
            np.float32,
        )
        out = np.asarray(nearest_sample(jnp.asarray(vol), jnp.asarray(pts)))
        expected = [vol[2, 1, 1], vol[3, 1, 1], vol[0, 1, 1], 0.0]
        np.testing.assert_allclose(out, expected)


class TestWarpOrders:
    def test_warp_volume_order3_identity(self, vol):
        from dosma_tpu.ops.registration import warp_volume

        out = np.asarray(
            warp_volume(vol, np.eye(4), np.eye(4), np.eye(4), vol.shape, order=3)
        )
        np.testing.assert_allclose(out, vol, atol=1e-4)

    def test_warp_volume_order3_beats_trilinear_on_smooth_shift(self):
        """Sub-voxel shifting a smooth field: the cubic resampler must land
        measurably closer to the analytic truth than trilinear (the
        fidelity gap FinalBSplineInterpolationOrder=3 exists to close)."""
        from dosma_tpu.ops.registration import warp_volume

        n = 24
        g = np.arange(n, dtype=np.float32)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        f = lambda x, y, z: np.sin(0.5 * x) * np.cos(0.4 * y) + 0.1 * np.sin(0.3 * z)
        vol = f(X, Y, Z).astype(np.float32)
        shift = 0.37  # sub-voxel world shift along +x
        M = np.eye(4)
        M[0, 3] = shift  # fixed-world -> moving-world
        truth = f(X + shift, Y, Z)

        interior = (slice(3, -3),) * 3
        errs = {}
        for order in (1, 3):
            w = np.asarray(
                warp_volume(vol, M, np.eye(4), np.eye(4), vol.shape, order=order)
            )
            errs[order] = np.abs(w - truth)[interior].max()
        assert errs[3] < 0.35 * errs[1], errs

    def test_warp_volume_order0_mask_semantics(self):
        from dosma_tpu.ops.registration import warp_volume

        mask = np.zeros((12, 12, 6), np.float32)
        mask[4:8, 4:8, 2:4] = 1.0
        M = np.eye(4)
        M[0, 3] = 0.3
        out = np.asarray(
            warp_volume(mask, M, np.eye(4), np.eye(4), mask.shape, order=0)
        )
        # Nearest keeps labels binary — no interpolation ramp.
        assert set(np.unique(out)) <= {0.0, 1.0}

    def test_warp_chain_order3_matches_single_matrix(self, vol):
        from dosma_tpu.ops.registration import warp_volume, warp_volume_chain

        M = np.eye(4)
        M[0, 3] = 0.4
        M[1, 3] = -0.2
        w1 = np.asarray(
            warp_volume(vol, M, np.eye(4), np.eye(4), vol.shape, order=3)
        )
        w2 = np.asarray(
            warp_volume_chain(
                vol, [("matrix", M)], np.eye(4), np.eye(4), vol.shape, order=3
            )
        )
        np.testing.assert_allclose(w1, w2, atol=1e-5)


class TestMattesParzenMI:
    def test_cubic_window_partition_of_unity(self):
        """B3 weights over the padded bin range sum to 1 per sample —
        probability mass is conserved by the Parzen splat."""
        from dosma_tpu.ops.interp import _cubic_kernel

        nb = 32
        vals = jnp.linspace(2.0, nb - 3.0, 200)  # padded interior
        bins = jnp.arange(nb, dtype=jnp.float32)
        W = _cubic_kernel(vals[:, None] - bins[None, :])
        np.testing.assert_allclose(np.asarray(W.sum(axis=1)), 1.0, atol=1e-5)

    def test_mi_kernels_agree_on_alignment_ranking(self):
        """Both windows must score an aligned pair better (lower negative
        MI) than a shuffled pair."""
        from dosma_tpu.ops.registration import _soft_mi

        rng = np.random.RandomState(3)
        f = jnp.asarray(rng.rand(4096).astype(np.float32))
        m_aligned = f * 2.0 + 0.3
        m_shuffled = jnp.asarray(
            rng.permutation(np.asarray(m_aligned)).astype(np.float32)
        )
        w = jnp.ones(4096)
        for kernel in ("linear", "cubic"):
            good = float(
                _soft_mi(f, m_aligned, w, 32, 0.0, 1.0, 0.3, 2.3, kernel=kernel)
            )
            bad = float(
                _soft_mi(f, m_shuffled, w, 32, 0.0, 1.0, 0.3, 2.3, kernel=kernel)
            )
            assert good < bad - 0.5, (kernel, good, bad)

    def test_cubic_mi_gradient_smooth(self):
        """The cubic window's gradient w.r.t. moving intensities must be
        finite and nonzero near alignment (the box/linear windows' piecewise
        kinks are why Mattes chose B3)."""
        import jax

        from dosma_tpu.ops.registration import _soft_mi

        rng = np.random.RandomState(4)
        f = jnp.asarray(rng.rand(2048).astype(np.float32))
        w = jnp.ones(2048)

        def loss(mv):
            return _soft_mi(f, mv, w, 32, 0.0, 1.0, 0.0, 1.0, kernel="cubic")

        g = np.asarray(jax.grad(loss)(f + 0.01))
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0


class TestBoundaryTolerance:
    def test_last_plane_survives_float32_roundoff(self):
        """A coordinate at D-1 + O(float32 eps) (what an index->world->index
        warp chain produces for the last voxel plane) must sample the edge
        value, not fall off the DefaultPixelValue cliff."""
        import jax.numpy as jnp

        from dosma_tpu.ops.interp import cubic_map_coordinates

        rs = np.random.RandomState(5)
        vol = rs.rand(12, 12, 6).astype(np.float32)
        eps = 3e-6
        coords = jnp.asarray(
            [[11.0 + eps, -eps, 5.0], [5.0, 11.0 + eps, -eps], [5.0 + eps, 2.0, 5.0 + eps]],
            jnp.float32,
        )
        out = np.asarray(cubic_map_coordinates(vol, coords))
        ref = np.array([vol[11, 5, 5], vol[0, 11, 2], vol[5, 0, 5]])
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_genuinely_outside_still_zero(self):
        import jax.numpy as jnp

        from dosma_tpu.ops.interp import cubic_map_coordinates

        vol = np.ones((8, 8, 4), np.float32)
        coords = jnp.asarray([[7.6, -0.6, 3.0], [0, 0, 8.2], [0, 0, 0]], jnp.float32)
        out = np.asarray(cubic_map_coordinates(vol, coords))
        np.testing.assert_array_equal(out, [0.0, 0.0, 0.0])
