"""Pallas biexponential kernel tests (interpret mode on the CPU backend).

Oracle pattern mirrors the monoexp kernel suite: parity with the generic
batched LM engine and with per-voxel ``scipy.optimize.curve_fit`` on the
same least-squares objective.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _data(N=512, seed=0, noise=0.0):
    """Well-separated two-compartment decays (T=8 samples)."""
    rs = np.random.RandomState(seed)
    x = np.linspace(0.0, 10.0, 8).astype(np.float32)
    a1 = 0.8 + 0.4 * rs.rand(N).astype(np.float32)
    b1 = -(0.4 + 0.2 * rs.rand(N).astype(np.float32))   # fast pool
    a2 = 0.3 + 0.3 * rs.rand(N).astype(np.float32)
    b2 = -(0.03 + 0.03 * rs.rand(N).astype(np.float32))  # slow pool
    Y = a1[:, None] * np.exp(b1[:, None] * x) + a2[:, None] * np.exp(b2[:, None] * x)
    if noise:
        Y = Y * (1 + noise * rs.randn(N, x.size).astype(np.float32))
    return x, Y.astype(np.float32), np.stack([a1, b1, a2, b2], axis=1)


_P0 = np.array([1.0, -0.5, 0.4, -0.04], np.float32)


def _fitted_curve(x, popt):
    return popt[:, 0:1] * np.exp(popt[:, 1:2] * x) + popt[:, 2:3] * np.exp(popt[:, 3:4] * x)


class TestBiexpPallasInterpret:
    def test_matches_generic_engine(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.biexp_pallas import biexp_lm_pallas
        from dosma_tpu.ops.nlls import lm_fit

        x, Y, truth = _data(N=256)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = biexp_lm_pallas(x, Y, _P0, max_iter=100)
        popt = np.asarray(popt)
        assert float(np.asarray(conv).mean()) > 0.95

        def biexp(xc, p):
            return p[0] * jnp.exp(p[1] * xc) + p[2] * jnp.exp(p[3] * xc)

        p2, _, _ = lm_fit(biexp, x, Y, _P0, max_iter=100)
        p2 = np.asarray(p2)
        both = np.all(np.isfinite(popt), axis=1) & np.all(np.isfinite(p2), axis=1)
        assert both.mean() > 0.9
        # Biexp parameters are ill-conditioned; compare in curve space.
        np.testing.assert_allclose(
            _fitted_curve(x, popt[both]), _fitted_curve(x, p2[both]), atol=2e-4
        )

    def test_recovers_noiseless_truth_curve(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.biexp_pallas import biexp_lm_pallas

        x, Y, truth = _data(N=128, seed=2)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = biexp_lm_pallas(x, Y, _P0, max_iter=100)
        popt = np.asarray(popt)
        ok = np.all(np.isfinite(popt), axis=1)
        assert ok.mean() > 0.95
        np.testing.assert_allclose(_fitted_curve(x, popt[ok]), Y[ok], atol=5e-4)
        assert float(np.asarray(r2)[ok].min()) > 0.999

    def test_noisy_matches_scipy(self):
        import scipy.optimize
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.biexp_pallas import biexp_lm_pallas

        x, Y, _ = _data(N=48, seed=3, noise=0.02)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = biexp_lm_pallas(x, Y, _P0, max_iter=150)
        popt = np.asarray(popt)

        def biexp(t, a1, b1, a2, b2):
            return a1 * np.exp(b1 * t) + a2 * np.exp(b2 * t)

        checked = 0
        for i in range(0, 48, 5):
            if not np.all(np.isfinite(popt[i])):
                continue
            try:
                ref, _ = scipy.optimize.curve_fit(
                    biexp, np.float64(x), np.float64(Y[i]), p0=_P0, maxfev=2000
                )
            except RuntimeError:
                continue
            ours = _fitted_curve(x, popt[i : i + 1])[0]
            theirs = biexp(x, *ref)
            # Same objective → same minimum in curve space (f32 tolerance).
            np.testing.assert_allclose(ours, theirs, atol=2e-3)
            checked += 1
        assert checked >= 5

    def test_all_zero_nan_and_padding(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.biexp_pallas import biexp_lm_pallas

        x, Y, _ = _data(N=300)  # not a multiple of the lane block
        Y[7] = 0
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = biexp_lm_pallas(x, Y, _P0, max_iter=60)
        popt = np.asarray(popt)
        assert popt.shape == (300, 4)
        assert np.all(np.isnan(popt[7]))
        assert np.asarray(r2)[7] == 0

    def test_curve_fit_dispatches_to_kernel(self, monkeypatch):
        """curve_fit routes the library biexponential through the Pallas
        kernel when the backend supports it."""
        from dosma_tpu.core.fitting import biexponential, curve_fit
        from dosma_tpu.ops import biexp_pallas

        x, Y, _ = _data(N=64)
        called = {}
        real = biexp_pallas.biexp_lm_pallas

        def spy(*args, **kwargs):
            called["hit"] = True
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                return real(*args, **kwargs)

        monkeypatch.setattr(biexp_pallas, "biexp_lm_pallas", spy)
        monkeypatch.setattr(biexp_pallas, "pallas_supported", lambda: True)
        popt, r2 = curve_fit(biexponential, x, Y.T, p0=tuple(_P0), maxfev=100)
        assert called.get("hit")
        assert popt.shape == (64, 4)
        ok = np.all(np.isfinite(popt), axis=1)
        assert ok.mean() > 0.9
