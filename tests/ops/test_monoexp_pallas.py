"""Pallas monoexp kernel tests.

The compiled kernel needs a TPU backend; on the CPU test backend we run in
interpreter mode for correctness parity with the generic LM engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _data(N=1024, seed=0, noise=0.0):
    rs = np.random.RandomState(seed)
    x = np.array([10.0, 20.0, 30.0, 40.0], np.float32)
    b = -1 / (rs.rand(N).astype(np.float32) * 70 + 10)
    Y = np.exp(b[:, None] * x[None, :]).astype(np.float32)
    if noise:
        Y = Y * (1 + noise * rs.randn(N, 4).astype(np.float32))
    return x, Y, b


class TestMonoexpPallasInterpret:
    def test_matches_generic_engine(self, monkeypatch):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops import monoexp_pallas
        from dosma_tpu.ops.nlls import lm_fit

        x, Y, b = _data()
        p0 = np.array([1.0, -1 / 30], np.float32)

        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = monoexp_pallas.monoexp_lm_pallas(x, Y, p0, max_iter=50)
        popt = np.asarray(popt)
        assert float(np.asarray(conv).mean()) > 0.99
        assert np.abs(popt[:, 1] - b).max() < 1e-4

        p2, r22, c2 = lm_fit(
            lambda xc, p: p[0] * jnp.exp(p[1] * xc), x, Y, p0, max_iter=50
        )
        p2 = np.asarray(p2)
        both = np.isfinite(popt[:, 1]) & np.isfinite(p2[:, 1])
        assert np.abs(popt[both] - p2[both]).max() < 1e-4

    def test_all_zero_nan(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops import monoexp_pallas

        x, Y, _ = _data(N=256)
        Y[7] = 0
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = monoexp_pallas.monoexp_lm_pallas(
                x, Y, np.array([1.0, -1 / 30], np.float32)
            )
        assert np.all(np.isnan(np.asarray(popt)[7]))
        assert np.asarray(r2)[7] == 0

    def test_constant_and_growing_signals(self):
        """Degenerate voxels: constant signal fits b≈0; growing signal fits
        a positive rate — neither may poison neighbouring lanes."""
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops import monoexp_pallas

        x, Y, b = _data(N=256)
        Y[3] = 0.7  # constant across echoes → rate ~ 0
        Y[11] = np.exp(0.02 * x)  # growing exponential → rate +0.02
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = monoexp_pallas.monoexp_lm_pallas(
                x, Y, np.array([1.0, -1 / 30], np.float32)
            )
        popt = np.asarray(popt)
        assert abs(popt[3, 1]) < 1e-3 and abs(popt[3, 0] - 0.7) < 1e-3
        assert abs(popt[11, 1] - 0.02) < 1e-4
        ok = np.ones(256, bool)
        ok[[3, 11]] = False
        assert np.abs(popt[ok, 1] - b[ok]).max() < 1e-4

    def test_noisy_matches_scipy(self):
        """5% multiplicative noise: kernel minimum matches scipy's per-voxel
        curve_fit to ~1e-3 (same least-squares objective)."""
        import scipy.optimize

        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops import monoexp_pallas

        x, Y, _ = _data(N=64, noise=0.05, seed=3)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = monoexp_pallas.monoexp_lm_pallas(
                x, Y, np.array([1.0, -1 / 30], np.float32), max_iter=50
            )
        popt = np.asarray(popt)
        for i in range(0, 64, 7):
            ref, _ = scipy.optimize.curve_fit(
                lambda t, a, bb: a * np.exp(bb * t), x, Y[i], p0=(1.0, -1 / 30)
            )
            assert np.abs(popt[i] - ref).max() < 1e-3, (i, popt[i], ref)

    def test_nonmultiple_block_padding(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops import monoexp_pallas

        x, Y, b = _data(N=1000)  # not a multiple of the lane block
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = monoexp_pallas.monoexp_lm_pallas(
                x, Y, np.array([1.0, -1 / 30], np.float32)
            )
        popt = np.asarray(popt)
        assert popt.shape == (1000, 2)
        assert np.abs(popt[:, 1] - b).max() < 1e-4

    def test_per_voxel_p0_padding_converges_fast(self):
        """Pad lanes carry the trivial seed (a=1, b=0) — not broadcast user
        p0 — so tiles with padding exit as fast as full tiles (a constant
        pad seed of 1.0 once cost ~12 wasted iterations from b=+1 overflow)."""
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops import monoexp_pallas

        x, Y, b = _data(N=500)  # forces padding to the lane block
        p0 = np.stack([np.ones(500, np.float32), np.full(500, -1 / 30, np.float32)], axis=1)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = monoexp_pallas.monoexp_lm_pallas(x, Y, p0, max_iter=50)
        popt = np.asarray(popt)
        assert popt.shape == (500, 2)
        assert np.asarray(conv).all()
        assert np.abs(popt[:, 1] - b).max() < 1e-4
