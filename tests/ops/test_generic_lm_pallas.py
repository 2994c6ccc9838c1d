"""Generic small-P Pallas LM kernel tests (interpret mode on CPU).

Oracle: :func:`dosma_tpu.ops.nlls.lm_fit` — the kernel shares its damping
ladder and convergence latches, so fitted parameters must agree to f32
noise on every model, including a 3-parameter offset-exponential the
fused monoexp/biexp kernels cannot express (VERDICT r4 item 6).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dosma_tpu.ops.nlls import lm_fit


def _offset_exp(xc, p):
    return p[0] * jnp.exp(p[1] * xc) + p[2]


def _offset_exp_data(N=1024, seed=0, noise=0.0):
    rs = np.random.RandomState(seed)
    x = np.array([5.0, 15.0, 30.0, 50.0, 80.0], np.float32)
    a = rs.rand(N).astype(np.float32) + 0.5
    b = -1 / (rs.rand(N).astype(np.float32) * 70 + 10)
    c = rs.rand(N).astype(np.float32) * 0.2
    Y = (a[:, None] * np.exp(b[:, None] * x[None, :]) + c[:, None]).astype(np.float32)
    if noise:
        Y = Y + noise * rs.randn(N, x.size).astype(np.float32)
    return x, Y, (a, b, c)


class TestGenericLMPallasInterpret:
    def test_3param_matches_hbm_engine(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.generic_lm_pallas import generic_lm_pallas

        x, Y, (a, b, c) = _offset_exp_data(N=512)
        p0 = np.array([1.0, -1 / 30, 0.0], np.float32)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = generic_lm_pallas(
                _offset_exp, x, Y, p0, max_iter=60, block_n=256
            )
        popt = np.asarray(popt)
        assert float(np.asarray(conv).mean()) > 0.98
        ok = np.isfinite(popt[:, 1])
        assert np.abs(popt[ok, 1] - b[ok]).max() < 1e-3

        p2, _, _ = lm_fit(_offset_exp, x, Y, p0, max_iter=60)
        p2 = np.asarray(p2)
        both = np.isfinite(popt[:, 1]) & np.isfinite(p2[:, 1])
        assert both.mean() > 0.95
        assert np.abs(popt[both] - p2[both]).max() < 1e-3

    def test_monoexp_2param_parity(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.generic_lm_pallas import generic_lm_pallas

        rs = np.random.RandomState(3)
        N = 300  # deliberately NOT a block multiple: exercises padding
        x = np.array([10.0, 20.0, 30.0, 40.0], np.float32)
        b = -1 / (rs.rand(N).astype(np.float32) * 70 + 10)
        Y = np.exp(b[:, None] * x[None, :]).astype(np.float32)
        model = lambda xc, p: p[0] * jnp.exp(p[1] * xc)  # noqa: E731
        p0 = np.array([1.0, -1 / 30], np.float32)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = generic_lm_pallas(model, x, Y, p0, block_n=256)
        popt = np.asarray(popt)
        assert np.abs(popt[:, 1] - b).max() < 1e-4
        assert np.asarray(r2).min() > 0.999

    def test_nan_semantics_all_zero_and_bounds(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.generic_lm_pallas import generic_lm_pallas

        x, Y, _ = _offset_exp_data(N=256)
        Y[7] = 0.0
        Y[11, 2] = 99.0  # out of bounds
        p0 = np.array([1.0, -1 / 30, 0.0], np.float32)
        with pltpu.force_tpu_interpret_mode():
            popt, r2, conv = generic_lm_pallas(
                _offset_exp, x, Y, p0, y_bounds=(-1.0, 10.0), block_n=256
            )
        popt = np.asarray(popt)
        assert np.all(np.isnan(popt[7])) and np.asarray(r2)[7] == 0
        assert np.all(np.isnan(popt[11])) and np.asarray(r2)[11] == 0

    def test_per_voxel_p0(self):
        from jax.experimental.pallas import tpu as pltpu

        from dosma_tpu.ops.generic_lm_pallas import generic_lm_pallas

        x, Y, (a, b, c) = _offset_exp_data(N=256)
        p0 = np.stack(
            [np.ones_like(a), np.full_like(b, -1 / 30), np.zeros_like(c)], axis=1
        )
        with pltpu.force_tpu_interpret_mode():
            popt, _, conv = generic_lm_pallas(
                _offset_exp, x, Y, p0, max_iter=60, block_n=256
            )
        popt = np.asarray(popt)
        ok = np.isfinite(popt[:, 1])
        assert ok.mean() > 0.95
        assert np.abs(popt[ok, 1] - b[ok]).max() < 1e-3

    def test_p_greater_than_4_rejected(self):
        from dosma_tpu.ops.generic_lm_pallas import generic_lm_pallas

        x = np.arange(6, dtype=np.float32)
        Y = np.ones((8, 6), np.float32)
        with pytest.raises(ValueError, match="P <= 4"):
            generic_lm_pallas(
                lambda xc, p: sum(p), x, Y, np.ones(5, np.float32)
            )
