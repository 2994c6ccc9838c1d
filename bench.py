"""dosma_tpu benchmark: north-star monoexponential fit throughput.

Runs the flagship batched-LM relaxometry fit on a synthetic
512x512x64 x 4-echo volume (BASELINE.md config) on the default device and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the speedup over the reference implementation's
per-voxel ``scipy.optimize.curve_fit`` loop
(``/root/reference/dosma/core/fitting.py:853-868``), whose rate is measured
locally on a subsample and extrapolated.
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: first-ever run pays the (slow, tunneled)
# TPU compiles; later processes reuse them.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dosma_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _bench_tpu(N: int, T: int, iters: int = 3):
    import jax
    import jax.numpy as jnp

    from dosma_tpu.ops.nlls import batched_polyfit, lm_fit

    rs = np.random.RandomState(0)
    x = np.array([10.0, 20.0, 30.0, 40.0], np.float32)[:T]
    b = -1 / (rs.rand(N).astype(np.float32) * 70 + 10)
    Y = np.exp(b[:, None] * x[None, :]).astype(np.float32)

    p0 = np.array([1.0, -1 / 30], np.float32)
    # Canonical device layout: echoes x voxels (voxel axis on lanes).
    Yd = jax.device_put(jnp.asarray(np.ascontiguousarray(Y.T)))

    # Production path: log-linear polyfit seed + fused Pallas LM kernel
    # (falls back to the generic vmapped engine off-TPU).
    from dosma_tpu.ops.monoexp_pallas import monoexp_lm_pallas, pallas_supported

    @jax.jit
    def seed(yT):
        coef, _ = batched_polyfit(jnp.asarray(x), jnp.log(jnp.maximum(yT, 1e-10)), 1)
        return jnp.stack([jnp.exp(coef[1]), coef[0]], axis=-1)

    if pallas_supported():
        def run():
            p0v = seed(Yd)
            return monoexp_lm_pallas(x, Yd, p0v, max_iter=50, y_layout="tn")
    else:  # pragma: no cover - bench runs on TPU
        def mono(x_col, params):
            return params[0] * jnp.exp(params[1] * x_col)

        def run():
            return lm_fit(mono, x, Yd.T, p0, max_iter=50)

    # Warmup/compile (forced materialization via scalar readback —
    # block_until_ready alone is unreliable through remote-execution tunnels).
    popt, r2, conv = run()
    float(jnp.sum(popt))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        popt, r2, conv = run()
        float(jnp.sum(popt))  # forces the full computation to complete
        times.append(time.perf_counter() - t0)
    dt = min(times)

    conv_rate = float(np.asarray(conv).mean())
    err = float(np.abs(np.asarray(popt)[:, 1] - b).max())
    return dt, conv_rate, err


def _bench_scipy_baseline(T: int, n_sample: int = 200):
    """Reference hot loop: per-voxel scipy curve_fit (fitting.py:1026-1073)."""
    import scipy.optimize as sop

    rs = np.random.RandomState(1)
    x = np.array([10.0, 20.0, 30.0, 40.0])[:T]
    b = -1 / (rs.rand(n_sample) * 70 + 10)
    Y = np.exp(b[:, None] * x[None, :])

    t0 = time.perf_counter()
    for i in range(n_sample):
        sop.curve_fit(
            lambda x, a, b: a * np.exp(b * x), x, Y[i], p0=(1.0, -1 / 30),
            maxfev=100, ftol=1e-5,
        )
    dt = time.perf_counter() - t0
    return n_sample / dt  # voxels/sec


def _bench_unet(B: int = 16, H: int = 384, W: int = 384, iters: int = 4):
    """Second headline metric: U-Net segmentation slices/sec (ref keras
    ``model.predict`` with batch 16, ``oaiunet2d.py:160``)."""
    import jax
    import jax.numpy as jnp

    from dosma_tpu.models.unet2d import init_unet2d_params, unet2d_forward

    params = init_unet2d_params(jax.random.PRNGKey(0), num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, 1), jnp.float32)
    fwd = jax.jit(unet2d_forward)
    out = fwd(params, x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return B / dt


def main():
    N = 512 * 512 * 64
    T = 4

    dt, conv_rate, err = _bench_tpu(N, T)
    voxels_per_sec = N / dt
    unet_slices_per_sec = _bench_unet()

    scipy_rate = _bench_scipy_baseline(T)
    vs_baseline = voxels_per_sec / scipy_rate

    print(
        json.dumps(
            {
                "metric": "monoexp_fit_voxels_per_sec_512x512x64x4",
                "value": round(voxels_per_sec, 1),
                "unit": "voxels/sec",
                "vs_baseline": round(vs_baseline, 1),
                "extra": {
                    "fit_seconds": round(dt, 4),
                    "north_star_target_seconds": 1.0,
                    "converged_fraction": round(conv_rate, 4),
                    "max_param_err_vs_truth": err,
                    "scipy_baseline_voxels_per_sec": round(scipy_rate, 1),
                    "unet_seg_slices_per_sec_384x384_b16": round(unet_slices_per_sec, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
