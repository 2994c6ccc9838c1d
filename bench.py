"""dosma_tpu benchmark suite: all five BASELINE.md configs on the default device.

Headline metric (printed as the ONE JSON line) is the north-star batched-LM
relaxometry fit on a synthetic noisy 512x512x64 x 4-echo volume:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

``vs_baseline`` is the speedup over the reference implementation's per-voxel
``scipy.optimize.curve_fit`` loop (``/root/reference/dosma/core/fitting.py:853-868``),
measured locally on a subsample of the SAME noisy data and extrapolated.

``extra`` carries every BASELINE.md config:

1. noisy monoexp fit (headline) + scipy-parity RMSE on a shared subsample,
2. qDESS e2e: DICOM bytes on disk -> grouped echoes -> analytic T2 map,
3. CubeQuant e2e: interregistration to a target + voxelwise T1rho fit,
4. IWOAI U-Net full-volume segmentation,
5. bilateral-knee pipeline: 2x (segment + T2 map + femoral cartilage metrics),
plus a single-pair affine registration throughput row.

Environment notes: host<->device transfers ride an ~8 MB/s tunnel in this
test rig, so e2e configs (2-5) are tunnel-I/O bound here and would be
substantially faster on a locally attached chip; the pure-compute rows
(config 1, unet slices/s) are tunnel-independent.
"""

import json
import os
import shutil
import tempfile
import time

import numpy as np

# Persistent XLA compilation cache: first-ever run pays the (slow, tunneled)
# TPU compiles; later processes reuse them. NOTE: env vars are too late here
# — the axon sitecustomize imports jax at interpreter startup (before this
# file runs), so the cache must be enabled through jax.config (same trap as
# JAX_PLATFORMS; see DEVNOTES).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dosma_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dosma_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass


_enable_compile_cache()

NOISE_SIGMA = 0.005  # additive gaussian noise, a=1.0 signal scale


def _readback(x):
    """Force full materialization (block_until_ready alone can return early
    through remote-execution tunnels)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _best_of(run, n=2):
    """Min-by-elapsed over ``n`` timed ``run()`` calls (first element of the
    returned tuple = elapsed seconds). E2e walls on this rig swing ~2x with
    tunnel/host load; min-of-n keeps the captured number a property of the
    code rather than of the rig's moment.

    Every call's [min, max, n] lands in ``_best_of.spreads`` (reset per
    bench step by ``main``) and is emitted as ``timing_spreads`` next to
    each config's numbers — the README's ranges are reproducible from the
    captured JSON, not from a favorable pass (VERDICT r4 item 4)."""
    best = run()
    lo = hi = best[0]
    for _ in range(n - 1):
        r = run()
        lo, hi = min(lo, r[0]), max(hi, r[0])
        if r[0] < best[0]:
            best = r
    _best_of.spreads.append([round(lo, 3), round(hi, 3), n])
    return best


_best_of.spreads = []


def _marginal(fn, iters=3):
    """Device-marginal cost of ``fn`` (a zero-arg callable returning a device
    array): time TWO back-to-back calls under one scalar readback minus ONE
    call, min over ``iters``. Crucially, BOTH readback programs — including
    the two-result combiner — are compiled during warmup: the r2 bench
    timed the combiner's first call, so its multi-second tunnel compile
    landed in the "marginal" number (config2 reported 79.8 s for an 0.8 s
    computation).
    """

    def _two():
        va, vb = fn(), fn()
        return _readback(va.ravel()[0] + vb.ravel()[0])

    _readback(fn())  # warm fn + single-readback program
    _two()  # warm the two-call combiner program
    ones, twos = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        _readback(fn())
        ones.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _two()
        twos.append(time.perf_counter() - t0)
    return max(min(twos) - min(ones), 0.0)


# ----------------------------------------------------------------------
# Config 1 (headline): noisy monoexponential fit, 512x512x64 x 4 echoes
# ----------------------------------------------------------------------
def _bench_monoexp(N: int, T: int, iters: int = 5, n_parity: int = 10000):
    """``n_parity``: size of the scipy oracle subsample used for BOTH the
    parity RMSE and the extrapolated CPU-baseline rate — 10k voxels
    (~4 s of scipy) so the vs_baseline headline is measured, not guessed."""
    import jax
    import jax.numpy as jnp

    from dosma_tpu.ops.monoexp_pallas import monoexp_lm_pallas, pallas_supported
    from dosma_tpu.ops.nlls import lm_fit

    rs = np.random.RandomState(0)
    x = np.array([10.0, 20.0, 30.0, 40.0], np.float32)[:T]
    b = -1 / (rs.rand(N).astype(np.float32) * 70 + 10)
    Y = np.exp(b[:, None] * x[None, :]) + NOISE_SIGMA * rs.randn(N, T)
    Y = Y.astype(np.float32)

    # Canonical device layout: echoes x voxels (voxel axis on lanes).
    Yd = jax.device_put(jnp.asarray(np.ascontiguousarray(Y.T)))
    b_dev = jax.device_put(jnp.asarray(b))

    if pallas_supported():
        def run():
            # p0=None → log-linear polyfit seed computed IN the kernel:
            # seed + fit is one program dispatch (one read of y, period).
            return monoexp_lm_pallas(x, Yd, None, max_iter=50, y_layout="tn")
    else:  # pragma: no cover - bench runs on TPU
        p0 = np.array([1.0, -1 / 30], np.float32)

        def mono(x_col, params):
            return params[0] * jnp.exp(params[1] * x_col)

        def run():
            return lm_fit(mono, x, Yd.T, p0, max_iter=50)

    popt, r2, conv = run()
    _readback(popt)  # warmup/compile

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        popt, r2, conv = run()
        _readback(popt)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # Marginal (device-only) fit cost: time SIX back-to-back fits under one
    # readback, subtract the single-fit wall, divide by the five extra —
    # isolates the chip's execution time from the rig's fixed
    # dispatch+readback round trip (~30 ms on this tunnel, measured via a
    # scalar-sum round trip; see DEVNOTES). Averaging over 5 extra fits
    # (vs the old 1) cuts the tunnel-jitter variance on the subtraction
    # ~5x — at ~4 ms/fit the old 2-fit protocol swung 4-13 ms run-to-run.
    k_extra = 5
    times2 = []
    for _ in range(iters):
        t0 = time.perf_counter()
        acc = None
        for _k in range(k_extra + 1):
            p_k, _, _ = run()
            acc = p_k if acc is None else acc + p_k
        _readback(acc)
        times2.append(time.perf_counter() - t0)
    dt_marginal = max((min(times2) - dt) / k_extra, 0.0)

    # Stats computed on-device (D2H of the full 16.7M-row popt would be
    # tunnel-bound); only scalars and the parity subsample come back.
    conv_rate = float(jnp.mean(conv.astype(jnp.float32)))
    finite = jnp.all(jnp.isfinite(popt), axis=1)
    nonfinite_frac = float(jnp.mean(~finite))
    err_b = float(
        jnp.max(jnp.where(finite, jnp.abs(popt[:, 1] - b_dev), 0.0))
    )

    # scipy parity on the SAME noisy voxels: both estimators minimize the
    # same least-squares objective, so they must agree to f32 tolerance.
    import scipy.optimize as sop

    idx = rs.choice(N, n_parity, replace=False)
    ours = np.asarray(popt[jnp.asarray(idx)], np.float64)
    t0 = time.perf_counter()
    ref = np.empty((n_parity, 2))
    for j, i in enumerate(idx):
        ref[j] = sop.curve_fit(
            lambda xx, a, bb: a * np.exp(bb * xx),
            np.float64(x), np.float64(Y[i]), p0=(1.0, -1 / 30), maxfev=500,
        )[0]
    scipy_rate = n_parity / (time.perf_counter() - t0)
    tc_ours, tc_ref = -1.0 / ours[:, 1], -1.0 / ref[:, 1]
    parity_rmse = float(np.sqrt(np.mean(((tc_ours - tc_ref) / tc_ref) ** 2)))
    assert parity_rmse < 5e-3, f"scipy parity broken: rel RMSE {parity_rmse}"

    return {
        "fit_seconds": round(dt, 4),
        "voxels_per_sec": round(N / dt, 1),
        "fit_seconds_device_marginal": round(dt_marginal, 4),
        "voxels_per_sec_device_marginal": round(N / dt_marginal, 1) if dt_marginal > 1e-4 else None,
        "converged_fraction": round(conv_rate, 4),
        "noise_sigma": NOISE_SIGMA,
        "max_b_err_vs_truth": round(err_b, 6),
        "nonfinite_popt_fraction": nonfinite_frac,
        "scipy_parity_rel_rmse_tc": round(parity_rmse, 6),
        "scipy_baseline_voxels_per_sec": round(scipy_rate, 1),
    }


# ----------------------------------------------------------------------
# Config 2: qDESS e2e — DICOM bytes -> grouped echoes -> analytic T2 map
# ----------------------------------------------------------------------
def _bench_qdess_e2e(shape=(384, 384, 80)):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from util import write_dicom_series

    from dosma_tpu.core.io.dicom.dataset import Tag
    from dosma_tpu.scan_sequences.mri.qdess import QDess
    from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

    d = tempfile.mkdtemp(prefix="dosma_bench_qdess_")
    try:
        write_dicom_series(
            os.path.join(d, "src"), shape=shape, n_echos=2, plane="sagittal",
            extra={Tag(0x0019, 0x10B6): 3132.0, Tag(0x0019, 0x10B7): 1560.0},
        )
        import jax

        on_tpu = jax.default_backend() != "cpu"

        def run():
            # Phase-decomposed e2e (VERDICT r2 weak #1: without a transfer-
            # isolated split, rig D2H variance is indistinguishable from a
            # compute regression).
            t0 = time.perf_counter()
            # to_device: H2D of echo k overlaps parsing of echo k+1, and the
            # analytic T2 physics runs on the already-resident arrays.
            scan = QDess.from_dicom(
                os.path.join(d, "src"), group_by="EchoNumbers",
                to_device=True if on_tpu else None,
            )
            t_load = time.perf_counter() - t0
            fc = FemoralCartilage()
            t1 = time.perf_counter()
            # Compute WITHOUT tissue registration: add_quantitative_value
            # starts the map's async D2H prefetch, which this microbench
            # would otherwise time inside the "compute" window (there is no
            # host work here for the async copy to overlap with).
            t2 = scan.generate_t2_map(suppress_fat=False, t1=fc.T1_EXPECTED)
            vmap_vol = t2.volumetric_map.volume
            _readback(vmap_vol)  # device completion WITHOUT the full D2H
            t_compute = time.perf_counter() - t1
            t1 = time.perf_counter()
            fc.add_quantitative_value(t2)  # realistic flow: starts async D2H
            _ = np.asarray(vmap_vol)
            t_readback = time.perf_counter() - t1
            return time.perf_counter() - t0, t_load, t_compute, t_readback, scan

        dt_cold, *_ = run()  # warmup/compile (same policy as configs 1/3/4)
        dt, t_load, t_compute, t_readback, scan = _best_of(run)

        # Device-marginal T2 physics: two back-to-back maps under one scalar
        # readback minus one — the chip cost of the fused T2 program alone
        # (no tissue: registration would start a full D2H per call).
        _t1_expected = FemoralCartilage().T1_EXPECTED

        def t2_only():
            return scan.generate_t2_map(
                suppress_fat=False, t1=_t1_expected
            ).volumetric_map.volume

        t2_marginal = _marginal(t2_only)

        nvox = int(np.prod(shape))
        return {
            "shape": list(shape),
            "e2e_seconds": round(dt, 3),
            "dicom_load_seconds": round(t_load, 3),
            "t2_compute_seconds": round(t_compute, 3),
            "map_readback_seconds": round(t_readback, 3),
            "t2_seconds_device_marginal": round(t2_marginal, 4),
            "voxels_per_sec": round(nvox / dt, 1),
            "voxels_per_sec_device_marginal": (
                round(nvox / t2_marginal, 1) if t2_marginal > 1e-4 else None
            ),
            "e2e_seconds_incl_compile": round(dt_cold, 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _bench_qdess_metrics_only(shape=(384, 384, 80)):
    """Config 2b: qDESS -> per-region metrics DataFrame with the T2 map
    KEPT IN HBM (VERDICT r4 item 3). Only the masked voxels' compressed
    gather crosses D2H — ``to_metrics`` never reads the full map back."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from util import write_dicom_series

    from dosma_tpu.core.io.dicom.dataset import Tag
    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.scan_sequences.mri.qdess import QDess
    from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

    d = tempfile.mkdtemp(prefix="dosma_bench_qdess_m_")
    try:
        write_dicom_series(
            os.path.join(d, "src"), shape=shape, n_echos=2, plane="sagittal",
            extra={Tag(0x0019, 0x10B6): 3132.0, Tag(0x0019, 0x10B7): 1560.0},
        )
        import jax

        on_tpu = jax.default_backend() != "cpu"
        # Cartilage-like mask (~2% of voxels) standing in for a
        # segmentation output; built once, outside the timed region, the
        # way a cached mask would be.
        rs = np.random.RandomState(9)
        mask_arr = np.zeros(shape, np.int32)
        mask_arr[150:250, 150:250, :] = (rs.rand(100, 100, shape[2]) < 0.3).astype(np.int32)
        t1_expected = FemoralCartilage().T1_EXPECTED

        def run():
            t0 = time.perf_counter()
            scan = QDess.from_dicom(
                os.path.join(d, "src"), group_by="EchoNumbers",
                to_device=True if on_tpu else None,
            )
            mask_mv = MedicalVolume(mask_arr, scan.volumes[0].affine)
            t2 = scan.generate_t2_map(suppress_fat=False, t1=t1_expected)
            df = t2.to_metrics(mask=mask_mv, bounds=(0, 100))
            dt = time.perf_counter() - t0
            still_on_device = not isinstance(t2.volumetric_map.volume, np.ndarray)
            return dt, df, still_on_device

        run()  # warmup/compile
        dt, df, on_dev = _best_of(run)
        return {
            "shape": list(shape),
            "e2e_seconds": round(dt, 3),
            "map_readback_seconds": 0.0 if (on_dev or not on_tpu) else None,
            "map_stays_on_device": bool(on_dev) if on_tpu else None,
            "n_regions": int(len(df)),
            "masked_voxels": int(df[df["Category"] == "total"]["# Voxels"].iloc[0]),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------------------------
# Config 3: CubeQuant e2e — interregister to target + voxelwise T1rho fit
# ----------------------------------------------------------------------
def _bench_cubequant_e2e(shape=(192, 192, 48)):
    from dosma_tpu.core.io.nifti_io import NiftiWriter
    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.core.orientation import SAGITTAL, to_affine
    from dosma_tpu.scan_sequences.mri.cube_quant import CubeQuant

    rs = np.random.RandomState(3)
    affine = to_affine(SAGITTAL, (0.5, 0.5, 1.0))
    spin_lock_times = [1.0, 10.0, 30.0, 60.0]
    t1rho = rs.rand(*shape).astype(np.float32) * 80 + 20

    base = np.zeros(shape, np.float32)
    base[shape[0] // 4: -shape[0] // 4, shape[1] // 4: -shape[1] // 4, 2:-2] = 1000.0
    base += 50.0 * rs.rand(*shape).astype(np.float32)

    vols = []
    for i, tsl in enumerate(spin_lock_times):
        sig = base * np.exp(-tsl / t1rho)
        # Later spin locks carry a small rigid shift the registration removes.
        sig = np.roll(sig, (i, -i, 0), axis=(0, 1, 2)) if i else sig
        vols.append(MedicalVolume(sig, affine))

    d = tempfile.mkdtemp(prefix="dosma_bench_cq_")
    try:
        target_path = os.path.join(d, "target.nii.gz")
        NiftiWriter().save(vols[0], target_path)

        def run():
            scan = CubeQuant(list(vols), spin_lock_times=spin_lock_times)
            scan.temp_path = os.path.join(d, "tmp")
            t0 = time.perf_counter()
            scan.interregister(target_path)
            t_reg = time.perf_counter() - t0
            t1 = time.perf_counter()
            qmap = scan.generate_t1_rho_map()
            vmap_vol = qmap.volumetric_map.volume
            _readback(vmap_vol)  # device completion WITHOUT the full D2H
            t_fit = time.perf_counter() - t1
            t1 = time.perf_counter()
            _ = np.asarray(vmap_vol)
            t_readback = time.perf_counter() - t1
            return time.perf_counter() - t0, t_reg, t_fit, t_readback, scan

        dt_cold, *_ = run()  # warmup/compile (same policy as configs 1 and 4)
        dt, t_reg, t_fit, t_readback, scan = _best_of(run)

        # Device-marginal T1rho fit (post-registration volumes reused).
        def fit_only():
            return scan.generate_t1_rho_map().volumetric_map.volume

        fit_marginal = _marginal(fit_only)

        nvox = int(np.prod(shape))
        return {
            "shape": list(shape),
            "e2e_seconds": round(dt, 3),
            "interregister_seconds": round(t_reg, 3),
            "t1rho_fit_seconds": round(t_fit, 3),
            "map_readback_seconds": round(t_readback, 3),
            "t1rho_seconds_device_marginal": round(fit_marginal, 4),
            "voxels_per_sec": round(nvox / dt, 1),
            "e2e_seconds_incl_compile": round(dt_cold, 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------------------------
# Config 4: IWOAI U-Net full-volume segmentation
# ----------------------------------------------------------------------
def _load_iwoai_model(d, input_shape=(384, 384, 1)):
    import jax

    from dosma_tpu.models.oaiunet2d import IWOAIOAIUnet2DNormalized
    from dosma_tpu.models.unet2d import init_unet2d_params
    from dosma_tpu.models.weights import save_keras_unet2d_weights

    wpath = os.path.join(d, "iwoai-2019-unet2d-normalized_fc-tc-pc-men_weights.h5")
    save_keras_unet2d_weights(
        wpath, init_unet2d_params(jax.random.PRNGKey(0), num_classes=4)
    )
    return IWOAIOAIUnet2DNormalized(input_shape, wpath)


def _bench_iwoai_fullvol(shape=(384, 384, 64)):
    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.core.orientation import SAGITTAL, to_affine

    rs = np.random.RandomState(4)
    vol = MedicalVolume(
        rs.rand(*shape).astype(np.float32) * 1000, to_affine(SAGITTAL, (0.3, 0.3, 0.7))
    )
    d = tempfile.mkdtemp(prefix="dosma_bench_seg_")
    try:
        model = _load_iwoai_model(d)
        masks = model.generate_mask(vol)  # warmup/compile

        def timed_e2e():
            t0 = time.perf_counter()
            m = model.generate_mask(vol)
            return time.perf_counter() - t0, m

        dt, masks = _best_of(timed_e2e)
        assert set(masks) == {"fc", "tc", "pc", "men"}

        # Device-resident variant: the volume is already in HBM (the
        # load_to_device prefetch path) — isolates framework overhead from
        # the H2D tunnel cost.
        import jax

        vol_dev = vol.to("tpu") if jax.default_backend() != "cpu" else vol
        model.generate_mask(vol_dev)  # warmup (device input program)

        def timed_dev():
            t0 = time.perf_counter()
            model.generate_mask(vol_dev)
            return (time.perf_counter() - t0,)

        (dt_dev,) = _best_of(timed_dev)

        # Compute-only decomposition (VERDICT r2 weak #2: the e2e/device gap
        # needs an explicit split): the fused whiten+forward+threshold+
        # bitpack program over the same batches under a SCALAR readback —
        # what remains of dt_dev is packed-mask D2H + host-side reformat.
        import jax.numpy as jnp

        from dosma_tpu.models.unet2d import unet2d_predict_mask_packed

        params = model.seg_model.params
        arr = np.transpose(np.asarray(vol.volume, np.float32), (2, 0, 1))[..., None]
        vd = jax.device_put(jnp.asarray(arr))
        mean, std, thr = jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.5)
        B = int(model.batch_size)

        def fwd_all():
            return [
                unet2d_predict_mask_packed(params, vd[i:i + B], mean, std, thr)
                for i in range(0, arr.shape[0], B)
            ]

        def _timed():
            outs = fwd_all()
            _readback(sum(o.ravel()[0] for o in outs))

        _timed()  # warm EVERY program incl. the combining readback (the r2
        # bench compiled the combiner inside the timed region, so its
        # multi-second tunnel compile made forward "compute" look slower
        # than the full device-resident pipeline)
        ts_fwd = []
        for _ in range(3):
            t0 = time.perf_counter()
            _timed()
            ts_fwd.append(time.perf_counter() - t0)
        dt_fwd = min(ts_fwd)

        return {
            "shape": list(shape),
            "e2e_seconds": round(dt, 3),
            "slices_per_sec_e2e": round(shape[2] / dt, 1),
            "e2e_seconds_device_resident": round(dt_dev, 3),
            "slices_per_sec_device_resident": round(shape[2] / dt_dev, 1),
            "forward_compute_seconds": round(dt_fwd, 3),
            "slices_per_sec_forward_compute": round(shape[2] / dt_fwd, 1),
            "mask_d2h_postprocess_seconds": round(max(dt_dev - dt_fwd, 0.0), 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------------------------
# Config 5: bilateral-knee pipeline (2x segment + T2 map + FC metrics)
# ----------------------------------------------------------------------
def _fc_annulus_mask(shape):
    """Inferior femoral-condyle arc: the geometry FemoralCartilage's
    circle-fit/angular-binning analytics expect."""
    h, w, ddim = shape
    yv, xv = np.mgrid[0:h, 0:w]
    cy, cx, R = h * 0.45, w * 0.5, h * 0.3
    rad = np.sqrt((yv - cy) ** 2 + (xv - cx) ** 2)
    annulus = (rad > R * 0.8) & (rad < R * 1.05) & (yv > cy)
    return np.repeat(annulus[..., None], ddim, axis=2).astype(np.uint8)


def _bench_bilateral_pipeline(shape=(384, 384, 32)):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from util import write_dicom_series

    from dosma_tpu.core.io.dicom.dataset import Tag
    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.scan_sequences.mri.qdess import QDess
    from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

    d = tempfile.mkdtemp(prefix="dosma_bench_bilat_")
    try:
        for knee in ("left", "right"):
            write_dicom_series(
                os.path.join(d, knee), shape=shape, n_echos=2, plane="sagittal",
                extra={Tag(0x0019, 0x10B6): 3132.0, Tag(0x0019, 0x10B7): 1560.0},
            )
        model = _load_iwoai_model(d)

        import jax

        on_tpu = jax.default_backend() != "cpu"

        def run():
            stages = {
                "load": 0.0, "segment": 0.0, "t2_map": 0.0,
                "map_readback": 0.0, "analytics": 0.0,
            }
            t00 = time.perf_counter()
            for knee in ("left", "right"):
                t0 = time.perf_counter()
                scan = QDess.from_dicom(
                    os.path.join(d, knee), group_by="EchoNumbers",
                    to_device=True if on_tpu else None,
                )
                stages["load"] += time.perf_counter() - t0
                fc = FemoralCartilage()
                t0 = time.perf_counter()
                scan.segment(model, fc, use_rss=True)
                stages["segment"] += time.perf_counter() - t0
                # Untrained weights produce an unusable mask; swap in a
                # plausible condyle arc so the tissue analytics run for real.
                mvol = scan.volumes[0]
                t0 = time.perf_counter()
                fc.set_mask(
                    MedicalVolume(_fc_annulus_mask(mvol.shape), mvol.affine),
                    use_largest_cc=False,
                    split_regions=True,
                )
                stages["analytics"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                # Compute without tissue registration (same protocol as
                # config2): registering starts the map's async D2H, which
                # would serialize with the completion probe and land in this
                # stage instead of map_readback.
                t2_qv = scan.generate_t2_map(suppress_fat=False, t1=fc.T1_EXPECTED)
                vmap_vol = t2_qv.volumetric_map.volume
                if on_tpu:
                    _readback(vmap_vol)  # device completion, not the full D2H
                stages["t2_map"] += time.perf_counter() - t0
                # FemoralCartilage analytics are compressed: the map stays
                # device-resident and only the masked voxel values cross D2H
                # (inside the analytics stage). No full-volume readback is
                # required by this pipeline anymore; this stage now times
                # just the qv registration (≈0).
                t0 = time.perf_counter()
                fc.add_quantitative_value(t2_qv)
                stages["map_readback"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                fc.calc_quant_vals()
                stages["analytics"] += time.perf_counter() - t0
            return time.perf_counter() - t00, stages

        dt_cold, _ = run()  # warmup/compile (same policy as configs 1/3/4)
        dt, stages = _best_of(run)
        return {
            "shape_per_knee": list(shape),
            "e2e_seconds_2_knees": round(dt, 3),
            "e2e_seconds_2_knees_incl_compile": round(dt_cold, 3),
            # Per-stage split (summed over both knees): load includes the
            # DICOM parse + H2D prefetch; segment includes mask D2H + the
            # (garbage-mask) largest-CC/region-split the reference flow also
            # pays; t2_map is device compute; map_readback is ≈0 (compressed
            # analytics — the masked-voxel gather D2H lands in analytics);
            # analytics is region math on compressed index lists.
            "stage_seconds": {k: round(v, 3) for k, v in stages.items()},
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------------------------
# Registration throughput: single-pair affine recovery
# ----------------------------------------------------------------------
def _bench_registration(shape=(192, 192, 48)):
    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.core.registration import register

    rs = np.random.RandomState(5)
    fixed = np.zeros(shape, np.float32)
    fixed[shape[0] // 4: -shape[0] // 4, shape[1] // 4: -shape[1] // 4, 4:-4] = 1000.0
    fixed += 50.0 * rs.rand(*shape).astype(np.float32)
    moving = np.roll(fixed, (4, -3, 1), axis=(0, 1, 2))
    aff = np.diag([0.5, 0.6, 2.0, 1.0])

    fv, mv = MedicalVolume(fixed, aff), MedicalVolume(moving, aff)
    d = tempfile.mkdtemp(prefix="dosma_bench_reg_")
    try:
        register(fv, mv, "affine", output_path=d, num_workers=0)  # warmup/compile

        def timed(**kw):
            t0 = time.perf_counter()
            register(fv, mv, "affine", output_path=d, num_workers=0, **kw)
            return (time.perf_counter() - t0,)

        (dt,) = _best_of(timed)
        # Transform-only variant: no result-file write, so no D2H/gzip of the
        # warped volume — the in-process registration cost itself.
        (dt_noio,) = _best_of(lambda: timed(save_volumes=False))
        return {
            "shape": list(shape),
            "affine_pair_seconds": round(dt, 3),
            "affine_pair_no_io_seconds": round(dt_noio, 3),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------------------------
# Full-grid warp throughput (the apply_warp / interregister inner cost)
# ----------------------------------------------------------------------
def _bench_warp(shape=(192, 192, 48)):
    """Full-grid trilinear warp of one volume under an affine map — the
    gather-bound primitive behind apply_warp and every stage-output
    resample (VERDICT r2 weak #4: ~8 Mpts/s via XLA scalar gathers)."""
    import jax

    from dosma_tpu.ops.registration import warp_volume

    rs = np.random.RandomState(3)
    vol = rs.rand(*shape).astype(np.float32)
    aff = np.diag([0.5, 0.5, 2.0, 1.0])
    ang = 0.07
    M = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0, 1.2],
            [np.sin(ang), np.cos(ang), 0, -0.7],
            [0, 0, 1.0, 0.4],
            [0, 0, 0, 1.0],
        ],
        np.float32,
    )
    vd = jax.device_put(vol)

    def one():
        return warp_volume(vd, M, aff, aff, shape)

    _readback(one())
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        r1, r2, r3 = one(), one(), one()
        _readback(r1.ravel()[0] + r2.ravel()[0] + r3.ravel()[0])
        times.append((time.perf_counter() - t0) / 3)
    dt = min(times)
    n = int(np.prod(shape))
    return {
        "shape": list(shape),
        "warp_seconds": round(dt, 4),
        "warp_mpts_per_sec": round(n / dt / 1e6, 1),
    }


# ----------------------------------------------------------------------
# B-spline (FFD) registration throughput + recovery
# ----------------------------------------------------------------------
def _bench_bspline_registration(shape=(192, 192, 48)):
    """Deformable stage on a known smooth deformation (VERDICT r2 weak #5 /
    r3 next-1): residual must drop >90% AND the recovered displacement
    field must match the exact inverse of the known warp to <0.3 voxels
    mean. (The residual floor under the TRUE field is 4.4% — linear
    interpolation loss of the phantom construction — so <10% is ~2x the
    floor.)"""
    import jax.numpy as jnp
    from scipy import ndimage

    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.core.registration import register
    from dosma_tpu.ops.bspline import bspline_displacement

    rs = np.random.RandomState(7)
    # Smooth textured phantom (blobs) — MI/MSE both lock onto it.
    fixed = ndimage.gaussian_filter(rs.rand(*shape).astype(np.float32), 6.0)
    fixed = (fixed - fixed.min()) / (fixed.max() - fixed.min()) * 1000.0

    # Known smooth deformation: ±2-voxel sinusoidal displacement field.
    i, j, k = np.meshgrid(*[np.arange(s, dtype=np.float32) for s in shape], indexing="ij")

    def _d_field(y0, y1, y2):
        d0 = 2.0 * np.sin(2 * np.pi * y1 / shape[1]) * np.cos(2 * np.pi * y2 / (2 * shape[2]))
        d1 = -2.0 * np.cos(2 * np.pi * y0 / shape[0]) * np.sin(2 * np.pi * y2 / (2 * shape[2]))
        return d0, d1

    disp0, disp1 = _d_field(i, j, k)
    moving = ndimage.map_coordinates(
        fixed, [i + disp0, j + disp1, k], order=1, mode="constant"
    ).astype(np.float32)

    aff = np.diag([0.5, 0.6, 2.0, 1.0])
    fv, mv = MedicalVolume(fixed, aff), MedicalVolume(moving, aff)
    d = tempfile.mkdtemp(prefix="dosma_bench_bspl_")
    try:
        out = register(fv, mv, "bspline", output_path=d, return_volumes=True)  # warm

        def timed():
            t0 = time.perf_counter()
            register(fv, mv, "bspline", output_path=d, num_workers=0, save_volumes=False)
            return (time.perf_counter() - t0,)

        (dt,) = _best_of(timed)

        warped = np.asarray(out["volumes"][0].volume)
        c = tuple(slice(s // 8, -s // 8) for s in shape)  # interior crop
        res_before = float(np.sqrt(np.mean((moving[c] - fixed[c]) ** 2)))
        res_after = float(np.sqrt(np.mean((warped[c] - fixed[c]) ** 2)))

        # Displacement-field error against the EXACT inverse of the known
        # forward warp (fixed-point solve of T(x) + d(T(x)) = x), on an
        # interior eval grid.
        s0, s1, s2 = shape
        ii, jj, kk = np.mgrid[
            s0 // 8 : 7 * s0 // 8 : 6, s1 // 8 : 7 * s1 // 8 : 6, s2 // 8 : 7 * s2 // 8 : 3
        ].astype(np.float32)
        pts = np.stack([ii.ravel(), jj.ravel(), kk.ravel()])
        y = pts.copy()
        for _ in range(50):
            d0, d1 = _d_field(y[0], y[1], y[2])
            y = pts - np.stack([d0, d1, np.zeros_like(d0)])
        u_true = y - pts

        tdata = json.load(open(out["outputs"][0].transform[0]))
        ctrl = np.asarray(tdata["ctrl"], np.float32)
        spv = np.asarray(tdata["spacing_vox"], np.float32)
        disp_mm = np.asarray(
            bspline_displacement(jnp.asarray(ctrl), jnp.asarray(pts), jnp.asarray(spv))
        )
        u_rec = np.linalg.inv(aff)[:3, :3] @ disp_mm
        err_vox = np.linalg.norm(u_rec - u_true, axis=0)
        mean_err = float(err_vox.mean())

        assert res_after < 0.1 * res_before, (
            f"bspline recovery failed: residual {res_after:.2f} vs initial {res_before:.2f}"
        )
        assert mean_err < 0.3, f"bspline displacement error {mean_err:.3f} vox"
        return {
            "shape": list(shape),
            "bspline_pair_seconds": round(dt, 3),
            "residual_rmse_before": round(res_before, 3),
            "residual_rmse_after": round(res_after, 3),
            "mean_disp_err_vox": round(mean_err, 4),
            "p95_disp_err_vox": round(float(np.percentile(err_vox, 95)), 4),
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ----------------------------------------------------------------------
# U-Net pure-compute slices/s (tunnel-independent; continuity with r1)
# ----------------------------------------------------------------------
def _bench_unet(B: int = 16, H: int = 384, W: int = 384, iters: int = 4):
    import jax
    import jax.numpy as jnp

    from dosma_tpu.models.unet2d import init_unet2d_params, unet2d_forward

    params = init_unet2d_params(jax.random.PRNGKey(0), num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, 1), jnp.float32)
    fwd = jax.jit(unet2d_forward)
    _readback(fwd(params, x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, x)
    _readback(out)
    dt = (time.perf_counter() - t0) / iters
    return round(B / dt, 1)


# ----------------------------------------------------------------------
# Biexponential fit throughput (fused Pallas 4-param kernel)
# ----------------------------------------------------------------------
def _bench_biexp(N: int = 512 * 512 * 16, T: int = 8, iters: int = 3):
    import jax
    import jax.numpy as jnp

    from dosma_tpu.ops.biexp_pallas import biexp_lm_pallas, pallas_supported

    if not pallas_supported():  # pragma: no cover - bench runs on TPU
        return {"skipped": "no TPU backend"}

    rs = np.random.RandomState(0)
    x = np.linspace(0.0, 10.0, T).astype(np.float32)
    a1 = 0.8 + 0.4 * rs.rand(N).astype(np.float32)
    b1 = -(0.4 + 0.2 * rs.rand(N).astype(np.float32))
    a2 = 0.3 + 0.3 * rs.rand(N).astype(np.float32)
    b2 = -(0.03 + 0.03 * rs.rand(N).astype(np.float32))
    Y = a1[:, None] * np.exp(b1[:, None] * x) + a2[:, None] * np.exp(b2[:, None] * x)
    Yd = jax.device_put(jnp.asarray(np.ascontiguousarray(Y.T.astype(np.float32))))
    p0 = np.array([1.0, -0.5, 0.4, -0.04], np.float32)

    def run():
        return biexp_lm_pallas(x, Yd, p0, max_iter=100, y_layout="tn")

    popt, r2, conv = run()
    _readback(popt)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        popt, r2, conv = run()
        _readback(popt)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "n_voxels": N,
        "n_echoes": T,
        "fit_seconds": round(dt, 4),
        "voxels_per_sec": round(N / dt, 1),
        "converged_fraction": round(float(jnp.mean(conv.astype(jnp.float32))), 4),
    }


def _bench_generic_lm(N: int = 512 * 512 * 16, T: int = 5, iters: int = 3):
    """3-param offset-exponential through the GENERIC Pallas LM kernel —
    the VERDICT r4 item 6 target: within ~2x of the monoexp kernel's
    voxels/s instead of the HBM-streaming rate. The HBM engine is timed
    alongside for the speedup attribution."""
    import jax
    import jax.numpy as jnp

    from dosma_tpu.ops.generic_lm_pallas import generic_lm_pallas, pallas_supported
    from dosma_tpu.ops.nlls import lm_fit

    if not pallas_supported():  # pragma: no cover - bench runs on TPU
        return {"skipped": "no TPU backend"}

    rs = np.random.RandomState(0)
    x = np.array([5.0, 15.0, 30.0, 50.0, 80.0], np.float32)[:T]
    a = 0.5 + rs.rand(N).astype(np.float32)
    b = -1 / (rs.rand(N).astype(np.float32) * 70 + 10)
    c = 0.2 * rs.rand(N).astype(np.float32)
    Y = a[:, None] * np.exp(b[:, None] * x) + c[:, None]
    Yd = jax.device_put(jnp.asarray(np.ascontiguousarray(Y.T.astype(np.float32))))
    model = lambda xc, p: p[0] * jnp.exp(p[1] * xc) + p[2]  # noqa: E731
    p0 = np.array([1.0, -1 / 30, 0.0], np.float32)

    def run():
        return generic_lm_pallas(model, x, Yd, p0, max_iter=60, y_layout="tn")

    popt, r2, conv = run()
    _readback(popt)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        popt, _, conv = run()
        _readback(popt)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    def run_hbm():
        return lm_fit(model, x, Yd.T, p0, max_iter=60)

    ph, _, _ = run_hbm()
    _readback(ph)
    t0 = time.perf_counter()
    ph, _, _ = run_hbm()
    _readback(ph)
    dt_hbm = time.perf_counter() - t0

    return {
        "n_voxels": N,
        "n_points": T,
        "fit_seconds": round(dt, 4),
        "voxels_per_sec": round(N / dt, 1),
        "hbm_engine_fit_seconds": round(dt_hbm, 4),
        "speedup_vs_hbm_engine": round(dt_hbm / dt, 2),
        "converged_fraction": round(float(jnp.mean(conv.astype(jnp.float32))), 4),
        "max_b_err": round(float(np.nanmax(np.abs(np.asarray(popt)[:, 1] - b))), 6),
    }


def _try(fn, *args, **kwargs):
    try:
        return fn(*args, **kwargs)
    except Exception as e:  # pragma: no cover - bench resilience
        return {"error": f"{type(e).__name__}: {e}"}


def _sanitize(obj):
    """Replace non-finite floats with None — NaN/Inf are not valid JSON."""
    import math

    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


# Watchdog: a hung device RPC (tunnel outage) blocks the main thread in C
# code where no signal/exception can reach it. If one config stalls past
# DOSMA_BENCH_STALL_SECONDS (default 1200), emit the JSON with everything
# collected so far and exit, so a mid-bench outage can't erase the headline.
_PROGRESS = {"stage": "startup", "t": time.time(), "results": {}, "done": False}


def _mark(name):
    import sys
    import time as _time

    _PROGRESS["stage"] = name
    _PROGRESS["t"] = time.time()
    print(f"[bench {_time.strftime('%H:%M:%S')}] {name}", file=sys.stderr, flush=True)


def _emit(results, aborted_stage=None):
    c1 = results.get("config1_monoexp_noisy") or {}
    value = c1.get("voxels_per_sec", 0.0)
    baseline = c1.get("scipy_baseline_voxels_per_sec") or 0.0
    extra = {"north_star_target_seconds": 1.0}
    extra.update(results)
    if aborted_stage is not None:
        extra["aborted"] = (
            f"stage '{aborted_stage}' stalled (device RPC hung — tunnel outage?); "
            "partial results emitted by watchdog"
        )
    print(
        json.dumps(
            _sanitize({
                "metric": "monoexp_fit_voxels_per_sec_512x512x64x4_noisy",
                "value": value,
                "unit": "voxels/sec",
                "vs_baseline": round(value / baseline, 1) if baseline else 0.0,
                "extra": extra,
            })
        ),
        flush=True,
    )


def _start_watchdog():
    import sys
    import threading

    stall = float(os.environ.get("DOSMA_BENCH_STALL_SECONDS", "1200"))

    def run():
        while not _PROGRESS["done"]:
            time.sleep(min(10.0, stall / 2))
            if not _PROGRESS["done"] and time.time() - _PROGRESS["t"] > stall:
                # Snapshot before iterating (the main thread may still be
                # mutating results), and survive any emit error — losing the
                # watchdog to a race would forfeit protection from a LATER
                # genuine hang.
                try:
                    snapshot = dict(_PROGRESS["results"])
                    if _PROGRESS["done"]:  # stage finished while we decided
                        return
                    print(
                        f"[bench] WATCHDOG: stage '{_PROGRESS['stage']}' stalled "
                        f">{stall:.0f}s; emitting partial results",
                        file=sys.stderr,
                        flush=True,
                    )
                    _emit(snapshot, aborted_stage=_PROGRESS["stage"])
                except Exception:  # pragma: no cover - keep watchdog alive
                    continue
                os._exit(0)

    threading.Thread(target=run, daemon=True).start()


def _bench_tunnel_health():
    """Rig provenance: measured scalar round-trip latency and bulk H2D/D2H
    bandwidth of the device link. Not a framework metric — recorded so that
    run-to-run swings in e2e walls (which include D2H readbacks) can be
    attributed to the rig instead of the code (the r2→r3 'qDESS regression'
    was exactly this)."""
    import jax
    import jax.numpy as jnp

    # Scalar RTT: dispatch a trivial op and read back one float.
    x = jax.device_put(np.float32(1.0))
    _readback(jnp.asarray(x))  # warm
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.asarray(x) + 1.0)
        rtts.append(time.perf_counter() - t0)

    # Bulk transfers: 16 MB each way.
    host = np.ones((4 * 1024 * 1024,), np.float32)
    mb = host.nbytes / 1e6
    jax.device_put(host).block_until_ready()  # warm
    h2d, d2h = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(host)
        dev.block_until_ready()
        h2d.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(dev)
        d2h.append(time.perf_counter() - t0)
    return {
        "scalar_rtt_ms": round(min(rtts) * 1e3, 2),
        "h2d_mb_per_sec": round(mb / min(h2d), 1),
        "d2h_mb_per_sec": round(mb / min(d2h), 1),
        "transfer_mb": mb,
    }


def main():
    N = 512 * 512 * 64
    T = 4
    _start_watchdog()
    res = _PROGRESS["results"]

    steps = [
        ("tunnel_health", lambda: _try(_bench_tunnel_health)),
        ("config1_monoexp_noisy", lambda: _try(_bench_monoexp, N, T)),
        ("unet_seg_slices_per_sec_384x384_b16", lambda: _try(_bench_unet)),
        ("unet_seg_slices_per_sec_384x384_b64", lambda: _try(_bench_unet, B=64)),
        ("biexp_pallas_fit", lambda: _try(_bench_biexp)),
        ("generic_lm_3param_pallas", lambda: _try(_bench_generic_lm)),
        ("config2_qdess_e2e", lambda: _try(_bench_qdess_e2e)),
        ("config2b_qdess_metrics_only", lambda: _try(_bench_qdess_metrics_only)),
        ("config3_cubequant_e2e", lambda: _try(_bench_cubequant_e2e)),
        ("config4_iwoai_fullvol_seg", lambda: _try(_bench_iwoai_fullvol)),
        ("config5_bilateral_pipeline", lambda: _try(_bench_bilateral_pipeline)),
        ("registration_affine_pair", lambda: _try(_bench_registration)),
        ("registration_bspline_pair", lambda: _try(_bench_bspline_registration)),
        ("warp_fullgrid", lambda: _try(_bench_warp)),
    ]
    # DOSMA_BENCH_ONLY="registration_bspline_pair,config1_monoexp_noisy"
    # runs a subset (comma-separated step names) for targeted re-measures;
    # tunnel_health always runs so every capture carries link state.
    only = os.environ.get("DOSMA_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",")} | {"tunnel_health"}
        steps = [s for s in steps if s[0] in keep]
    for key, fn in steps:
        _mark(key)
        _best_of.spreads = []
        out = fn()
        if isinstance(out, dict) and _best_of.spreads:
            out["timing_spreads"] = list(_best_of.spreads)
        res[key] = out
    _mark("done")
    _PROGRESS["done"] = True

    _emit(res)


if __name__ == "__main__":
    main()
