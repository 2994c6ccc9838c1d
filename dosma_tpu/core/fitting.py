"""Quantitative fitting: CurveFitter / PolyFitter / MonoExponentialFit.

API-parity re-design of ``/root/reference/dosma/core/fitting.py`` with the
compute path replaced: the reference loops ``scipy.optimize.curve_fit`` over
voxels (``fitting.py:853-868``); here all voxels are fit in one fused,
vmapped Levenberg–Marquardt launch on TPU (:mod:`dosma_tpu.ops.nlls`).
``num_workers``/``chunksize``/``show_pbar`` are accepted for API
compatibility but are no-ops — there is no worker pool to manage.

Facade behaviors preserved (citations into the reference):
  - ``_Fitter.fit``: reorient → flatten (T, N) → mask select → fit →
    ``out_ufuncs``/``out_bounds``/``r2_threshold``/``nan_to_num`` →
    scatter → rewrap with broadcast headers (``fitting.py:157-235``).
  - flexible ``p0``: scalar, sequence, dict, ndarray, MedicalVolume,
    per-voxel maps (``fitting.py:344-380, 1106-1161``).
  - ``MonoExponentialFit``: log-linear polyfit seeding, rate→time-constant
    ufunc, bounds, r² threshold, rounding (``fitting.py:607-749``).
  - NaN semantics: failed/out-of-bounds/all-zero voxels → NaN, r²=0
    (``fitting.py:1065-1072``).
"""

from __future__ import annotations

import functools
import inspect
import os
import warnings
from numbers import Number
from typing import Callable, Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from dosma_tpu import defaults
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.defaults import preferences

__all__ = [
    "CurveFitter",
    "PolyFitter",
    "MonoExponentialFit",
    "curve_fit",
    "polyfit",
    "monoexponential",
    "biexponential",
]

_NoValue = object()
__EPSILON__ = 1e-8


def _any_jax(*args) -> bool:
    import jax

    return any(isinstance(a, jax.Array) for a in args)


def monoexponential(x, a, b):
    """:math:`f(x) = a e^{b x}` (works on numpy and jax arrays/tracers)."""
    if _any_jax(x, a, b):
        import jax.numpy as jnp

        return a * jnp.exp(b * x)
    return a * np.exp(b * x)


def biexponential(x, a1, b1, a2, b2):
    """:math:`f(x) = a_1 e^{b_1 x} + a_2 e^{b_2 x}`."""
    if _any_jax(x, a1, b1, a2, b2):
        import jax.numpy as jnp

        return a1 * jnp.exp(b1 * x) + a2 * jnp.exp(b2 * x)
    return a1 * np.exp(b1 * x) + a2 * np.exp(b2 * x)


def _func_nparams(func: Callable) -> Tuple[int, list]:
    func_args = list(inspect.signature(func).parameters)
    if "self" in func_args:
        return len(func_args) - 2, func_args[2:]
    return len(func_args) - 1, func_args[1:]


def _as_jax_model(func: Callable, nparams: int) -> Optional[Callable]:
    """Wrap a scipy-style ``f(x, *params)`` as the batched-broadcast model
    the LM kernel expects: ``model(x_col (T,1), params tuple of (N,)) → (T,N)``.
    Any model written with scalar numpy-style broadcasting qualifies.
    Returns None when the function is not jax-traceable.

    Cached per (func, nparams) when ``func`` is hashable: the LM kernel jit
    keys its static ``model_fn`` by object identity, so a fresh closure per
    ``curve_fit`` call would recompile the kernel on every fit of the same
    model. Unhashable callables (e.g. class instances defining ``__eq__``)
    are still accepted — they just skip the cache."""
    try:
        return _as_jax_model_cached(func, nparams)
    except TypeError:  # unhashable func
        return _as_jax_model_impl(func, nparams)


@functools.lru_cache(maxsize=64)
def _as_jax_model_cached(func: Callable, nparams: int) -> Optional[Callable]:
    return _as_jax_model_impl(func, nparams)


def _as_jax_model_impl(func: Callable, nparams: int) -> Optional[Callable]:
    import jax
    import jax.numpy as jnp

    def model(x_col, params):
        return func(x_col, *params)

    try:
        out = jax.eval_shape(
            model,
            jnp.zeros((3, 1), jnp.float32),
            tuple(jnp.zeros((5,), jnp.float32) for _ in range(nparams)),
        )
        if out.shape != (3, 5):
            return None
    except Exception:
        return None
    return model


class _Fit:
    """Abstract base for quantitative-value fits (ref ``fitting.py:36-49``)."""

    def fit(self) -> Tuple[MedicalVolume, MedicalVolume]:
        raise NotImplementedError  # pragma: no cover


# ----------------------------------------------------------------------
# Option validators shared by the fitter facades.
# ----------------------------------------------------------------------
def _validate_out_ufuncs(ufuncs, nparams: int):
    ok = isinstance(ufuncs, Callable) or all(
        fn is None or isinstance(fn, Callable) for fn in ufuncs
    )
    if not ok:
        raise TypeError(f"`out_ufuncs` must be callable or sequence of callables. Got {ufuncs}")
    if isinstance(ufuncs, Sequence) and len(ufuncs) > nparams:
        warnings.warn(
            f"len(out_ufuncs)={len(ufuncs)}, but only {nparams} parameters. "
            f"Extra ufuncs will be ignored."
        )
    return ufuncs


def _validate_out_bounds(bounds):
    bounds = np.asarray(bounds)
    if bounds.shape[-1] != 2 or bounds.ndim > 2:
        raise ValueError("Invalid `out_bounds` - shape must be ([num_params,] 2)")
    if np.any(bounds[..., 0] > bounds[..., 1]):
        raise ValueError("Invalid `out_bounds` - lower bound must be <= upper bound")
    return bounds


def _validate_r2_threshold(threshold):
    if isinstance(threshold, str):
        if threshold != "preferences":
            raise ValueError(
                f"Invalid value r2_threshold='{threshold}'. "
                f"Expected `None`, a number between [0, 1], or 'preferences'."
            )
        return preferences.fitting_r2_threshold
    return threshold


def _bounds_as_rows(bounds: np.ndarray, nparams: int):
    """(lb_row, ub_row) broadcastable against a (..., P) param array."""
    if bounds.ndim == 2:
        missing = nparams - bounds.shape[0]
        if missing > 0:
            fill = np.tile(np.array([[-np.inf, np.inf]]), (missing, 1))
            bounds = np.concatenate([bounds, fill], axis=0)
        bounds = bounds.T
    return bounds[0], bounds[1]


class _Fitter:
    """Orchestrates MedicalVolume-level fitting (ref ``fitting.py:51-235``):
    reorient → flatten → (mask-select) → ``_fit`` kernel → post-process →
    scatter back → rewrap as MedicalVolumes."""

    nan_to_num: Optional[float]
    out_ufuncs: Optional[Union[Callable, Sequence[Callable]]]
    out_bounds: Optional[np.ndarray]
    r2_threshold: Optional[float]
    y_bounds: Optional[Tuple[float, float]]

    # Back-compat method aliases for the validators above.
    def _format_out_ufuncs(self, ufuncs, nparams):
        return _validate_out_ufuncs(ufuncs, nparams)

    def _format_out_bounds(self, bounds):
        return _validate_out_bounds(bounds)

    def _format_r2_threshold(self, threshold):
        return _validate_r2_threshold(threshold)

    def _process_mask(self, mask, y: MedicalVolume):
        import jax

        if isinstance(mask, (np.ndarray, jax.Array)):
            mask = y._partial_clone(volume=np.asarray(mask), headers=None)
        elif not isinstance(mask, MedicalVolume):
            raise TypeError("`mask` must be a MedicalVolume or ndarray")
        mask = mask.reformat_as(y)
        if not mask.is_same_dimensions(y, defaults.AFFINE_DECIMAL_PRECISION):
            raise RuntimeError("`mask` and `y` dimension mismatch")
        return mask > 0

    def _process_params(self, x: np.ndarray, r_squared: np.ndarray) -> np.ndarray:
        """Post-process pipeline: out_ufuncs → out_bounds → r² threshold →
        nan_to_num (ref ``fitting.py:109-146``). ``x``: (..., P), in place
        where possible."""
        nparams = x.shape[-1]

        if isinstance(self.out_ufuncs, Callable):
            x = self.out_ufuncs(x)
        elif isinstance(self.out_ufuncs, Sequence):
            for i, fn in enumerate(self.out_ufuncs[:nparams]):
                if fn is not None:
                    x[..., i] = fn(x[..., i])

        if self.out_bounds is not None:
            lb, ub = _bounds_as_rows(self.out_bounds, nparams)
            with np.errstate(invalid="ignore"):
                x[(x < lb) | (x > ub)] = np.nan

        if self.r2_threshold is not None:
            x[r_squared < self.r2_threshold] = np.nan

        if self.nan_to_num is not None:
            x = np.nan_to_num(x, nan=self.nan_to_num, copy=False)
        return x

    def _fit(self, x, y, **kwargs):
        raise NotImplementedError  # pragma: no cover

    # -- fit() decomposition ------------------------------------------
    @staticmethod
    def _flatten_echoes(y: Sequence[MedicalVolume]) -> np.ndarray:
        """(T, N) host matrix: one row per echo, voxels flattened."""
        return np.concatenate([np.asarray(v.volume).reshape(1, -1) for v in y], axis=0)

    def _scatter_to_volume(self, popt, r_squared, mask, n_total):
        """Place masked-fit results back into full-length vectors."""
        fill = np.nan if self.nan_to_num is None else self.nan_to_num
        popt_full = np.full((n_total,) + popt.shape[-1:], fill, popt.dtype)
        r2_full = np.full((n_total,), fill, r_squared.dtype)
        popt_full[mask] = popt
        r2_full[mask] = r_squared
        return popt_full, r2_full

    @staticmethod
    def _wrap_outputs(ref: MedicalVolume, popt, r_squared, copy_headers: bool):
        from copy import deepcopy

        if not copy_headers:
            return (
                ref._partial_clone(volume=popt, headers=None),
                ref._partial_clone(volume=r_squared, headers=None),
            )
        headers = ref.headers()
        if headers is not None:
            headers = deepcopy(headers)
            extra_dims = popt.ndim - ref.volume.ndim
            if extra_dims > 0:
                headers = np.expand_dims(
                    headers, axis=tuple(range(-extra_dims, 0))
                )
        return (
            ref._partial_clone(volume=popt, headers=headers),
            ref._partial_clone(volume=r_squared, headers=True),
        )

    def fit(self, x, y: Sequence[MedicalVolume], mask=None, copy_headers: bool = True, **kwargs):
        """Fit ``y`` volumes against ``x``; see class docs (ref ``fitting.py:157-235``)."""
        if not isinstance(y, (list, tuple)) or not all(
            isinstance(v, MedicalVolume) for v in y
        ):
            raise TypeError("`y` must be sequence of MedicalVolumes.")

        x = np.asarray(x)
        if x.shape[-1] != len(y):
            raise ValueError(
                f"Dimension mismatch: x.shape[-1]={x.shape[-1]}, but len(y)={len(y)}"
            )

        y = [v.reformat(y[0].orientation) for v in y]
        ref = y[0]

        if mask is not None:
            mask = np.asarray(self._process_mask(mask, ref).volume).reshape(-1)

        svs = self._flatten_echoes(y)
        n_total = svs.shape[-1]
        if mask is not None:
            svs = svs[:, mask]

        popt, r_squared = self._fit(x, svs, **kwargs)
        popt = np.array(popt)  # writable host copy for in-place post-processing
        r_squared = np.array(r_squared)
        popt = self._process_params(popt, r_squared)

        if mask is not None:
            popt, r_squared = self._scatter_to_volume(popt, r_squared, mask, n_total)

        popt = popt.reshape(ref.shape + popt.shape[-1:])
        r_squared = r_squared.reshape(ref.shape)
        return self._wrap_outputs(ref, popt, r_squared, copy_headers)


class CurveFitter(_Fitter):
    """Nonlinear least-squares fitter over MedicalVolumes.

    Same constructor surface as the reference (``fitting.py:238-380``);
    the per-voxel scipy loop is replaced by one batched TPU LM launch.
    """

    def __init__(
        self,
        func: Callable,
        p0: Sequence[float] = None,
        y_bounds: Tuple[float, float] = None,
        out_ufuncs: Union[Callable, Sequence[Callable]] = None,
        out_bounds=None,
        r2_threshold: Union[float, str] = "preferences",
        nan_to_num: float = None,
        num_workers: int = 0,
        chunksize: int = None,
        verbose: bool = False,
        kernel: str = "auto",
        **kwargs,
    ):
        func_name = func.__name__ if hasattr(func, "__name__") else type(func).__name__
        nparams, _ = _func_nparams(func)

        if out_ufuncs is not None:
            out_ufuncs = self._format_out_ufuncs(out_ufuncs, nparams)
        if out_bounds is not None:
            out_bounds = self._format_out_bounds(out_bounds)
        r2_threshold = self._format_r2_threshold(r2_threshold)

        self._func = func
        self._func_name = func_name
        self.p0 = self._format_p0(p0)
        self.y_bounds = y_bounds
        self.out_ufuncs = out_ufuncs
        self.out_bounds = out_bounds
        self.r2_threshold = r2_threshold
        self.nan_to_num = nan_to_num
        self.num_workers = num_workers
        self.chunksize = chunksize
        self.verbose = verbose
        # Device-kernel hint (see :func:`curve_fit`): pass
        # kernel="pallas_monoexp" when ``func`` is a user-defined function
        # equivalent to the library monoexponential — identity dispatch
        # alone would silently take the generic engine.
        self.kernel = kernel
        self.kwargs = kwargs

    def _format_p0(self, p0, ref: MedicalVolume = None, flatten=False, mask=None, depth=0):
        """Normalize p0 (scalar/seq/dict/ndarray/MedicalVolume) — ref ``fitting.py:344-380``."""
        if p0 is None or isinstance(p0, Number):
            return p0
        elif isinstance(p0, MedicalVolume) and depth > 0:
            if ref is not None:
                p0 = p0.reformat_as(ref)
                assert p0.is_same_dimensions(ref, err=True)
            if flatten:
                p0 = np.asarray(p0.A).flatten()
                if mask is not None:
                    p0 = p0[mask]
            return p0
        elif isinstance(p0, np.ndarray) and depth > 0:
            if ref is not None and p0.shape != ref.shape:
                raise ValueError(f"Got p0.shape={p0.shape}, but y.shape={ref.shape}")
            if flatten:
                p0 = p0.flatten()
            if mask is not None:
                p0 = p0[mask]
            return p0

        if isinstance(p0, Mapping):
            return {k: self._format_p0(v, ref, flatten, mask, depth + 1) for k, v in p0.items()}
        elif isinstance(p0, Sequence):
            return tuple(self._format_p0(v, ref, flatten, mask, depth + 1) for v in p0)
        elif isinstance(p0, (np.ndarray, MedicalVolume)):
            return tuple(
                self._format_p0(p0[..., i], ref, flatten, mask, depth + 1)
                for i in range(p0.shape[-1])
            )
        raise ValueError(f"p0={p0} not supported")

    def fit(self, x, y: Sequence[MedicalVolume], mask=None, p0=_NoValue, copy_headers=True):
        if mask is not None:
            mask = self._process_mask(mask, y[0])

        if p0 is _NoValue:
            p0 = self.p0
        p0 = self._format_p0(
            p0,
            ref=y[0],
            flatten=True,
            mask=np.asarray(mask.A).reshape(-1) if mask is not None else None,
        )
        return super().fit(x, y, mask=mask, p0=p0, copy_headers=copy_headers)

    def _fit(self, x, y, p0=_NoValue):
        assert p0 is not _NoValue
        return curve_fit(
            self._func,
            x,
            y,
            self.y_bounds,
            p0=p0,
            show_pbar=self.verbose,
            num_workers=self.num_workers,
            chunksize=self.chunksize,
            kernel=getattr(self, "kernel", "auto"),
            **self.kwargs,
        )

    def __str__(self):
        attrs = ["p0", "y_bounds", "out_bounds", "r2_threshold", "nan_to_num"]
        vals = [f"func={self._func_name}"] + [f"{k}={getattr(self, k)}" for k in attrs]
        return f"{self.__class__.__name__}({', '.join(vals)})"


class PolyFitter(_Fitter):
    """Polynomial least-squares fitter over MedicalVolumes (ref ``fitting.py:461-604``).

    ``num_workers`` semantics from the reference (None = joint solve,
    0/N = per-sequence) are accepted; the joint batched solve is always used
    on device — it is exact, so the distinction is moot here.
    """

    def __init__(
        self,
        deg: int,
        rcond: float = None,
        y_bounds: Tuple[float, float] = None,
        out_ufuncs: Union[Callable, Sequence[Callable]] = None,
        out_bounds=None,
        r2_threshold: Union[float, str] = "preferences",
        nan_to_num: float = None,
        num_workers: int = None,
        chunksize: int = None,
        verbose: bool = False,
    ):
        if out_ufuncs is not None:
            out_ufuncs = self._format_out_ufuncs(out_ufuncs, deg + 1)
        if out_bounds is not None:
            out_bounds = self._format_out_bounds(out_bounds)
        r2_threshold = self._format_r2_threshold(r2_threshold)

        self.deg = deg
        self.rcond = rcond
        self.y_bounds = y_bounds
        self.out_ufuncs = out_ufuncs
        self.out_bounds = out_bounds
        self.r2_threshold = r2_threshold
        self.nan_to_num = nan_to_num
        self.num_workers = num_workers
        self.chunksize = chunksize
        self.verbose = verbose

    def fit(self, x, y: Sequence[MedicalVolume], mask=None, copy_headers: bool = True):
        return super().fit(x, y, mask=mask, copy_headers=copy_headers)

    def _fit(self, x, y):
        return polyfit(
            x,
            y,
            deg=self.deg,
            rcond=self.rcond,
            y_bounds=self.y_bounds,
            show_pbar=self.verbose,
            num_workers=self.num_workers,
            chunksize=self.chunksize,
        )

    def __str__(self):
        attrs = ["deg", "rcond", "y_bounds", "out_bounds", "r2_threshold", "nan_to_num"]
        vals = [f"{k}={getattr(self, k)}" for k in attrs]
        return f"{self.__class__.__name__}({', '.join(vals)})"


class MonoExponentialFit(_Fit):
    """Monoexponential relaxometry fit :math:`y = a e^{-x/tc}` (ref ``fitting.py:607-749``)."""

    def __init__(
        self,
        x: Sequence[float] = None,
        y: Sequence[MedicalVolume] = None,
        mask: MedicalVolume = None,
        bounds: Tuple[float, float] = (0, 100.0),
        tc0: Union[float, str] = 30.0,
        r2_threshold: Union[float, str] = "preferences",
        decimal_precision: int = 1,
        num_workers: int = 0,
        chunksize: int = 1000,
        verbose: bool = False,
    ):
        self.x = x
        if y is not None:
            warnings.warn(
                f"Setting `y` in the constructor can result in significant memory overhead. "
                f"Specify `y` in `{type(self).__name__}.fit(y=...)` instead."
            )
            self._check_y(x, y)
        self.y = y

        if mask is not None:
            warnings.warn(
                f"Setting `mask` in the constructor can result in significant memory overhead. "
                f"Specify `mask` in `{type(self).__name__}.fit(mask=...)` instead."
            )
        self.mask = mask

        if not (isinstance(tc0, Number) or (isinstance(tc0, str) and tc0 == "polyfit")):
            raise ValueError("`tc0` must either be a float or the string 'polyfit'.")

        if len(bounds) != 2:
            raise ValueError("`bounds` should provide lower/upper bound in format (lb, ub)")

        self.bounds = bounds
        self.tc0 = tc0
        # Validate up front so an invalid string raises identically on the
        # device and host paths (_fit_device resolves strings itself).
        _validate_r2_threshold(r2_threshold)
        self.r2_threshold = r2_threshold
        self.decimal_precision = decimal_precision
        self.num_workers = num_workers
        self.chunksize = chunksize
        self.verbose = verbose
        self._eps = 1e-10  # epsilon for polyfit seeding (ref ``fitting.py:677``)

    def fit(self, x=None, y: Sequence[MedicalVolume] = None, mask=None):
        x = self.x if x is None else x
        y = self.y if y is None else y
        mask = self.mask if mask is None else mask

        self._check_y(x, y)
        orientation = y[0].orientation
        y = [sv.reformat(orientation) for sv in y]

        if isinstance(mask, np.ndarray):
            mask = MedicalVolume(mask, affine=y[0].affine)
        mask = mask.reformat(orientation) if mask is not None else None

        # Fully device-resident fast path on TPU: seed + LM kernel + all
        # post-processing fused in one program (one H2D, one D2H) instead
        # of the per-stage host round trips of the facade path.
        from dosma_tpu.ops.monoexp_pallas import pallas_supported

        if pallas_supported():
            return self._fit_device(x, y, mask)

        return self._fit_host(x, y, mask)

    def _fit_device(self, x, y, mask):
        from copy import deepcopy

        from dosma_tpu.ops.monoexp_pipeline import monoexp_fit_full

        import jax
        import jax.numpy as jnp

        shape = y[0].shape
        # Device-resident volumes (e.g. straight out of the in-process
        # registrar) stack on device — echo data never round-trips the host,
        # and the result maps stay device-backed for downstream device use.
        device_in = all(isinstance(sv.volume, jax.Array) for sv in y)
        if device_in:
            yT = jnp.stack(
                [sv.volume.astype(jnp.float32).reshape(-1) for sv in y], axis=0
            )
        else:
            yT = np.stack(
                [np.asarray(sv.volume, np.float32).reshape(-1) for sv in y], axis=0
            )
        if mask is not None:
            # Same orientation/dimension validation as the host path — a
            # mismatched mask must raise, not silently mask wrong voxels.
            mask = mask.reformat_as(y[0])
            if not mask.is_same_dimensions(y[0], defaults.AFFINE_DECIMAL_PRECISION):
                raise RuntimeError("`mask` and `y` dimension mismatch")
        mask_flat = (
            np.asarray(mask.volume).reshape(-1) if mask is not None else None
        )
        r2_threshold = self.r2_threshold
        if isinstance(r2_threshold, str):
            r2_threshold = preferences.fitting_r2_threshold

        tc_flat, r2_flat = monoexp_fit_full(
            np.asarray(x, np.float32), yT,
            bounds=self.bounds, tc0=self.tc0, r2_threshold=r2_threshold,
            decimal_precision=self.decimal_precision, mask_flat=mask_flat,
        )
        if device_in:
            tc_arr, r2_arr = tc_flat.reshape(shape), r2_flat.reshape(shape)
        else:
            tc_arr = np.asarray(tc_flat).reshape(shape)
            r2_arr = np.asarray(r2_flat).reshape(shape)

        headers = y[0].headers()
        headers = deepcopy(headers) if headers is not None else None
        tc_map = y[0]._partial_clone(volume=tc_arr, headers=headers)
        r_squared = y[0]._partial_clone(volume=r2_arr, headers=True)
        return tc_map, r_squared

    def _fit_host(self, x, y, mask):
        if self.tc0 == "polyfit":
            polyfitter = PolyFitter(
                1, r2_threshold=0, num_workers=None, nan_to_num=0.0, verbose=self.verbose
            )
            vols = [
                sv.astype(np.float32) if np.issubdtype(sv.dtype, np.integer) else sv for sv in y
            ]
            vols = [sv + self._eps * (sv == 0) for sv in vols]
            vols = [np.log(v) for v in vols]
            params, _ = polyfitter.fit(x, vols, mask=mask, copy_headers=False)
            p0 = {"a": np.exp(np.asarray(params.A)[..., 1]), "b": np.asarray(params.A)[..., 0]}
            del vols
        else:
            p0 = {"a": 1.0, "b": -1 / self.tc0}

        curve_fitter = CurveFitter(
            monoexponential,
            y_bounds=None,
            out_ufuncs=(None, lambda _x: 1 / np.abs(_x)),
            out_bounds=((-np.inf, np.inf), self.bounds),
            r2_threshold=self.r2_threshold,
            num_workers=self.num_workers,
            chunksize=self.chunksize,
            verbose=self.verbose,
            nan_to_num=0.0,
        )
        popt, r_squared = curve_fitter.fit(x, y, mask=mask, p0=p0)
        tc_map = popt[..., 1]

        if self.decimal_precision is not None:
            tc_map = np.around(tc_map, self.decimal_precision)
        return tc_map, r_squared

    def _check_y(self, x, y):
        if (not isinstance(y, Sequence)) or (not all(isinstance(sv, MedicalVolume) for sv in y)):
            raise TypeError("`y` must be list of MedicalVolumes.")
        if len(x) != len(y):
            raise ValueError(f"`len(x)`={len(x)}, but `len(y)`={len(y)}")


def _build_p0_matrix(p0, param_args, N, dtype=np.float32) -> np.ndarray:
    """Assemble the (N, P) initial-guess matrix from flexible p0 input
    (analog of ref ``_format_p0``, ``fitting.py:1106-1161``)."""
    P = len(param_args)
    out = np.ones((N, P), dtype=dtype)
    if p0 is None:
        return out
    if isinstance(p0, Number):
        out[:] = p0
        return out
    if isinstance(p0, Mapping):
        for i, name in enumerate(param_args):
            if name in p0 and p0[name] is not None:
                val = p0[name]
                out[:, i] = np.asarray(val, dtype=dtype).reshape(-1) if not isinstance(val, Number) else val
        return out
    if isinstance(p0, np.ndarray) and p0.ndim == 2:
        if p0.shape != (N, P):
            raise ValueError(f"p0 array must have shape ({N}, {P}), got {p0.shape}")
        return p0.astype(dtype)
    if isinstance(p0, Sequence):
        for i, val in enumerate(p0):
            if val is None:
                continue
            out[:, i] = np.asarray(val, dtype=dtype).reshape(-1) if not isinstance(val, Number) else val
        return out
    raise ValueError(f"p0={p0} not supported")


def curve_fit(
    func,
    x,
    y,
    y_bounds=None,
    p0=None,
    maxfev=100,
    ftol=1e-5,
    eps=1e-8,
    show_pbar=False,
    num_workers=0,
    chunksize: int = None,
    kernel: str = "auto",
    **kwargs,
):
    """Nonlinear least-squares fit of ``func`` to N data sequences at once.

    Same signature/return contract as the reference (``fitting.py:755-870``):
    ``y`` is (T, N); returns (popts (N, P), r_squared (N,)). The computation
    is a single batched LM launch on the default JAX device; functions that
    are not jax-traceable fall back to a per-sequence scipy loop.

    ``kernel`` selects the device engine (dosma_tpu extension):

    - ``"auto"``: the fused Pallas kernel when ``func`` IS the library
      ``monoexponential``/``biexponential`` (identity check — a same-named
      user function may use a different parametrization) and the backend
      compiles Pallas; the generic vmapped LM otherwise.
    - ``"pallas_monoexp"`` / ``"pallas_biexp"``: force the fused kernel for
      a user function KNOWN to share the library parametrization
      (``a*exp(b*x)`` / 4-param biexponential).
    - ``"generic"``: force the generic engine.
    """
    if kernel not in ("auto", "pallas_monoexp", "pallas_biexp", "generic"):
        raise ValueError(f"Unknown kernel {kernel!r}")
    from dosma_tpu.ops.nlls import lm_fit

    x = np.asarray(x)
    y = np.asarray(y)
    if y.ndim == 1:
        y = y.reshape(y.shape + (1,))
    N = y.shape[-1]

    nparams, param_args = _func_nparams(func)
    p0_mat = _build_p0_matrix(p0, param_args, N)

    if kwargs:
        # scipy-only options (parameter ``bounds``, ``sigma`` weights,
        # ``jac``, ...) have no batched-device analog; the reference always
        # forwards them to scipy.optimize.curve_fit, so silently fitting
        # WITHOUT them on the device engines would change results. Route to
        # the exact per-sequence scipy loop instead.
        warnings.warn(
            f"curve_fit options {sorted(kwargs)} are only supported by the "
            f"scipy engine; falling back to per-sequence scipy fitting."
        )
        return _scipy_curve_fit_loop(
            func, x, y, y_bounds, p0_mat, maxfev, ftol, eps, nparams,
            num_workers=num_workers, chunksize=chunksize, show_pbar=show_pbar,
            **kwargs,
        )

    model = _as_jax_model(func, nparams)
    if model is None:
        warnings.warn(
            f"Function {getattr(func, '__name__', func)} is not jax-traceable; "
            f"falling back to per-sequence scipy fitting."
        )
        return _scipy_curve_fit_loop(
            func, x, y, y_bounds, p0_mat, maxfev, ftol, eps, nparams,
            num_workers=num_workers, chunksize=chunksize, show_pbar=show_pbar,
            **kwargs,
        )

    if y_bounds is not None and ((y < y_bounds[0]).any() or (y > y_bounds[1]).any()):
        warnings.warn("Out of bounds values found. Failure in fit will result in np.nan")

    # Fast path: the fused Pallas kernel for the monoexponential model on TPU
    # keeps each voxel tile VMEM-resident for the whole LM loop.
    use_mono = kernel == "pallas_monoexp" or (
        kernel == "auto" and func is monoexponential and nparams == 2
    )
    use_biexp = kernel == "pallas_biexp" or (
        kernel == "auto" and func is biexponential and nparams == 4
    )
    if use_mono:
        from dosma_tpu.ops.monoexp_pallas import monoexp_lm_pallas, pallas_supported

        if pallas_supported():
            popt, r2, _converged = monoexp_lm_pallas(
                x, y, p0_mat,
                max_iter=int(maxfev), ftol=ftol, y_bounds=y_bounds,
                y_layout="tn",  # y is (T, N) — transpose on device, not host
            )
            return np.asarray(popt), np.asarray(r2)

    if use_biexp:
        from dosma_tpu.ops.biexp_pallas import biexp_lm_pallas, pallas_supported

        if pallas_supported():
            popt, r2, _converged = biexp_lm_pallas(
                x, y, p0_mat,
                max_iter=int(maxfev), ftol=ftol, y_bounds=y_bounds,
                y_layout="tn",
            )
            return np.asarray(popt), np.asarray(r2)

    # Generic VMEM-resident Pallas engine (VERDICT r4 item 6): any
    # traceable model with P <= 4 keeps its voxel tiles resident for the
    # whole LM loop instead of re-reading y from HBM per iteration.
    # Models whose ops don't lower to Mosaic fall back to the HBM engine.
    if kernel in ("auto", "generic") and nparams <= 4:
        from dosma_tpu.ops.generic_lm_pallas import (
            generic_lm_pallas,
            pallas_supported as _generic_pallas_ok,
        )

        if _generic_pallas_ok():
            try:
                # y is already (T, N) here — the kernel consumes that
                # layout natively (no host transpose; lm_fit below is the
                # one that wants (N, T)).
                popt, r2, _converged = generic_lm_pallas(
                    model, x, y, p0_mat,
                    max_iter=int(maxfev), ftol=ftol, y_bounds=y_bounds,
                    y_layout="tn",
                )
                return np.asarray(popt), np.asarray(r2)
            except Exception as e:  # Mosaic lowering / compile failure
                warnings.warn(
                    f"Pallas generic LM kernel unavailable for "
                    f"{getattr(func, '__name__', func)!r} "
                    f"({type(e).__name__}); using the HBM-streaming engine."
                )

    popt, r2, _converged = lm_fit(
        model,
        x,
        np.ascontiguousarray(y.T),
        p0_mat,
        max_iter=int(maxfev),
        ftol=ftol,
        y_bounds=y_bounds,
    )
    return np.asarray(popt), np.asarray(r2)


class _ScipyVoxelFitter:
    """One-sequence scipy fit, packaged as a picklable callable so a
    ``multiprocessing.Pool`` can fan it out (the reference's parallel
    fallback, ``fitting.py:852-868``). Returns ``(popt, r2)`` with NaN
    popt on skip/failure — identical semantics to the serial loop."""

    def __init__(self, func, x, y_bounds, p0_mat, maxfev, ftol, eps, nparams, kwargs):
        self.func = func
        self.x = x
        self.y_bounds = y_bounds
        self.p0_mat = p0_mat
        self.maxfev = maxfev
        self.ftol = ftol
        self.eps = eps
        self.nparams = nparams
        self.kwargs = kwargs

    def __call__(self, item):
        import scipy.optimize as sop

        i, yi = item
        yb = self.y_bounds
        oob = yb is not None and ((yi < yb[0]).any() or (yi > yb[1]).any())
        if oob or (yi == 0).all():
            return np.full(self.nparams, np.nan), 0.0
        try:
            popt, _ = sop.curve_fit(
                self.func, self.x, yi, p0=self.p0_mat[i],
                maxfev=self.maxfev, ftol=self.ftol, **self.kwargs,
            )
            residuals = yi - self.func(self.x, *popt)
            ss_res = np.sum(residuals**2)
            ss_tot = np.sum((yi - np.mean(yi)) ** 2)
            return popt, 1 - (ss_res / (ss_tot + self.eps))
        except RuntimeError:
            return np.full(self.nparams, np.nan), 0.0


def _scipy_curve_fit_loop(func, x, y, y_bounds, p0_mat, maxfev, ftol, eps, nparams,
                          num_workers=0, chunksize=None, show_pbar=False, **kwargs):
    """Per-sequence scipy fallback for non-traceable model functions
    (exactly the reference hot loop, ``fitting.py:1026-1073``). With
    ``num_workers`` > 0, sequences fan out over a process pool (the
    reference's ``mp.Pool`` path, ``fitting.py:861-867``); functions the
    pickler rejects (lambdas, closures) degrade to a thread pool with a
    warning rather than erroring."""
    N = y.shape[-1]
    if N == 0:
        return np.empty((0, nparams)), np.empty(0)
    fitter = _ScipyVoxelFitter(func, x, y_bounds, p0_mat, maxfev, ftol, eps, nparams, kwargs)
    items = [(i, y[:, i]) for i in range(N)]

    num_workers = min(int(num_workers or 0), N)
    if num_workers:
        import multiprocessing as mp
        import pickle

        try:
            pickle.dumps(fitter)
            pool_cls = mp.get_context("fork").Pool if hasattr(os, "fork") else mp.Pool
        except Exception:
            from multiprocessing.pool import ThreadPool as pool_cls

            warnings.warn(
                f"Model function {getattr(func, '__name__', func)!r} is not "
                f"picklable; using threads instead of processes for "
                f"num_workers={num_workers}."
            )
        with pool_cls(num_workers) as pool:
            data = pool.map(fitter, items, chunksize=chunksize)
    else:
        data = [fitter(item) for item in items]

    popts = np.stack([d[0] for d in data], axis=0)
    r2s = np.asarray([d[1] for d in data], dtype=np.float64)
    return popts, r2s


def polyfit(
    x,
    y,
    deg: int,
    rcond=None,
    full=False,
    w=None,
    cov=False,
    eps=1e-8,
    y_bounds=None,
    show_pbar=False,
    num_workers=None,
    chunksize: int = None,
):
    """Polynomial least squares over N sequences (ref ``fitting.py:873-1013``).

    Returns (popts (N, deg+1) highest-power-first, r_squared (N,)). The
    standard path is one batched Vandermonde solve on device; ``full``/
    ``cov``/``w`` fall back to ``np.polyfit`` on host.
    """
    from dosma_tpu.ops.nlls import batched_polyfit

    x = np.asarray(x)
    y = np.asarray(y)
    if y.ndim == 1:
        y = y.reshape(y.shape + (1,))

    if y_bounds is not None and ((y < y_bounds[0]).any() or (y > y_bounds[1]).any()):
        warnings.warn("Out of bounds values found. Failure in fit will result in np.nan")

    # Per-sequence validity (ref ``fitting.py:1095-1098``): any out-of-bounds
    # sample OR an all-zero sequence yields NaN params and r2=0 — an all-zero
    # background voxel must NOT fit (0, 0) with r2 = 1 - 0/eps = 1.
    invalid = (y == 0).all(axis=0)
    if y_bounds is not None:
        invalid = invalid | ((y < y_bounds[0]) | (y > y_bounds[1])).any(axis=0)

    if full or cov or w is not None:
        out = np.polyfit(x, y, deg, rcond=rcond, full=full, w=w, cov=cov)
        if full:
            popts, residuals, rank, singular_values, rcond_ = out
        elif cov:
            popts, V = out
        else:
            popts = out
        V_mat = np.stack([x**i for i in range(deg, -1, -1)], axis=-1)
        yhat = V_mat @ popts
        ss_res = np.sum((yhat - y) ** 2, axis=0)
        ss_tot = np.sum((y - y.mean(axis=0, keepdims=True)) ** 2, axis=0)
        r_squared = 1 - ss_res / (ss_tot + eps)
        popts = popts.T.copy()
        popts[invalid] = np.nan
        r_squared = np.where(invalid, 0.0, r_squared)
        if full:
            return popts, r_squared, residuals, rank, singular_values, rcond_
        if cov:
            return popts, r_squared, V
        return popts, r_squared

    popts, r_squared = batched_polyfit(x, y, deg)
    popts = np.array(popts).T
    r_squared = np.array(r_squared)
    popts[invalid] = np.nan
    r_squared[invalid] = 0.0
    return popts, r_squared
