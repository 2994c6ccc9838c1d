"""Device abstraction over host (NumPy) and JAX/TPU accelerator memory.

TPU-native re-design of ``/root/reference/dosma/core/device.py:18-253``. The
reference dispatches between numpy and cupy; here a :class:`Device` is either
the host CPU (plain ``numpy`` arrays) or a JAX device (``jax.Array`` resident
in TPU HBM or on the CPU backend). ``device.xp`` returns the array module
(``numpy`` or ``jax.numpy``) so downstream code can be written array-agnostic,
exactly like the reference's ``get_array_module`` pattern.
"""

from __future__ import annotations

from typing import Any, Union

import numpy as np

__all__ = ["Device", "cpu_device", "get_array_module", "get_device", "to_device"]


def _jax():
    import jax

    return jax


class Device:
    """A compute device: host CPU (numpy) or a JAX device.

    Accepted constructors:
        - ``Device(-1)`` or ``Device("cpu")`` → host CPU (numpy arrays)
        - ``Device(k)`` for ``k >= 0`` → ``jax.devices()[k]``
        - ``Device("tpu:0")`` / ``Device("tpu")`` → JAX TPU device
        - ``Device(jax.Device)`` → wraps the given JAX device
        - ``Device(Device)`` → copy
    """

    def __init__(self, device: Union[str, int, "Device", Any] = -1):
        jax_device = None
        if isinstance(device, Device):
            self._type = device._type
            self._index = device._index
            self._jax_device = device._jax_device
            return
        if isinstance(device, int):
            if device == -1:
                self._type, self._index, self._jax_device = "cpu", -1, None
                return
            jax_device = _jax().devices()[device]
        elif isinstance(device, str):
            dev = device.lower()
            if dev in ("cpu", "cpu:-1", "cpu:0"):
                self._type, self._index, self._jax_device = "cpu", -1, None
                return
            if ":" in dev:
                platform, _, idx = dev.partition(":")
                idx = int(idx)
            else:
                platform, idx = dev, 0
            devices = _jax().devices()
            matching = [d for d in devices if d.platform in (platform, "axon")]
            if not matching:
                # A nonexistent platform must raise — silently handing back
                # a CPU device would make mv.to("tpu") "succeed" on hosts
                # without one.
                raise ValueError(
                    f"No {platform!r} devices available "
                    f"(backends: {sorted({d.platform for d in devices})})"
                )
            jax_device = matching[idx]
        elif type(device).__module__.startswith("torch") and hasattr(device, "type"):
            # torch.device interop (ref ``device.py:63-72``): cpu maps to
            # the host device; every non-cpu torch device is REJECTED
            # (torch is CPU-only in this build — there is no torch↔jax
            # accelerator ordinal mapping — mirroring how the reference
            # rejects GPU ids without cupy).
            if device.type == "cpu":
                self._type, self._index, self._jax_device = "cpu", -1, None
                return
            raise ValueError(
                f"torch device type {device.type!r} has no jax runtime in this build"
            )
        else:
            # Assume a jax.Device-like object.
            if not hasattr(device, "platform"):
                raise ValueError(f"Invalid device: {device!r}")
            jax_device = device

        self._jax_device = jax_device
        self._type = jax_device.platform
        self._index = jax_device.id

    @property
    def type(self) -> str:
        return self._type

    @property
    def index(self) -> int:
        return self._index

    @property
    def id(self) -> int:
        """Alias of :attr:`index` (reference-compat)."""
        return self._index

    @property
    def jax_device(self):
        """The underlying ``jax.Device`` (None for the host CPU device)."""
        return self._jax_device

    @property
    def xp(self):
        """Array module for this device (``numpy`` or ``jax.numpy``)."""
        if self._type == "cpu" and self._jax_device is None:
            return np
        import jax.numpy as jnp

        return jnp

    def at(self):
        """Context manager placing new arrays on this device.

        TPU-native analog of the reference's ``with device:`` scope
        (cupy ``Device.use``, ref ``device.py:133-181``): inside the context,
        jax ops allocate their outputs on this device via
        ``jax.default_device``. The host-CPU device is a no-op scope.
        """
        import contextlib

        if self._jax_device is None:
            return contextlib.nullcontext(self)
        import jax

        return jax.default_device(self._jax_device)

    def __enter__(self):
        if not hasattr(self, "_ctx_stack"):
            self._ctx_stack = []
        ctx = self.at()
        ctx.__enter__()
        self._ctx_stack.append(ctx)
        return self

    def __exit__(self, *exc):
        return self._ctx_stack.pop().__exit__(*exc)

    @property
    def ptdevice(self):
        """``torch.device`` equivalent (ref ``device.py:115-123``).

        Only the host device has a torch runtime in this build; jax devices
        raise, mirroring the reference's RuntimeError for unsupported
        conversions.
        """
        import torch

        if self._jax_device is None:
            return torch.device("cpu")
        raise RuntimeError(
            f"No torch equivalent for jax device {self._type}:{self._index}"
        )

    def to_torch(self):
        """Alias of :attr:`ptdevice`."""
        return self.ptdevice

    def __eq__(self, other) -> bool:
        if isinstance(other, int):
            other = Device(other)
        elif isinstance(other, str):
            try:
                other = Device(other)
            except Exception:
                return False
        elif type(other).__module__.startswith("torch") and hasattr(other, "type"):
            # torch.device comparison (ref ``device.py:162-163``): route
            # through the constructor so equality agrees with
            # ``Device(torch.device(...))`` (torch itself treats
            # device('cpu') != device('cpu', 0), but both normalize to the
            # same Device here).
            try:
                other = Device(other)
            except (RuntimeError, ValueError):
                return False
        if not isinstance(other, Device):
            return False
        return self._type == other._type and self._index == other._index

    def __hash__(self):
        return hash((self._type, self._index))

    def __repr__(self):
        if self._jax_device is None:
            return "Device(type='cpu')"
        return f"Device(type={self._type!r}, index={self._index})"


cpu_device = Device(-1)


def get_array_module(array) -> Any:
    """Return the array module (numpy or jax.numpy) for ``array``.

    Mirrors ``get_array_module`` (``device.py:193``). Works on raw arrays and
    on objects exposing a ``device`` attribute (e.g. ``MedicalVolume``).
    """
    import jax

    if isinstance(array, jax.Array):
        import jax.numpy as jnp

        return jnp
    if hasattr(array, "device") and isinstance(getattr(array, "device"), Device):
        return array.device.xp
    return np


# Placeholder device for abstract (traced) jax arrays inside jit/vmap: the
# array module is jax.numpy but there is no concrete jax.Device.
_traced_device = Device.__new__(Device)
_traced_device._type = "jax"
_traced_device._index = -1
_traced_device._jax_device = None


def get_device(array) -> Device:
    """Return the :class:`Device` that ``array`` resides on."""
    import jax

    if hasattr(array, "device") and isinstance(getattr(array, "device"), Device):
        return array.device
    if isinstance(array, jax.core.Tracer):
        return _traced_device
    if isinstance(array, jax.Array):
        devs = list(array.devices())
        return Device(devs[0])
    return cpu_device


def to_device(array, device: Union[int, str, Device], **kwargs):
    """Move ``array`` (ndarray / jax.Array / MedicalVolume / nested seq) to ``device``."""
    import jax

    device = Device(device)
    if hasattr(array, "to") and not isinstance(array, (np.ndarray, jax.Array)):
        return array.to(device, **kwargs)
    if device == cpu_device:
        return np.asarray(array)
    return jax.device_put(np.asarray(array) if not isinstance(array, jax.Array) else array, device.jax_device)
