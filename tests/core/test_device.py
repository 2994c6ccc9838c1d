"""Device.at / context-manager placement scope (ref ``device.py:133-181``)."""

import jax
import jax.numpy as jnp
import numpy as np

from dosma_tpu.core.device import Device, cpu_device


class TestDeviceAt:
    def test_cpu_device_scope_is_noop(self):
        with cpu_device.at() as dev:
            assert dev == cpu_device
            arr = np.zeros(3)
        assert isinstance(arr, np.ndarray)

    def test_jax_device_scope_places_outputs(self):
        devices = jax.devices()
        target = Device(devices[-1])
        with target.at():
            x = jnp.zeros((4,)) + 1
        assert next(iter(x.devices())) == devices[-1]

    def test_with_device_directly(self):
        devices = jax.devices()
        target = Device(devices[-1])
        with target as dev:
            assert dev is target
            x = jnp.ones((2, 2))
        assert next(iter(x.devices())) == devices[-1]

    def test_nested_scopes_restore(self):
        devices = jax.devices()
        if len(devices) < 2:
            import pytest

            pytest.skip("needs >= 2 devices")
        a, b = Device(devices[0]), Device(devices[1])
        with a:
            with b:
                inner = jnp.zeros(2)
            outer = jnp.zeros(2)
        assert next(iter(inner.devices())) == devices[1]
        assert next(iter(outer.devices())) == devices[0]


def test_unknown_platform_raises():
    """Device('tpu') on a host without TPUs must raise, not silently hand
    back a CPU device."""
    import pytest

    from dosma_tpu.core.device import Device

    with pytest.raises(ValueError, match="No 'rocm' devices"):
        Device("rocm")


class TestTorchInterop:
    """``Device(torch.device)`` round-trips (ref ``device.py:63-72,115-123,162-163``)."""

    def test_from_torch_cpu(self):
        import torch

        from dosma_tpu.core.device import Device, cpu_device

        assert Device(torch.device("cpu")) == cpu_device
        assert Device(torch.device("cpu", 0)) == cpu_device

    def test_from_torch_unsupported_type_raises(self):
        import pytest
        import torch

        from dosma_tpu.core.device import Device

        with pytest.raises(ValueError, match="no jax runtime"):
            Device(torch.device("cuda", 0))

    def test_ptdevice_roundtrip(self):
        import torch

        from dosma_tpu.core.device import Device, cpu_device

        assert cpu_device.ptdevice == torch.device("cpu")
        assert Device(cpu_device.ptdevice) == cpu_device
        assert cpu_device.to_torch() == torch.device("cpu")

    def test_ptdevice_jax_raises(self):
        import jax
        import pytest

        from dosma_tpu.core.device import Device

        with pytest.raises(RuntimeError, match="No torch equivalent"):
            Device(jax.devices()[0]).ptdevice

    def test_eq_torch_device(self):
        import jax
        import torch

        from dosma_tpu.core.device import Device, cpu_device

        assert cpu_device == torch.device("cpu")
        assert Device(jax.devices()[0]) != torch.device("cpu")

    def test_eq_torch_indexed_cpu_consistent(self):
        """torch.device('cpu') != torch.device('cpu', 0) under torch
        semantics, but both normalize to the host Device — `==` must agree
        with the constructor path in both directions."""
        import torch

        from dosma_tpu.core.device import Device, cpu_device

        assert Device(torch.device("cpu", 0)) == cpu_device
        assert cpu_device == torch.device("cpu", 0)
