"""Quantitative-value tests (model: reference ``tests/core/test_quant_vals.py``:
registry lookup, save/load round-trip with companion volumes, to_metrics)."""

import os

import numpy as np
import pytest

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.quant_vals import (
    QuantitativeValue,
    QuantitativeValueType,
    T1Rho,
    T2,
    T2Star,
)


def _qmap(shape=(8, 8, 4), seed=0, scale=80.0):
    rs = np.random.RandomState(seed)
    return MedicalVolume(rs.rand(*shape).astype(np.float32) * scale, np.eye(4))


class TestRegistry:
    def test_get_qv_by_name_and_id(self):
        assert isinstance(QuantitativeValue.get_qv("t2"), T2)
        assert isinstance(QuantitativeValue.get_qv("T1_RHO".lower()), T1Rho)
        assert isinstance(QuantitativeValue.get_qv(T2Star.ID), T2Star)

    def test_get_qv_unknown_raises(self):
        with pytest.raises(ValueError):
            QuantitativeValue.get_qv("t9000")

    def test_qv_types(self):
        assert T2().qv_type is QuantitativeValueType.T2
        assert T1Rho().qv_type is QuantitativeValueType.T1_RHO
        assert T2Star().qv_type is QuantitativeValueType.T2_STAR

    def test_requires_medical_volume(self):
        with pytest.raises(TypeError):
            T2(np.ones((4, 4, 2)))
        qv = T2(_qmap())
        with pytest.raises(TypeError):
            qv.add_additional_volume("r2", np.ones((4, 4, 2)))


class TestSaveLoad:
    def test_round_trip_with_companions(self, tmp_path):
        qv = T2(_qmap())
        qv.add_additional_volume("r2", _qmap(seed=1, scale=1.0))
        qv.save_data(str(tmp_path))

        # map and companion live under <dir>/<NAME>/
        assert os.path.isfile(tmp_path / "t2" / "t2.nii.gz")
        assert os.path.isfile(tmp_path / "t2" / "t2-r2.nii.gz")

        reloaded = T2()
        reloaded.load_data(str(tmp_path))
        assert np.allclose(
            np.asarray(reloaded.volumetric_map.volume),
            np.asarray(qv.volumetric_map.volume),
            atol=1e-6,
        )

    def test_dicom_format_coerced_to_nifti(self, tmp_path):
        from dosma_tpu.core.io.format_io import ImageDataFormat

        qv = T1Rho(_qmap())
        with pytest.warns(UserWarning, match="nifti"):
            qv.save_data(str(tmp_path), data_format=ImageDataFormat.dicom)
        assert os.path.isfile(tmp_path / "t1_rho" / "t1_rho.nii.gz")

    def test_save_qvs_load_qvs(self, tmp_path):
        QuantitativeValue.save_qvs(str(tmp_path), [T2(_qmap()), T2Star(_qmap(seed=2))])
        found = QuantitativeValue.load_qvs(str(tmp_path))
        names = {type(q).__name__ for q in found}
        assert names == {"T2", "T2Star"}

    def test_save_qvs_type_checked(self, tmp_path):
        with pytest.raises(TypeError):
            QuantitativeValue.save_qvs(str(tmp_path), [T2(_qmap()), "not-a-qv"])


class TestToMetrics:
    def test_total_row_no_mask(self):
        qv = T2(_qmap())
        df = qv.to_metrics()
        assert list(df["Category"]) == ["total"]
        vol = np.asarray(qv.volumetric_map.volume)
        assert df["Mean"][0] == pytest.approx(float(vol.mean()), rel=1e-5)
        assert df["# Voxels"][0] == vol.size

    def test_per_label_rows(self):
        qv = T2(_qmap())
        mask = np.zeros((8, 8, 4), np.int32)
        mask[:4] = 1
        mask[4:] = 2
        df = qv.to_metrics(mask=MedicalVolume(mask, np.eye(4)))
        cats = list(df["Category"])
        assert cats == ["label_1", "label_2", "total"]
        assert df["# Voxels"][0] == 128 and df["# Voxels"][2] == 256

    def test_bounds_exclude_voxels(self):
        arr = np.full((4, 4, 2), 50.0, np.float32)
        arr[0, 0, 0] = 150.0  # outside (0, 100]
        qv = T2(MedicalVolume(arr, np.eye(4)))
        mask = MedicalVolume(np.ones((4, 4, 2), np.int32), np.eye(4))
        df = qv.to_metrics(mask=mask, bounds=(0, 100), closed="right")
        # the out-of-bounds voxel is dropped from label stats
        assert df[df["Category"] == "label_1"]["# Voxels"].iloc[0] == 31

    def test_custom_reducer_column(self):
        qv = T2(_qmap())
        df = qv.to_metrics(fns={"Max": np.max})
        assert "Max" in df.columns
        assert df["Max"][0] == pytest.approx(float(np.asarray(qv.volumetric_map.volume).max()))


class TestToMetricsDeviceResident:
    """Metrics-only mode (VERDICT r4 item 3): device-resident maps must
    produce DataFrames IDENTICAL to the host path without reading the full
    map back (per-region compressed gathers / on-device reductions)."""

    def _device_host_pair(self, with_nan=True):
        import jax.numpy as jnp

        rs = np.random.RandomState(11)
        arr = (rs.rand(16, 16, 6) * 80).astype(np.float32)
        if with_nan:
            arr[0, 0, 0] = np.nan
            arr[1, 1, 1] = 150.0  # outside (0, 100]
        host = T2(MedicalVolume(arr.copy(), np.eye(4)))
        dev = T2(MedicalVolume(jnp.asarray(arr), np.eye(4)))
        mask = np.zeros(arr.shape, np.int32)
        mask[:8] = 1
        mask[8:, :8] = 2
        return host, dev, MedicalVolume(mask, np.eye(4))

    def test_masked_matches_host_path(self):
        host, dev, mask = self._device_host_pair()
        df_h = host.to_metrics(mask=mask, bounds=(0, 100), closed="right")
        df_d = dev.to_metrics(mask=mask, bounds=(0, 100), closed="right")
        assert list(df_h["Category"]) == list(df_d["Category"])
        for col in ("Mean", "Std", "Median"):
            np.testing.assert_allclose(
                df_d[col].to_numpy(float), df_h[col].to_numpy(float), rtol=1e-6
            )
        assert list(df_h["# Voxels"]) == list(df_d["# Voxels"])

    def test_masked_custom_fns_match(self):
        host, dev, mask = self._device_host_pair()
        fns = {"Max": lambda v: float(np.max(v)) if v.size else np.nan}
        df_h = host.to_metrics(mask=mask, fns=fns)
        df_d = dev.to_metrics(mask=mask, fns=fns)
        np.testing.assert_allclose(
            df_d["Max"].to_numpy(float), df_h["Max"].to_numpy(float), rtol=1e-6
        )

    def test_unmasked_device_reduction_matches(self):
        host, dev, _ = self._device_host_pair()
        df_h = host.to_metrics(bounds=(0, 100))
        df_d = dev.to_metrics(bounds=(0, 100))
        assert df_d["# Voxels"][0] == df_h["# Voxels"][0]
        for col in ("Mean", "Std", "Median"):
            assert df_d[col][0] == pytest.approx(df_h[col][0], rel=1e-5)

    def test_empty_label_region(self):
        import jax.numpy as jnp

        arr = np.full((4, 4, 2), np.nan, np.float32)
        dev = T2(MedicalVolume(jnp.asarray(arr), np.eye(4)))
        mask = MedicalVolume(np.ones((4, 4, 2), np.int32), np.eye(4))
        df = dev.to_metrics(mask=mask)
        assert df["# Voxels"].iloc[0] == 0 and np.isnan(df["Mean"].iloc[0])
