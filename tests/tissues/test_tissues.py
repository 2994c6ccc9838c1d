"""Tissue analytics tests (model: reference tests/tissues/)."""

import numpy as np
import pytest

from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL, to_affine
from dosma_tpu.core.quant_vals import T2
from dosma_tpu.tissues import (
    FemoralCartilage,
    Meniscus,
    PatellarCartilage,
    TibialCartilage,
    largest_cc,
)


def _fc_mask_and_map(shape=(64, 64, 16), seed=0):
    """Synthetic condyle-like mask: an annular arc in each sagittal slice."""
    rs = np.random.RandomState(seed)
    h, w, d = shape
    yv, xv = np.meshgrid(range(h), range(w), indexing="ij")
    cx, cy, R = w / 2, h / 2, h / 3
    rad = np.sqrt((xv - cx) ** 2 + (yv - cy) ** 2)
    annulus = (rad > R * 0.8) & (rad < R * 1.1) & (yv > cy - R)  # inferior arc
    mask = np.repeat(annulus[..., None], d, axis=2).astype(np.uint8)
    qmap = (rs.rand(*shape) * 40 + 20) * mask
    affine = to_affine(SAGITTAL)
    return (
        MedicalVolume(mask, affine),
        MedicalVolume(qmap, affine),
    )


class TestLargestCC:
    def test_keeps_biggest(self):
        mask = np.zeros((10, 10, 4), np.uint8)
        mask[0:6, 0:6] = 1  # big
        mask[8:9, 8:9] = 1  # small
        out = largest_cc(mask)
        assert out[1, 1, 1] and not out[8, 8, 0]

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            largest_cc(np.zeros((4, 4, 2)))


class TestFemoralCartilage:
    def test_set_mask_and_split(self):
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        fc.set_mask(mask)
        assert fc.regions_mask is not None
        assert fc.regions_mask.shape == mask.shape
        assert fc.ML_BOUNDARY is not None
        assert len(fc.ACP_BOUNDARY) == 2
        # every masked voxel must have exactly one coronal, one sagittal key
        rm = fc.regions_mask[np.asarray(mask.A) > 0]
        acp = rm & (fc._ANTERIOR_KEY | fc._CENTRAL_KEY | fc._POSTERIOR_KEY)
        assert np.all(np.isin(acp, [fc._ANTERIOR_KEY, fc._CENTRAL_KEY, fc._POSTERIOR_KEY]))
        ml = rm & (fc._MEDIAL_KEY | fc._LATERAL_KEY)
        assert np.all(np.isin(ml, [fc._MEDIAL_KEY, fc._LATERAL_KEY]))

    def test_unroll_shapes(self):
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        fc.set_mask(mask)
        total, superficial, deep = fc.unroll(
            np.asarray(qmap.A), fc.regions_mask, fc.theta_bins
        )
        nbins = len(np.unique(fc.theta_bins))
        assert total.shape == (nbins, mask.shape[-1])
        assert superficial.shape == total.shape and deep.shape == total.shape
        # where total defined, must be within map range
        vals = total[np.isfinite(total)]
        assert len(vals) > 0
        assert np.all((vals >= 20) & (vals <= 60))

    def test_calc_quant_vals_regions(self):
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        fc.set_mask(mask)
        fc.add_quantitative_value(T2(qmap))
        fc.calc_quant_vals()
        assert "T2" in fc.quant_vals
        maps, df = fc.quant_vals["T2"]
        assert len(df) == 18  # 3 axial x 2 sagittal x 3 coronal
        assert set(df.columns) >= {"Mean", "Std", "Median", "# Voxels"}
        assert len(maps) == 3

    def test_calc_quant_vals_device_resident_map(self):
        # A device-backed map starts its async D2H in add_quantitative_value;
        # analytics must produce numbers identical to the host-backed path.
        import dosma_tpu as dm

        fc_host = FemoralCartilage(medial_to_lateral=True)
        fc_dev = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        for fc, m in ((fc_host, qmap), (fc_dev, qmap.to(dm.Device(0)))):
            fc.set_mask(mask)
            fc.add_quantitative_value(T2(m))
            fc.calc_quant_vals()
        df_host = fc_host.quant_vals["T2"][1]
        df_dev = fc_dev.quant_vals["T2"][1]
        np.testing.assert_allclose(
            df_host["Mean"].to_numpy(dtype=float),
            df_dev["Mean"].to_numpy(dtype=float),
            rtol=1e-5,
            equal_nan=True,
        )

    def test_save_data(self, tmp_path):
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        fc.set_mask(mask)
        fc.add_quantitative_value(T2(qmap))
        fc.calc_quant_vals()
        fc.save_data(str(tmp_path))
        import os

        assert os.path.isfile(tmp_path / "fc" / "fc.nii.gz")
        assert os.path.isfile(tmp_path / "fc" / "t2" / "t2.nii.gz")
        assert os.path.isfile(tmp_path / "fc" / "data.xlsx")

    def test_load_data_roundtrip(self, tmp_path):
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        fc.set_mask(mask)
        fc.add_quantitative_value(T2(qmap))
        fc.calc_quant_vals()
        fc.save_data(str(tmp_path))

        fc2 = FemoralCartilage(medial_to_lateral=True)
        fc2.load_data(str(tmp_path))
        assert fc2.get_mask() is not None
        assert np.array_equal(np.asarray(fc2.get_mask().A), np.asarray(fc.get_mask().A))
        assert len(fc2.quantitative_values) == 1


class TestTibialCartilage:
    def test_regions_and_metrics(self, tmp_path):
        tc = TibialCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map(seed=2)
        tc.set_mask(mask)
        assert tc.regions_mask.shape == mask.shape + (3,)
        tc.add_quantitative_value(T2(qmap))
        tc.calc_quant_vals()
        maps, df = tc.quant_vals["T2"]
        assert len(df) == 18  # 3 x 2 x 3
        tc.save_data(str(tmp_path))

    def test_unroll_axial_shape_mismatch_raises(self):
        """The compressed gather must raise on a wrong-shaped quant map like
        the dense ``sel * mask * quant_map`` broadcast did — not silently
        index a wrong-strided volume."""
        tc = TibialCartilage(medial_to_lateral=True)
        mask, _ = _fc_mask_and_map(seed=2)
        tc.set_mask(mask)
        wrong = np.zeros(tuple(s + 1 for s in mask.shape))
        with pytest.raises(ValueError, match="shape"):
            tc.unroll_axial(wrong)


class TestPatellarCartilage:
    def test_regions_and_metrics(self, tmp_path):
        pc = PatellarCartilage(medial_to_lateral=False)
        mask, qmap = _fc_mask_and_map(seed=3)
        pc.set_mask(mask)
        assert pc.regions_mask.shape == mask.shape + (2,)
        pc.add_quantitative_value(T2(qmap))
        pc.calc_quant_vals()
        maps, df = pc.quant_vals["T2"]
        assert len(df) == 6  # 3 x 2
        pc.save_data(str(tmp_path))


class TestMeniscus:
    def test_regions_and_metrics(self, tmp_path):
        men = Meniscus(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map(seed=4)
        men.set_mask(mask)
        men.add_quantitative_value(T2(qmap))
        men.calc_quant_vals()
        maps, df = men.quant_vals["T2"]
        assert len(df) > 0
        assert "Subject" in df.columns
        men.save_data(str(tmp_path))

    def test_split_ml_only(self):
        men = Meniscus(medial_to_lateral=True, split_ml_only=True)
        mask, qmap = _fc_mask_and_map(seed=5)
        men.set_mask(mask)
        men.add_quantitative_value(T2(qmap))
        men.calc_quant_vals()
        maps, df = men.quant_vals["T2"]
        # Only total-total-{medial, lateral} + "total" row from to_metrics
        assert len(df) == 3


class TestKneeWorkflow:
    def test_handle_knee(self, tmp_path):
        from dosma_tpu.msk import knee

        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        fc.set_mask(mask)
        fc.add_quantitative_value(T2(qmap))
        fc.calc_quant_vals()
        load_dir = tmp_path / "load"
        fc.save_data(str(load_dir))

        vargin = {
            knee.TISSUES_KEY: [FemoralCartilage()],
            knee.LOAD_KEY: str(load_dir),
            knee.SAVE_KEY: str(tmp_path / "save"),
            knee.MEDIAL_TO_LATERAL_KEY: True,
            knee.PID_KEY: "test-pid",
            "t2": True,
            "t1_rho": False,
            "t2_star": False,
        }
        tissues = knee.handle_knee(vargin)
        assert len(tissues) == 1
        import os

        assert os.path.isdir(tmp_path / "save" / "fc")


def test_find_weights_extension_rule(tmp_path):
    """Extension matching is endswith('h5') — reference semantics: '.h5'
    matches, '.hdf5' does not (it ends in 'f5')."""
    import pytest as _pytest

    from dosma_tpu.tissues.femoral_cartilage import FemoralCartilage

    (tmp_path / "iwoai_fc_weights.hdf5").write_bytes(b"x")
    fc = FemoralCartilage()
    with _pytest.raises(ValueError, match="No file found"):
        fc.find_weights(str(tmp_path))

    good = tmp_path / "iwoai_fc_weights.h5"
    good.write_bytes(b"x")
    assert fc.find_weights(str(tmp_path)) == str(good)


def test_load_data_dispatches_set_mask(tmp_path):
    """load_data must route through set_mask so region splitting runs —
    otherwise calc_quant_vals on freshly loaded tissues hits
    regions_mask=None assertions (knee workflow on saved data)."""
    import numpy as np

    from dosma_tpu.core.med_volume import MedicalVolume
    from dosma_tpu.core.orientation import SAGITTAL, to_affine
    from dosma_tpu.tissues.tibial_cartilage import TibialCartilage

    mask = np.zeros((32, 32, 8), np.uint8)
    mask[8:24, 8:24, 2:6] = 1
    mv = MedicalVolume(mask, to_affine(SAGITTAL, (0.5, 0.5, 1.0)))

    tc = TibialCartilage()
    tc.set_mask(mv)
    tc.save_data(str(tmp_path))

    tc2 = TibialCartilage()
    tc2.load_data(str(tmp_path))
    assert tc2.get_mask() is not None
    assert tc2.regions_mask is not None


class TestVectorizedAnalyticsParity:
    """Pin the extract-once/scatter implementations to a brute-force
    per-(bin, slice) loop transcription of the reference algorithm
    (ref femoral_cartilage.py:86-285)."""

    def test_split_regions_matches_bruteforce(self):
        from dosma_tpu.utils.geometry_utils import cart2pol, circle_fit

        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map(shape=(48, 48, 9))
        fc.set_mask(mask, use_largest_cc=False, split_regions=True)
        regions = fc.regions_mask

        # --- brute force, straight from the reference's loop structure ---
        m = np.asarray(mask.A, np.float32)
        m = m * np.nan_to_num(m)
        h, w, d = m.shape
        proj = np.max(m, 2)
        nz = np.nonzero(proj)
        xc, yc, _ = circle_fit(nz[1], nz[0])
        yv, xv = np.meshgrid(
            np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij"
        )
        rho, th = cart2pol(xv - np.float32(xc), np.float32(yc) - yv)
        th = (th >= 90) * (th - 360) + (th < 90) * th
        bins = np.floor((th + 270) / 5).astype(int)
        thr = np.zeros((72, d), np.float32)
        for b in range(72):
            for s in range(d):
                sel = (bins == b)[:, :, None] & (np.arange(d) == s)[None, None, :] & (m > 0)
                if sel.any():
                    r = rho[np.any(sel, axis=2)]
                    rmin, rmax = np.float32(r.min()), np.float32(r.max())
                    thr[b, s] = np.float32(0.5) * (rmax - rmin) + rmin
        expected = np.zeros(m.shape, np.uint16)
        slice_sums = m.sum(axis=(0, 1), dtype=np.float64)
        com = float((slice_sums * np.arange(d)).sum() / slice_sums.sum())
        boundary = int(np.ceil(com))
        for i in range(h):
            for j in range(w):
                for s in range(d):
                    v = 0
                    v |= (
                        fc._ANTERIOR_KEY
                        if th[i, j] < -105
                        else (fc._CENTRAL_KEY if th[i, j] < -75 else fc._POSTERIOR_KEY)
                    )
                    v |= fc._MEDIAL_KEY if s < boundary else fc._LATERAL_KEY
                    t = thr[bins[i, j], s]
                    if rho[i, j] <= t:
                        v |= fc._DEEP_KEY
                    if rho[i, j] >= t:
                        v |= fc._SUPERFICIAL_KEY
                    v |= fc._TOTAL_AXIAL_KEY
                    expected[i, j, s] = v
        np.testing.assert_array_equal(regions, expected)

    def test_split_regions_base_map_nan_zero_parity(self):
        """base_map voxels that are NaN or <= 0 are excluded exactly like the
        reference's ``mask * nan_to_num(base_map) > 0`` product form, and the
        ML center-of-mass stays weighted by the product values."""
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map(shape=(48, 48, 9))
        q = np.asarray(qmap.A, np.float64).copy()
        rs = np.random.RandomState(7)
        inside = np.nonzero(np.asarray(mask.A))
        # Knock out ~20% of in-mask voxels with NaN and another ~20% with 0.
        n = len(inside[0])
        drop = rs.permutation(n)
        q[tuple(i[drop[: n // 5]] for i in inside)] = np.nan
        q[tuple(i[drop[n // 5 : 2 * n // 5]] for i in inside)] = 0.0
        fc.set_mask(mask, use_largest_cc=False, split_regions=True)

        regions, theta_bins, boundary, acp = fc.split_regions(q)

        # Product-form oracle (reference semantics): recompute the valid set
        # and COM boundary from mask * nan_to_num(base).
        prod = np.asarray(mask.A, np.float64) * np.nan_to_num(q)
        slice_sums = prod.sum(axis=(0, 1))
        com = float((slice_sums * np.arange(prod.shape[-1])).sum() / slice_sums.sum())
        assert boundary == int(np.ceil(com))
        # Valid voxels drive the per-(bin, slice) thresholds; spot-check that
        # thresholds derived from a run WITHOUT the NaN/zero knockouts differ
        # (i.e. the knockouts were not silently ignored).
        regions_clean, _, _, _ = fc.split_regions(np.asarray(qmap.A))
        assert not np.array_equal(regions, regions_clean)

    def test_unroll_matches_bruteforce(self):
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map(shape=(48, 48, 9))
        fc.set_mask(mask, use_largest_cc=False, split_regions=True)
        q = np.asarray(qmap.A)
        total, superficial, deep = fc.unroll(q, fc.regions_mask, fc.theta_bins)

        m = np.asarray(mask.A)
        bins = fc.theta_bins.astype(int)
        d = q.shape[-1]
        nb = int(np.max(bins)) + 1

        def brute(layer_bit):
            out = np.full((nb, d), np.nan)
            for b in range(nb):
                for s in range(d):
                    sel = (bins == b)[:, :, None] & (np.arange(d) == s)[None, None, :]
                    sel = sel & (m > 0) & (np.nan_to_num(q) * m > 0)
                    if layer_bit:
                        sel = sel & ((fc.regions_mask & layer_bit) != 0)
                    if sel.any():
                        val = q[sel].mean()
                        out[b, s] = np.nan if val == 0 else val
            return out

        for got, bit in ((total, 0), (superficial, fc._SUPERFICIAL_KEY), (deep, fc._DEEP_KEY)):
            np.testing.assert_allclose(got, brute(bit), rtol=1e-12, equal_nan=True)

    def test_region_stats_match_bruteforce(self):
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map(shape=(48, 48, 9))
        fc.set_mask(mask, use_largest_cc=False, split_regions=True)
        fc.add_quantitative_value(T2(qmap))
        fc.calc_quant_vals()
        df = fc.quant_vals["T2"][1]

        # Reference loop semantics: region bits all set AND masked value > 0.
        regions, _, _, _ = fc.split_regions(np.asarray(qmap.A))
        masked_q = np.asarray(mask.A) * np.nan_to_num(np.asarray(qmap.A))
        idx = 0
        for axial in fc._AXIAL_KEYS:
            for sagittal in fc._SAGITTAL_KEYS:
                for coronal in fc._CORONAL_KEYS:
                    roi = axial | coronal | sagittal
                    vals = ((regions & roi) == roi) * masked_q
                    vals = vals[vals > 0]
                    row = df.iloc[idx]
                    assert row["# Voxels"] == len(vals)
                    if len(vals):
                        np.testing.assert_allclose(row["Mean"], vals.mean())
                        np.testing.assert_allclose(row["Median"], np.median(vals))
                    idx += 1


class TestQuantMapValidation:
    def test_calc_quant_vals_shape_mismatch_raises(self):
        """The compressed gather path must reject a map whose shape differs
        from the mask instead of silently indexing with the mask's strides
        (regression: the dense path raised on broadcast, the compressed
        rewrite did not)."""
        fc = FemoralCartilage(medial_to_lateral=True)
        mask, qmap = _fc_mask_and_map()
        fc.set_mask(mask)
        h, w, d = mask.shape
        bad = MedicalVolume(np.ones((h, w, d + 4), np.float32), mask.affine)
        fc.add_quantitative_value(T2(bad))
        with pytest.raises(ValueError, match="does not match"):
            fc.calc_quant_vals()
