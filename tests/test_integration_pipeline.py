"""End-to-end multi-scan pipeline integration test.

Mirrors the reference's headline workflow (BASELINE config 5 /
``scripts/multi-scan-script``): qDESS target (analytic T2) → CubeQuant
intra+inter-registration → T1ρ fit under a tissue mask → knee analytics
save — all on synthetic physics data derived from one shared "anatomy"
so registrations have real mutual structure.
"""

import os

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from dosma_tpu.core.io.dicom import Tag, write_dicom
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.orientation import SAGITTAL, to_affine
from dosma_tpu.core.quant_vals import T2
from dosma_tpu.scan_sequences.mri.cube_quant import CubeQuant
from dosma_tpu.scan_sequences.mri.qdess import QDess
from dosma_tpu.tissues import FemoralCartilage
from tests.util import build_dicom_dataset


def _write_qdess_series(dir_path, e1, e2):
    """Write two structured echoes as a sagittal dicom series."""
    os.makedirs(dir_path, exist_ok=True)
    from dosma_tpu.core.io.dicom.writer import generate_uid

    series_uid = generate_uid()
    extra = {
        Tag(0x0019, 0x10B6): 3132.0,
        Tag(0x0019, 0x10B7): 1560.0,
        "RepetitionTime": 25.0,
        "FlipAngle": 30.0,
    }
    i = 0
    for echo, (arr, et) in enumerate([(e1, 8.0), (e2, 42.0)], start=1):
        for s in range(arr.shape[2]):
            ds = build_dicom_dataset(
                arr[:, :, s],
                instance_number=i + 1,
                echo_number=echo,
                echo_time=et,
                position=(s * 1.0, 0.0, 0.0),
                spacing=(0.5, 0.5),
                orientation=(0, 1, 0, 0, 0, -1),  # sagittal
                series_uid=series_uid,
                extra=extra,
            )
            write_dicom(ds, os.path.join(dir_path, f"I{i + 1:04d}.dcm"))
            i += 1


def test_full_knee_pipeline(tmp_path):
    work = tmp_path

    # Shared anatomy: smooth structured field in (48, 48, 8).
    rs = np.random.RandomState(3)
    anatomy = gaussian_filter(rs.rand(48, 48, 8), 3)
    anatomy = (anatomy - anatomy.min()) / (anatomy.max() - anatomy.min())

    # ---- 1. qDESS: echoes derived from the anatomy ---------------------
    qdess_dir = work / "qdess_dicoms"
    e1 = (anatomy * 3000 + 100).astype(np.uint16)
    e2 = (anatomy * 1200 + 50).astype(np.uint16)
    _write_qdess_series(str(qdess_dir), e1, e2)

    qdess = QDess.from_dicom(str(qdess_dir))
    t2 = qdess.generate_t2_map(t1=1200.0)
    assert np.asarray(t2.volumetric_map.A).shape == qdess.volumes[0].shape

    target_path = str(work / "target.nii.gz")
    qdess.volumes[0].astype(np.float32).save_volume(target_path)
    affine = qdess.volumes[0].affine
    shape = qdess.volumes[0].shape

    # ---- 2. CubeQuant: spin locks from the same anatomy, with motion ---
    tc = anatomy * 60 + 15  # T1rho in (15, 75) ms
    a = 1.0 + anatomy
    spin_lock_times = [1.0, 10.0, 30.0, 60.0]

    vols = []
    for i, t in enumerate(spin_lock_times):
        arr = (a * np.exp(-t / tc)).astype(np.float32)
        if i > 0:  # simulate slight inter-acquisition motion
            arr = np.roll(arr, (1, -1, 0), axis=(0, 1, 2))
        mv = MedicalVolume(arr, affine)
        mv.set_metadata("EchoTime", float(t), force=True)
        vols.append(mv)

    cq = CubeQuant(vols)
    cq.intraregister()
    cq.interregister(target_path)
    assert len(cq.volumes) == 4
    assert tuple(cq.volumes[0].shape) == tuple(shape)

    # ---- 3. T1rho fit under a tissue mask ------------------------------
    fc = FemoralCartilage(medial_to_lateral=True)
    mask = np.zeros(shape, np.uint8)
    mask[12:36, 12:36, 2:6] = 1
    fc.set_mask(MedicalVolume(mask, affine), use_largest_cc=False, split_regions=False)

    qv_map = cq.generate_t1_rho_map(fc)
    est = np.asarray(qv_map.volumetric_map.A)
    sel = mask[14:34, 14:34, 3:5] > 0
    err = np.abs(est[14:34, 14:34, 3:5][sel] - tc[14:34, 14:34, 3:5][sel])
    # Interregistered volumes are interpolated, so tolerate smoothing error.
    assert np.median(err) < 8.0
    assert "r2" in qv_map.additional_volumes

    # ---- 4. Persist scan + tissue analytics ----------------------------
    save_dir = work / "data"
    qdess.save(str(save_dir / "qdess"), save_custom=True)
    cq.save(str(save_dir / "cubequant"), save_custom=True)
    fc.add_quantitative_value(T2(t2.volumetric_map))
    fc.calc_quant_vals()
    fc.save_data(str(save_dir))

    assert os.path.isfile(save_dir / "qdess" / "qdess.data")
    assert os.path.isfile(save_dir / "cubequant" / "cubequant.data")
    assert os.path.isfile(save_dir / "fc" / "fc.nii.gz")
    assert os.path.isfile(save_dir / "fc" / "t1_rho" / "t1_rho.nii.gz")

    # ---- 5. Reload ------------------------------------------------------
    cq2 = CubeQuant.load(str(save_dir / "cubequant"))
    assert len(cq2.volumes) == 4
