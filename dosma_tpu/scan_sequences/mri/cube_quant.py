"""CubeQuant (T1ρ) scan sequence.

Behavior-parity re-design of
``/root/reference/dosma/scan_sequences/mri/cube_quant.py:31-295``: 4
spin-lock volumes, intra-registration to the first (highest-SNR) spin lock,
inter-registration to a target with transform reuse, and monoexponential
T1ρ fitting (bounds (0, 500) ms, polyfit seeding, precision 3) — the fit
runs as one batched TPU LM launch.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

from dosma_tpu import file_constants as fc
from dosma_tpu.core import quant_vals as qv
from dosma_tpu.core.fitting import MonoExponentialFit
from dosma_tpu.core.io import format_io_utils as fio_utils
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.registration import register
from dosma_tpu.scan_sequences.scans import NonTargetSequence
from dosma_tpu.tissues.tissue import Tissue
from dosma_tpu.utils.cmd_line_utils import ActionWrapper

__all__ = ["CubeQuant"]

_logger = logging.getLogger(__name__)

__T1_RHO_LOWER_BOUND__ = 0
__T1_RHO_UPPER_BOUND__ = 500
__T1_RHO_DECIMAL_PRECISION__ = 3


class CubeQuant(NonTargetSequence):
    """CubeQuant 3D FSE T1ρ-weighted sequence (4 spin-lock times)."""

    NAME = "cubequant"

    def __init__(self, volumes: Sequence[MedicalVolume], spin_lock_times: Sequence[float] = None):
        super().__init__(volumes=volumes)
        if spin_lock_times is None:
            try:
                if all(x.headers() is not None for x in self.volumes):
                    spin_lock_times = [x.get_metadata("EchoTime", float) for x in self.volumes]
            except (KeyError, AttributeError, RuntimeError) as e:
                raise ValueError(
                    f"Could not extract spin lock times from header. "
                    f"Please specify `spin_lock_times` argument - {e}"
                )
        self.spin_lock_times = spin_lock_times

    # ------------------------------------------------------------------
    def intraregister(self):
        """Register all later spin-lock volumes to the first (highest SNR)
        spin lock (ref ``cube_quant.py:187-242``)."""
        self.__intraregister__()

    def __intraregister__(self):
        volumes = self.volumes
        spin_lock_times = self.spin_lock_times
        idxs = np.argsort(spin_lock_times)
        volumes = [volumes[i] for i in idxs]

        _logger.info("Intraregistering...")
        out_path = os.path.join(self.temp_path, "intraregister")
        _, reg_vols = register(
            volumes[0],
            volumes[1:],
            fc.ELASTIX_AFFINE_PARAMS_FILE,
            out_path,
            return_volumes=True,
            rtype=tuple,
        )
        reg_vols = [volumes[0]] + list(reg_vols)

        # Transplant header information from the originals.
        reg_vols = [
            reg._partial_clone(volume=False, headers=vol.headers())
            for (reg, vol) in zip(reg_vols, volumes)
        ]

        reverse_idxs = {v: i for i, v in enumerate(idxs)}
        self.volumes = [reg_vols[reverse_idxs[k]] for k in sorted(reverse_idxs.keys())]

    # ------------------------------------------------------------------
    def interregister(self, target_path: str, target_mask_path: str = None):
        """Anchor on the FIRST (highest-SNR) spin lock; shared base-class
        flow (ref ``cube_quant.py:73-137``)."""
        self._interregister_to_target(
            target_path, target_mask_path, self.spin_lock_times, base_position="first"
        )

    # ------------------------------------------------------------------
    def generate_t1_rho_map(self, tissue: Tissue = None, mask_path: str = None, num_workers: int = 0):
        """Monoexponential T1ρ map (bounds (0, 500) ms — ref ``cube_quant.py:139-185``)."""
        spin_lock_times = self.spin_lock_times
        subvolumes_list = self.volumes

        mask = tissue.get_mask() if tissue is not None else None
        if mask_path is not None:
            mask = (
                fio_utils.generic_load(mask_path, expected_num_volumes=1)
                if isinstance(mask_path, (str, os.PathLike))
                else mask_path
            )

        mef = MonoExponentialFit(
            bounds=(__T1_RHO_LOWER_BOUND__, __T1_RHO_UPPER_BOUND__),
            tc0="polyfit",
            decimal_precision=__T1_RHO_DECIMAL_PRECISION__,
            num_workers=num_workers,
        )
        t1rho_map, r2 = mef.fit(spin_lock_times, subvolumes_list, mask=mask)

        quant_val_map = qv.T1Rho(t1rho_map)
        quant_val_map.add_additional_volume("r2", r2)
        if tissue is not None:
            tissue.add_quantitative_value(quant_val_map)
        return quant_val_map

    # ------------------------------------------------------------------
    def _save(self, metadata, save_dir: str, fname_fmt=None, **kwargs):
        default_fmt = {MedicalVolume: "echo-{}"}
        default_fmt.update(fname_fmt if fname_fmt else {})
        return super()._save(metadata, save_dir, fname_fmt=default_fmt, **kwargs)

    @classmethod
    def from_dict(cls, data, force: bool = False) -> "CubeQuant":
        interregistered_dirpath = None
        if "subvolumes" in data:
            interregistered_dirpath = os.path.dirname(data.pop("subvolumes")[0])
        scan = super().from_dict(data, force=force)
        if interregistered_dirpath is not None:
            subvolumes = scan.__load_interregistered_files__(interregistered_dirpath)
            scan.volumes = [subvolumes[k] for k in sorted(subvolumes.keys())]
        return scan

    @classmethod
    def cmd_line_actions(cls):
        intraregister_action = ActionWrapper(
            name=cls.intraregister.__name__, help="register volumes within this scan"
        )
        interregister_action = ActionWrapper(
            name=cls.interregister.__name__,
            help="register to another scan",
            param_help={
                "target_path": "path to target image in nifti format (.nii.gz)",
                "target_mask_path": "path to target mask in nifti format (.nii.gz)",
            },
            alternative_param_names={
                "target_path": ["tp", "target"],
                "target_mask_path": ["tm", "target_mask"],
            },
        )
        generate_t1rho_map_action = ActionWrapper(
            name=cls.generate_t1_rho_map.__name__,
            help="generate T1-rho map",
            aliases=["t1_rho"],
            param_help={
                "mask_path": "Mask used for fitting select voxels - in nifti format (.nii.gz)"
            },
        )
        return [
            (cls.intraregister, intraregister_action),
            (cls.interregister, interregister_action),
            (cls.generate_t1_rho_map, generate_t1rho_map_action),
        ]
