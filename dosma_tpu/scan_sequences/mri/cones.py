"""UTE-Cones (T2*) scan sequence.

Behavior-parity re-design of
``/root/reference/dosma/scan_sequences/mri/cones.py:32-228``: 4 echoes, the
LAST echo anchors inter-registration (ref ``:99-100``) with transform reuse
for earlier echoes; monoexponential T2* fit with bounds (0, ∞) on the
batched TPU engine.
"""

from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

from dosma_tpu.core import quant_vals as qv
from dosma_tpu.core.fitting import MonoExponentialFit
from dosma_tpu.core.io import format_io_utils as fio_utils
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.scan_sequences.scans import NonTargetSequence
from dosma_tpu.tissues.tissue import Tissue
from dosma_tpu.utils.cmd_line_utils import ActionWrapper

__all__ = ["Cones"]

_logger = logging.getLogger(__name__)

_T2STAR_RANGE = (0, np.inf)
_T2STAR_DECIMALS = 3


class Cones(NonTargetSequence):
    """Ultra-short echo time Cones T2*-weighted sequence."""

    NAME = "cones"

    def __init__(self, volumes, echo_times: Sequence[float] = None):
        super().__init__(volumes)
        if echo_times is None:
            try:
                if all(x.headers() is not None for x in self.volumes):
                    echo_times = [x.get_metadata("EchoTime", float) for x in self.volumes]
            except (KeyError, AttributeError, RuntimeError) as e:
                raise ValueError(
                    f"Could not extract echo times from header. "
                    f"Please specify `echo_times` argument - {e}"
                )
        self.echo_times = echo_times

    def interregister(self, target_path: str, target_mask_path: str = None):
        """Anchor on the LAST (highest-SNR) echo; shared base-class flow."""
        self._interregister_to_target(
            target_path, target_mask_path, self.echo_times, base_position="last"
        )

    def generate_t2_star_map(self, tissue: Tissue = None, mask_path: str = None,
                             num_workers: int = 0):
        """Monoexponential T2* map, bounds (0, ∞) (ref ``cones.py:130-178``)."""
        mask = tissue.get_mask() if tissue is not None else None
        if mask_path is not None:
            mask = (
                fio_utils.generic_load(mask_path, expected_num_volumes=1)
                if isinstance(mask_path, (str, os.PathLike))
                else mask_path
            )

        fitter = MonoExponentialFit(
            bounds=_T2STAR_RANGE,
            tc0="polyfit",
            decimal_precision=_T2STAR_DECIMALS,
            num_workers=num_workers,
        )
        t2star_map, r2 = fitter.fit(self.echo_times, self.volumes, mask=mask)

        result = qv.T2Star(t2star_map)
        result.add_additional_volume("r2", r2)
        if tissue is not None:
            tissue.add_quantitative_value(result)
        return result

    def _save(self, metadata, save_dir, fname_fmt=None, **kwargs):
        fmt = {MedicalVolume: "echo-{}", **(fname_fmt or {})}
        return super()._save(metadata, save_dir, fname_fmt=fmt, **kwargs)

    @classmethod
    def from_dict(cls, data, force: bool = False) -> "Cones":
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
        return [
            (
                cls.interregister,
                ActionWrapper(
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
                ),
            ),
            (
                cls.generate_t2_star_map,
                ActionWrapper(
                    name=cls.generate_t2_star_map.__name__,
                    help="generate T2-star map",
                    param_help={
                        "mask_path": "Mask used for fitting select voxels - "
                        "in nifti format (.nii.gz)"
                    },
                    aliases=["t2_star"],
                ),
            ),
        ]
