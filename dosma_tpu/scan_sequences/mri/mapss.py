"""MAPSS scan sequence (T1ρ + T2 from one 7-echo acquisition).

Behavior-parity re-design of
``/root/reference/dosma/scan_sequences/mri/mapss.py:39-293``: echoes 1..6
each registered to echo 0 with affines copied back from the originals;
T1ρ from echoes 0–3 (bounds (0, 500)); T2 from echoes [0, 4, 5, 6]
(bounds (0, 100)); shared fitting helper sorts by echo time.
"""

from __future__ import annotations

import logging
import os
from copy import deepcopy
from typing import List, Sequence

from dosma_tpu import file_constants as fc
from dosma_tpu.core import quant_vals as qv
from dosma_tpu.core.fitting import MonoExponentialFit
from dosma_tpu.core.io import format_io_utils as fio_utils
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.core.registration import register
from dosma_tpu.scan_sequences.scans import ScanSequence
from dosma_tpu.tissues.tissue import Tissue
from dosma_tpu.utils.cmd_line_utils import ActionWrapper

__all__ = ["Mapss"]

_logger = logging.getLogger(__name__)

__EXPECTED_NUM_ECHO_TIMES__ = 7
__T1_RHO_LOWER_BOUND__ = 0
__T1_RHO_UPPER_BOUND__ = 500
__T2_LOWER_BOUND__ = 0
__T2_UPPER_BOUND__ = 100
__DECIMAL_PRECISION__ = 3


class Mapss(ScanSequence):
    """3D MAPSS SPGR sequence (4 spin-lock + 3 TE volumes)."""

    NAME = "mapss"

    def __init__(self, volumes: Sequence[MedicalVolume], echo_times: Sequence[float] = None):
        if not isinstance(volumes, (list, tuple)):
            raise ValueError("`volumes` must be sequence of MedicalVolumes.")
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

    def __validate_scan__(self):
        return len(self.volumes) == __EXPECTED_NUM_ECHO_TIMES__

    def __intraregister__(self, volumes: List[MedicalVolume]):
        """Register echoes 1..N-1 to echo 0; copy original affines back
        (ref ``mapss.py:80-148``)."""
        if (
            (not volumes)
            or (not isinstance(volumes, list))
            or (len(volumes) != __EXPECTED_NUM_ECHO_TIMES__)
        ):
            raise TypeError("`volumes` must be of type List[MedicalVolume]")

        _logger.info("Intraregistering...")
        out_path = os.path.join(self.temp_path, "intraregistered")

        target = volumes[0]
        intraregistered = [deepcopy(target)]
        for echo_index in range(1, len(volumes)):
            out = register(
                target,
                volumes[echo_index],
                fc.ELASTIX_AFFINE_PARAMS_FILE,
                output_path=os.path.join(out_path, f"{echo_index:03d}"),
                return_volumes=True,
                rtype=tuple,
            )
            intrareg_vol = out[1][0]
            # Copy affine + headers from the original volume (nifti round
            # trips lose precision — ref ``mapss.py:138-145``).
            intrareg_vol = MedicalVolume(
                volume=intrareg_vol.volume,
                affine=volumes[echo_index].affine,
                headers=deepcopy(volumes[echo_index].headers()),
            )
            intraregistered.append(intrareg_vol)

        self.volumes = intraregistered

    def intraregister(self):
        """Intra-register volumes."""
        self.__intraregister__(self.volumes)

    def generate_t1_rho_map(self, tissue: Tissue = None, mask_path: str = None, num_workers: int = 0):
        """T1ρ from echoes 0–3 (ref ``mapss.py:154-179``)."""
        return self.__fitting_helper(
            qv.T1Rho, range(4), tissue,
            (__T1_RHO_LOWER_BOUND__, __T1_RHO_UPPER_BOUND__),
            "polyfit", __DECIMAL_PRECISION__, mask_path, num_workers,
        )

    def generate_t2_map(self, tissue: Tissue = None, mask_path: str = None, num_workers: int = 0):
        """T2 from echoes [0, 4, 5, 6] (ref ``mapss.py:181-204``)."""
        return self.__fitting_helper(
            qv.T2, [0, 4, 5, 6], tissue,
            (__T2_LOWER_BOUND__, __T2_UPPER_BOUND__),
            "polyfit", __DECIMAL_PRECISION__, mask_path, num_workers,
        )

    def __fitting_helper(
        self, qv_type, echo_inds, tissue, bounds, tc0, decimal_precision, mask_path, num_workers
    ):
        echo_info = sorted(
            [(self.echo_times[i], self.volumes[i]) for i in echo_inds], key=lambda x: x[0]
        )
        xs = [et for et, _ in echo_info]
        ys = [vol for _, vol in echo_info]

        mask = tissue.get_mask() if tissue is not None else None
        if mask_path is not None:
            mask = (
                fio_utils.generic_load(mask_path, expected_num_volumes=1)
                if isinstance(mask_path, (str, os.PathLike))
                else mask_path
            )

        mef = MonoExponentialFit(
            bounds=bounds, tc0=tc0, decimal_precision=decimal_precision, num_workers=num_workers
        )
        qv_map, r2 = mef.fit(xs, ys, mask=mask)

        quant_val_map = qv_type(qv_map)
        quant_val_map.add_additional_volume("r2", r2)
        if tissue is not None:
            tissue.add_quantitative_value(quant_val_map)
        return quant_val_map

    def _save(self, metadata, save_dir, fname_fmt=None, **kwargs):
        default_fmt = {MedicalVolume: "echo-{}"}
        default_fmt.update(fname_fmt if fname_fmt else {})
        return super()._save(metadata, save_dir, fname_fmt=default_fmt, **kwargs)

    @classmethod
    def cmd_line_actions(cls):
        intraregister_action = ActionWrapper(
            name=cls.intraregister.__name__, help="register volumes within this scan"
        )
        generate_t1_rho_map_action = ActionWrapper(
            name=cls.generate_t1_rho_map.__name__,
            aliases=["t1_rho"],
            param_help={"mask_path": "mask filepath (.nii.gz) to reduce computation"},
            help="generate T1-rho map using monoexponential fit",
        )
        generate_t2_map_action = ActionWrapper(
            name=cls.generate_t2_map.__name__,
            aliases=["t2"],
            param_help={"mask_path": "mask filepath (.nii.gz) to reduce computation"},
            help="generate T2 map using monoexponential fit",
        )
        return [
            (cls.intraregister, intraregister_action),
            (cls.generate_t1_rho_map, generate_t1_rho_map_action),
            (cls.generate_t2_map, generate_t2_map_action),
        ]
