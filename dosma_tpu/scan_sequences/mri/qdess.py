"""qDESS scan sequence: segmentation + analytic T2 mapping.

Behavior-parity re-design of ``/root/reference/dosma/scan_sequences/mri/qdess.py``.
The analytic T2 map (Sveinsson et al., MRM 2017 — ref ``qdess.py:105-252``)
runs as one fused jitted kernel on TPU (:func:`dosma_tpu.ops.qmri.qdess_t2_map`).
"""

from __future__ import annotations

import logging
import warnings
from typing import Sequence, Tuple

import numpy as np

from dosma_tpu.core import quant_vals as qv
from dosma_tpu.core.io.dicom import Dataset, Tag
from dosma_tpu.models.seg_model import SegModel
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.scan_sequences.scans import ScanSequence
from dosma_tpu.tissues.tissue import Tissue
from dosma_tpu.utils.cmd_line_utils import ActionWrapper

__all__ = ["QDess"]

_logger = logging.getLogger(__name__)


class QDess(ScanSequence):
    """Quantitative double-echo-in-steady-state (qDESS) MRI sequence.

    Two echoes (S1, S2) enable analytic T2 mapping; the high-resolution scan
    also serves as the segmentation target.
    """

    NAME = "qdess"

    # GE private tags for spoiler area and gradient time (ref ``qdess.py:44-45``).
    __GL_AREA_TAG__ = Tag(0x0019, 0x10B6)
    __TG_TAG__ = Tag(0x0019, 0x10B7)

    __NUM_ECHOS__ = 2
    __VOLUME_DIMENSIONS__ = 3

    def __init__(self, volumes: Sequence[MedicalVolume]):
        if len(volumes) != 2:
            raise ValueError("QDess currently only supports 2 volumes.")
        super().__init__(volumes)

    def __validate_scan__(self) -> bool:
        return len(self.volumes) == self.__NUM_ECHOS__

    # ------------------------------------------------------------------
    def segment(self, model: SegModel, tissue: Tissue, use_rss: bool = False):
        """Segment tissue(s) with ``model`` (ref ``qdess.py:64-103``)."""
        tissue_names = (
            ", ".join([t.FULL_NAME for t in tissue])
            if isinstance(tissue, Sequence)
            else tissue.FULL_NAME
        )
        _logger.info(f"Segmenting {tissue_names}...")

        if use_rss:
            segmentation_volume = self.calc_rss()
        else:
            segmentation_volume = self.volumes[0]

        mask = model.generate_mask(segmentation_volume)
        if isinstance(mask, dict):
            if not isinstance(tissue, Sequence):
                tissue = [tissue]
            for abbreviation, tis in zip([t.STR_ID for t in tissue], tissue):
                tis.set_mask(mask[abbreviation])
                self.__add_tissue__(tis)
        else:
            assert isinstance(tissue, Tissue)
            tissue.set_mask(mask)
            self.__add_tissue__(tissue)
        return mask

    # ------------------------------------------------------------------
    def generate_t2_map(
        self,
        tissue: Tissue = None,
        suppress_fat: bool = False,
        suppress_fluid: bool = False,
        beta: float = 1.2,
        gl_area: float = None,
        tg: float = None,
        tr: float = None,
        te: float = None,
        alpha: float = None,
        diffusivity: float = 1.25e-9,
        t1: float = None,
        nan_bounds: Tuple[float, float] = (0, 100),
        nan_to_num: float = 0.0,
        decimals: int = 1,
    ) -> qv.T2:
        """Generate the analytic T2 map (ref ``qdess.py:105-252``).

        Timing params default to DICOM header values (TR/TE/FlipAngle and
        the GE private spoiler tags); ``t1`` defaults to ``tissue.T1_EXPECTED``.
        """
        from dosma_tpu.ops.qmri import qdess_t2_map

        if self.volumes is None:
            raise ValueError("volumes and ref_dicom fields must be initialized")

        if (
            self.get_metadata(self.__GL_AREA_TAG__, gl_area) is None
            or self.get_metadata(self.__TG_TAG__, tg) is None
        ):
            raise ValueError(
                "Dicom headers do not contain tags for `gl_area` and `tg`. Please input manually"
            )

        ref_dicom = self.ref_dicom if self.ref_dicom is not None else Dataset()

        subvolumes = self.volumes
        echo_1 = subvolumes[0].volume
        echo_2 = subvolumes[1].volume

        tr_ms = float(ref_dicom.RepetitionTime) if tr is None else tr
        te_ms = float(ref_dicom.EchoTime) if te is None else te
        tg_us = float(ref_dicom[self.__TG_TAG__].value) if tg is None else tg
        t1_ms = float(tissue.T1_EXPECTED) if t1 is None else t1
        alpha_deg = float(ref_dicom.FlipAngle) if alpha is None else alpha
        gl = float(ref_dicom[self.__GL_AREA_TAG__].value) if gl_area is None else gl_area

        import math

        if np.allclose(math.sin(math.radians(alpha_deg) / 2), 0):
            warnings.warn("sin(flip angle) is close to 0 - t2 map may fail.")

        t2map = qdess_t2_map(
            np.asarray(echo_1) if not hasattr(echo_1, "devices") else echo_1,
            np.asarray(echo_2) if not hasattr(echo_2, "devices") else echo_2,
            tr=tr_ms,
            te=te_ms,
            tg=tg_us,
            alpha=alpha_deg,
            gl_area=gl,
            t1=t1_ms,
            diffusivity=diffusivity,
            beta=beta,
            nan_bounds=nan_bounds,
            nan_to_num=nan_to_num,
            decimals=decimals,
            suppress_fat=suppress_fat,
            suppress_fluid=suppress_fluid,
        )
        # Keep the output on the same device class as the input volume.
        from dosma_tpu.core.device import cpu_device

        if subvolumes[0].device == cpu_device:
            t2map = np.asarray(t2map)

        t2_map_wrapped = subvolumes[0]._partial_clone(volume=t2map, headers=True)
        t2_map_wrapped = qv.T2(t2_map_wrapped)

        if tissue is not None:
            tissue.add_quantitative_value(t2_map_wrapped)
        return t2_map_wrapped

    # ------------------------------------------------------------------
    def calc_rss(self) -> MedicalVolume:
        """Root-sum-of-squares of the two echoes (ref ``qdess.py:254-265``)."""
        return self._combine_echoes("rss")

    def _combine_echoes(self, method: str = "rss") -> MedicalVolume:
        from dosma_tpu.core.device import cpu_device
        from dosma_tpu.ops.qmri import rms_combine, rss_combine

        if self.volumes is None:
            raise ValueError("Volumes must be initialized")
        assert len(self.volumes) == 2, "2 Echos expected"

        echo1, echo2 = self.volumes[0].volume, self.volumes[1].volume
        if method == "rss":
            vol = rss_combine(np.asarray(echo1), np.asarray(echo2))
        elif method == "rms":
            vol = rms_combine(np.asarray(echo1), np.asarray(echo2))
        else:
            raise ValueError(f"`method={method}` is not supported")
        if self.volumes[0].device == cpu_device:
            vol = np.asarray(vol)

        from copy import deepcopy

        mv = deepcopy(self.volumes[0])
        mv.volume = vol
        return mv

    # ------------------------------------------------------------------
    def _save(self, metadata, save_dir, fname_fmt=None, **kwargs):
        default_fmt = {MedicalVolume: "echo-{}"}
        default_fmt.update(fname_fmt if fname_fmt else {})
        return super()._save(metadata, save_dir, fname_fmt=default_fmt, **kwargs)

    @classmethod
    def cmd_line_actions(cls):
        """CLI action metadata (ref ``qdess.py:302-331``)."""
        segment_action = ActionWrapper(
            name=cls.segment.__name__,
            help="generate automatic segmentation",
            param_help={"use_rss": "use root sum of squares (RSS) of two echos for segmentation"},
            alternative_param_names={"use_rss": ["rss"]},
        )
        generate_t2_map_action = ActionWrapper(
            name=cls.generate_t2_map.__name__,
            aliases=["t2"],
            param_help={
                "suppress_fat": "suppress computation on low SNR fat regions",
                "suppress_fluid": "suppress computation on fluid regions",
                "beta": "constant for calculating fluid-nulled image (S1-beta*S2)",
                "gl_area": "GL Area. Defaults to value in dicom tag '0x001910b6'",
                "tg": "Gradient time (in microseconds). "
                "Defaults to value in dicom tag '0x001910b7'.",
                "alpha": "Flip angle in degrees. Defaults to value in dicom tag '0x00181314'.",
                "diffusivity": "Estimated diffusivity. Defaults to 1.25e-9",
            },
            help="generate T2 map",
        )
        return [(cls.segment, segment_action), (cls.generate_t2_map, generate_t2_map_action)]
