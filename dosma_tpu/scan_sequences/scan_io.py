"""Scan save/load: pickle of scan state + custom MedicalVolume serialization.

Behavior-parity re-design of ``/root/reference/dosma/scan_sequences/scan_io.py``:
``from_dicom`` records reload args (ref ``:37-80``); ``from_dict`` uses
signature introspection (ref ``:82-120``); ``save`` pickles serializable
attrs and optionally saves MedicalVolumes as nifti/dicom with
``{__dtype__, __value__}`` path placeholders (ref ``:122-180, 258-356``);
``load`` falls back to re-reading original dicoms (ref ``:182-245``).
"""

from __future__ import annotations

import inspect
import os
import warnings
from pathlib import Path
from typing import Any, Dict, Mapping, Set, Union

from dosma_tpu.core.io.dicom_io import DicomReader
from dosma_tpu.core.io.format_io import ImageDataFormat
from dosma_tpu.core.io import format_io_utils as fio_utils
from dosma_tpu.core.med_volume import MedicalVolume
from dosma_tpu.defaults import preferences
from dosma_tpu.utils import io_utils

__all__ = ["ScanIOMixin"]


def _contains_type(value, types) -> bool:
    """True if ``value`` is or recursively contains an instance of ``types``."""
    if isinstance(value, types):
        return True
    if isinstance(value, Mapping):
        return any(_contains_type(v, types) for v in value.values()) or any(
            _contains_type(k, types) for k in value.keys()
        )
    if not isinstance(value, str) and isinstance(value, (list, tuple, set)):
        return any(_contains_type(v, types) for v in value)
    import numpy as np

    if isinstance(value, np.ndarray) and value.dtype == object:
        return any(_contains_type(v, types) for v in value.flatten())
    return False


class ScanIOMixin:
    """Mixin providing from_dicom / from_dict / save / load for scans."""

    NAME: str = ""
    __DEFAULT_SPLIT_BY__ = "EchoNumbers"

    @classmethod
    def from_dicom(
        cls,
        dir_or_files,
        group_by=None,
        ignore_ext: bool = False,
        num_workers: int = 0,
        verbose: bool = False,
        **kwargs,
    ):
        """Load scan from dicom files (ref ``scan_io.py:37-80``)."""
        dr = DicomReader(num_workers, verbose)
        if group_by is None:
            group_by = cls.__DEFAULT_SPLIT_BY__
        volumes = dr.load(dir_or_files, group_by, ignore_ext=ignore_ext)

        if isinstance(dir_or_files, (str, Path, os.PathLike)):
            dir_or_files = os.path.abspath(dir_or_files)
        else:
            dir_or_files = type(dir_or_files)([os.path.abspath(x) for x in dir_or_files])

        scan = cls(volumes, **kwargs)
        scan._from_file_args = {
            "dir_or_files": dir_or_files,
            "ignore_ext": ignore_ext,
            "group_by": group_by,
            "_type": "dicom",
        }
        return scan

    @classmethod
    def from_dict(cls, data: Dict[str, Any], force: bool = False):
        """Reconstruct scan from a data dict via signature introspection
        (ref ``scan_io.py:82-120``)."""
        data = cls._convert_attr_name(data)
        data = cls.load_custom_data(data)

        signature = inspect.signature(cls)
        init_metadata = {k: v for k, v in data.items() if k in signature.parameters}
        scan = cls(**init_metadata)
        data = {k: v for k, v in data.items() if k not in init_metadata}

        for k, v in data.items():
            if not hasattr(scan, k) and not force:
                warnings.warn(f"{cls.__name__} does not have attribute {k}. Skipping...")
                continue
            setattr(scan, k, v)
        return scan

    def save(
        self,
        path: str,
        save_custom: bool = False,
        image_data_format: ImageDataFormat = None,
        num_workers: int = 0,
    ) -> str:
        """Save scan state to ``path/NAME.data`` (ref ``scan_io.py:122-180``)."""
        if image_data_format is None:
            image_data_format = preferences.image_data_format

        os.makedirs(path, exist_ok=True)
        filepath = os.path.join(path, f"{self.NAME}.data")

        metadata: Dict = {}
        for attr in self.__serializable_variables__():
            metadata[attr] = getattr(self, attr)

        if save_custom:
            metadata = self._save(
                metadata, path, image_data_format=image_data_format, num_workers=num_workers
            )

        io_utils.save_pik(filepath, metadata)
        return filepath

    @classmethod
    def load(cls, path_or_data: Union[str, Dict], num_workers: int = 0):
        """Load scan; falls back to re-reading original dicoms
        (ref ``scan_io.py:182-245``)."""
        if isinstance(path_or_data, (str, Path, os.PathLike)):
            if os.path.isdir(path_or_data):
                path_or_data = os.path.join(path_or_data, f"{cls.NAME}.data")
            if not os.path.isfile(path_or_data):
                raise FileNotFoundError(f"File {path_or_data} does not exist")
            data = io_utils.load_pik(path_or_data)
        else:
            data = path_or_data

        try:
            return cls.from_dict(data)
        except Exception:
            warnings.warn(
                f"Failed to load {cls.__name__} from data. Trying to load from dicom file."
            )

        data = cls._convert_attr_name(data)
        data = cls.load_custom_data(data, num_workers=num_workers)

        scan = None
        if "_from_file_args" in data:
            dicom_args = dict(data.pop("_from_file_args"))
            assert dicom_args.pop("_type") == "dicom"
            scan = cls.from_dicom(**dicom_args, num_workers=num_workers)
        elif "dicom_path" in data:
            dicom_path = data.pop("dicom_path")
            ignore_ext = data.pop("ignore_ext", False)
            group_by = data.pop("split_by", cls.__DEFAULT_SPLIT_BY__)
            scan = cls.from_dicom(
                dicom_path, ignore_ext=ignore_ext, group_by=group_by, num_workers=num_workers
            )

        if scan is None:
            raise ValueError(f"Data is insufficient to construct {cls.__name__}")

        for k, v in data.items():
            if not hasattr(scan, k):
                warnings.warn(f"{cls.__name__} does not have attribute {k}. Skipping...")
                continue
            setattr(scan, k, v)
        return scan

    # ------------------------------------------------------------------
    # Custom (de)serialization of MedicalVolume-valued attributes.
    # ------------------------------------------------------------------
    def _save(self, metadata: Dict[str, Any], save_dir: str, fname_fmt: Dict = None, **kwargs):
        if fname_fmt is None:
            fname_fmt = {}
        default_fname_fmt = {MedicalVolume: "image-{}"}
        for k, v in default_fname_fmt.items():
            fname_fmt.setdefault(k, v)

        for attr in list(metadata.keys()):
            path = os.path.abspath(os.path.join(save_dir, attr))
            try:
                metadata[attr] = self.save_custom_data(metadata[attr], path, fname_fmt, **kwargs)
            except Exception as e:
                raise RuntimeError(f"Failed to save metadata {attr} - {e}")
        return metadata

    def save_custom_data(self, metadata, paths, fname_fmt: Dict = None, **kwargs):
        """Recursively save MedicalVolumes in containers (ref ``scan_io.py:290-330``)."""
        if fname_fmt is None:
            fname_fmt = {}
        if isinstance(metadata, Mapping):
            keys = list(metadata.keys())
            sub_paths = [os.path.join(paths, f"{k}") for k in keys]
            values = [
                self.save_custom_data(metadata[k], p, fname_fmt, **kwargs)
                for k, p in zip(keys, sub_paths)
            ]
            return {k: v for k, v in zip(keys, values)}
        if not isinstance(metadata, str) and isinstance(metadata, (list, tuple, set)):
            values = list(metadata)
            sub_paths = [os.path.join(paths, f"{i:03d}") for i in range(len(values))]
            values = [
                self.save_custom_data(v, p, fname_fmt, **kwargs)
                for v, p in zip(values, sub_paths)
            ]
            return type(metadata)(values)
        formatter = None
        for t in type(metadata).__mro__:
            if t in fname_fmt:
                formatter = fname_fmt[t]
                break
        return self._save_custom_data_base(metadata, paths, formatter, **kwargs)

    def _save_custom_data_base(self, metadata, path, formatter: str = None, **kwargs):
        if formatter:
            path = os.path.join(os.path.dirname(path), formatter.format(os.path.basename(path)))
        if isinstance(metadata, MedicalVolume):
            image_data_format = kwargs.get("image_data_format", preferences.image_data_format)
            path = fio_utils.convert_image_data_format(path, image_data_format)
            metadata.save_volume(path, data_format=image_data_format)
            return {"__dtype__": MedicalVolume, "__value__": path}
        return metadata

    @classmethod
    def _convert_attr_name(cls, data: Dict[str, Any]):
        return data

    @classmethod
    def load_custom_data(cls, data: Any, **kwargs):
        """Recursively resolve ``{__dtype__, __value__}`` placeholders
        (ref ``scan_io.py:358-418``)."""
        dtype = type(data)
        if isinstance(data, Mapping) and "__value__" in data:
            dtype = data["__dtype__"]
            data = data["__value__"]

        if isinstance(data, Mapping) and not (isinstance(dtype, type) and issubclass(dtype, str)):
            keys = list(data.keys())
            values = [cls.load_custom_data(v, **kwargs) for v in data.values()]
            return {k: v for k, v in zip(keys, values)}
        if (
            not isinstance(data, str)
            and isinstance(data, (list, tuple, set))
        ):
            return type(data)(cls.load_custom_data(x, **kwargs) for x in data)
        return cls._load_custom_data_base(data, dtype, **kwargs)

    @classmethod
    def _load_custom_data_base(cls, data, dtype=None, **kwargs):
        if dtype is None:
            dtype = type(data)
        if isinstance(data, str) and isinstance(dtype, type) and issubclass(dtype, MedicalVolume):
            data = fio_utils.generic_load(data, expected_num_volumes=1)
        return data

    def __serializable_variables__(self, ignore_types=None, ignore_attrs=()) -> Set:
        """All instance attrs except headers/MedicalVolumes/Tissues/temps/CAPS
        (ref ``scan_io.py:420-447``)."""
        from dosma_tpu.core.io.dicom import Dataset
        from dosma_tpu.tissues.tissue import Tissue

        if ignore_types is None:
            ignore_types = (Dataset, Tissue)

        serializable = []
        for attr, value in self.__dict__.items():
            if attr in ignore_attrs or _contains_type(value, ignore_types):
                continue
            if attr.startswith("temp") or attr.startswith("_temp"):
                continue
            if attr.upper() == attr or (attr.startswith("__") and attr.endswith("__")):
                continue
            if callable(value) or isinstance(value, property):
                continue
            serializable.append(attr)
        return set(serializable)
