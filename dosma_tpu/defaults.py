"""Preferences singleton (re-design of ``/root/reference/dosma/defaults.py:41-303``).

A nested YAML-backed config: each leaf in the template is a dict with
``value``/``type``/``help`` (and optionally ``choices``). User values are
merged over the template, accessed by slash-separated paths
(``preferences.get("fitting/r2.threshold")``), and can be persisted.
Leaves also generate CLI flags (see :meth:`_Preferences.cmd_line_flags`).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml

__all__ = ["preferences", "AFFINE_DECIMAL_PRECISION", "SCANNER_ORIGIN_DECIMAL_PRECISION"]

# Affine matrices are rounded to this decimal precision on NIfTI read
# (reference ``defaults.py:34-35``).
AFFINE_DECIMAL_PRECISION = 4
SCANNER_ORIGIN_DECIMAL_PRECISION = 4

_TYPES = {"str": str, "int": int, "float": float, "bool": bool}


def _template_path() -> str:
    return os.path.join(os.path.dirname(__file__), "resources", "templates", ".preferences.yml")


def _is_leaf(node: Any) -> bool:
    return isinstance(node, dict) and "value" in node and "type" in node


def _walk_leaves(node: Dict, prefix: str = ""):
    for k, v in node.items():
        path = f"{prefix}/{k}" if prefix else k
        if _is_leaf(v):
            yield path, v
        elif isinstance(v, dict):
            yield from _walk_leaves(v, path)


class _Preferences:
    """Singleton preferences object."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance._initialized = False
        return cls._instance

    def __init__(self):
        if self._initialized:
            return
        self._initialized = True
        with open(_template_path()) as f:
            self._config = yaml.safe_load(f)
        self._user_path = os.path.expanduser("~/.dosma_tpu/preferences.yml")
        if os.path.isfile(self._user_path):
            try:
                with open(self._user_path) as f:
                    user = yaml.safe_load(f) or {}
                for path, value in (user.items() if isinstance(user, dict) else []):
                    try:
                        self.set(path, value)
                    except (KeyError, ValueError):
                        pass  # template migration: ignore stale keys
            except Exception:
                pass
        self._apply_mpl()

    def _apply_mpl(self):
        try:
            import matplotlib

            node = self._find("visualization/matplotlib/rcParams", must_be_leaf=False)
            for key, leaf in node.items():
                matplotlib.rcParams[key] = leaf["value"]
        except Exception:
            pass

    def _find(self, path: str, must_be_leaf: bool = True):
        node = self._config
        for part in path.split("/"):
            if not isinstance(node, dict) or part not in node:
                raise KeyError(f"Preference '{path}' not found")
            node = node[part]
        if must_be_leaf and not _is_leaf(node):
            raise KeyError(f"Preference '{path}' is not a leaf key")
        return node

    def get(self, path: str) -> Any:
        return self._find(path)["value"]

    def set(self, path: str, value: Any, prefix: str = ""):
        if prefix:
            path = f"{prefix}/{path}"
        leaf = self._find(path)
        typ = _TYPES[leaf["type"]]
        if isinstance(value, str) and typ is bool:
            value = value.lower() in ("1", "true", "yes")
        value = typ(value)
        if "choices" in leaf and value not in leaf["choices"]:
            raise ValueError(f"Invalid value {value!r} for '{path}'; choices: {leaf['choices']}")
        leaf["value"] = value
        if path.startswith("visualization/matplotlib"):
            self._apply_mpl()

    def save(self):
        os.makedirs(os.path.dirname(self._user_path), exist_ok=True)
        flat = {path: leaf["value"] for path, leaf in _walk_leaves(self._config)}
        with open(self._user_path, "w") as f:
            yaml.safe_dump(flat, f)

    # ------------------------------------------------------------------
    # Convenience properties (mirroring the reference's named accessors).
    # ------------------------------------------------------------------
    @property
    def image_data_format(self):
        from dosma_tpu.core.io.format_io import ImageDataFormat

        return ImageDataFormat[self.get("data/format")]

    @property
    def fitting_r2_threshold(self) -> float:
        return self.get("fitting/r2.threshold")

    @property
    def mask_dilation_rate(self) -> float:
        return self.get("registration/mask/dilation.rate")

    @property
    def mask_dilation_threshold(self) -> float:
        return self.get("registration/mask/dilation.threshold")

    @property
    def segmentation_batch_size(self) -> int:
        return self.get("segmentation/batch.size")

    @property
    def segmentation_precision(self) -> str:
        return self.get("segmentation/precision")

    @property
    def visualization_use_vmax(self) -> bool:
        return self.get("visualization/use.vmax")

    @property
    def nipype_logging(self) -> str:
        return self.get("logging/nipype")

    def cmd_line_flags(self) -> Dict[str, Dict]:
        """Leaf prefs as argparse-kwargs dicts keyed by preference path.

        Each value carries ``aliases`` (the ``--flag`` strings) and ``name``
        which the CLI pops before ``add_argument`` (reference contract,
        ``defaults.py:272-297`` / ``cli.py:742-749``).
        """
        flags = {}
        for path, leaf in _walk_leaves(self._config):
            flag = "--" + path.replace("/", ".").replace("..", ".")
            spec = {
                "aliases": [flag],
                "name": path,
                "default": leaf["value"],
                "type": _TYPES[leaf["type"]],
                "help": leaf.get("help", ""),
                "nargs": "?",
            }
            if "choices" in leaf:
                spec["choices"] = leaf["choices"]
            flags[path] = spec
        return flags

    def __repr__(self):
        flat = {path: leaf["value"] for path, leaf in _walk_leaves(self._config)}
        return "Preferences(" + ", ".join(f"{k}={v!r}" for k, v in flat.items()) + ")"


preferences = _Preferences()
