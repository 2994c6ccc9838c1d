"""Utility-layer tests: natsort, io_utils (incl. xlsx), env, preferences,
logger, profiling, collect_env, geometry, img utils."""

import logging
import os
import zipfile

import numpy as np
import pandas as pd
import pytest


class TestNatsort:
    def test_numeric_ordering(self):
        from dosma_tpu.utils.natsort import index_natsorted, natsorted

        names = ["I10.dcm", "I2.dcm", "I1.dcm"]
        assert natsorted(names) == ["I1.dcm", "I2.dcm", "I10.dcm"]
        assert index_natsorted(names) == [2, 1, 0]

    def test_key_function(self):
        from dosma_tpu.utils.natsort import natsorted

        items = [{"n": "b2"}, {"n": "b10"}, {"n": "a5"}]
        out = natsorted(items, key=lambda d: d["n"])
        assert [d["n"] for d in out] == ["a5", "b2", "b10"]

    def test_mixed_tuples(self):
        from dosma_tpu.utils.natsort import natsorted

        assert natsorted([(2, "x"), (1, "y")]) == [(1, "y"), (2, "x")]


class TestIoUtils:
    def test_pickle_roundtrip(self, tmp_path):
        from dosma_tpu.utils import io_utils

        path = str(tmp_path / "sub" / "data.pik")
        io_utils.save_pik(path, {"a": np.arange(3)})
        out = io_utils.load_pik(path)
        assert np.array_equal(out["a"], np.arange(3))

    def test_h5_roundtrip(self, tmp_path):
        from dosma_tpu.utils import io_utils

        path = str(tmp_path / "d.h5")
        io_utils.save_h5(path, {"x": np.random.rand(4, 4)})
        out = io_utils.load_h5(path)
        assert out["x"].shape == (4, 4)

    def test_save_tables_valid_xlsx(self, tmp_path):
        from dosma_tpu.utils.io_utils import save_tables

        df1 = pd.DataFrame({"Region": ["a", "b"], "Mean": [1.5, np.nan]})
        df2 = pd.DataFrame({"N": [1, 2, 3]})
        path = str(tmp_path / "data.xlsx")
        save_tables(path, [df1, df2], ["t2", "t1_rho"])

        # Structure must be a valid OOXML zip with both sheets.
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
            assert "[Content_Types].xml" in names
            assert "xl/workbook.xml" in names
            assert "xl/worksheets/sheet1.xml" in names
            assert "xl/worksheets/sheet2.xml" in names
            wb = z.read("xl/workbook.xml").decode()
            assert "t2" in wb and "t1_rho" in wb
            s1 = z.read("xl/worksheets/sheet1.xml").decode()
            assert "Region" in s1 and "1.5" in s1

        # pandas can read it back (via its own xlsx reader if available).
        try:
            back = pd.read_excel(path, sheet_name="t2")
            assert list(back.columns) == ["Region", "Mean"]
        except ImportError:
            pass  # no xlsx reader engine in this environment


class TestEnvAndPreferences:
    def test_package_available(self):
        from dosma_tpu.utils import env

        assert env.package_available("numpy")
        assert not env.package_available("not_a_real_package_xyz")

    def test_debug_toggle(self):
        from dosma_tpu.utils import env

        env.debug(True)
        assert env.debug()
        env.debug(False)
        assert not env.debug()

    def test_preferences_get_set(self):
        from dosma_tpu.defaults import preferences

        orig = preferences.get("fitting/r2.threshold")
        preferences.set("fitting/r2.threshold", 0.5)
        assert preferences.fitting_r2_threshold == 0.5
        preferences.set("fitting/r2.threshold", orig)

    def test_preferences_invalid(self):
        from dosma_tpu.defaults import preferences

        with pytest.raises(KeyError):
            preferences.get("not/a/key")
        with pytest.raises(ValueError):
            preferences.set("data/format", "bmp")

    def test_cmd_line_flags_shape(self):
        from dosma_tpu.defaults import preferences

        flags = preferences.cmd_line_flags()
        assert "fitting/r2.threshold" in flags
        spec = flags["fitting/r2.threshold"]
        assert spec["aliases"] == ["--fitting.r2.threshold"]
        assert spec["type"] is float


class TestLogger:
    def test_setup_logger_no_duplicate_handlers(self, tmp_path):
        from dosma_tpu.utils.logger import setup_logger

        setup_logger.cache_clear()
        log = setup_logger(str(tmp_path / "l.log"), name="dosma_tpu_test")
        n = len(log.handlers)
        log2 = setup_logger(str(tmp_path / "l.log"), name="dosma_tpu_test")
        assert log2 is log and len(log2.handlers) == n


class TestProfiling:
    def test_stage_timer(self):
        from dosma_tpu.utils.profiling import StageTimer

        timer = StageTimer()
        with timer("a"):
            pass
        with timer("b"):
            pass
        assert set(timer.times) == {"a", "b"}
        assert "total" in timer.report()

    def test_annotate(self):
        from dosma_tpu.utils.profiling import annotate

        with annotate("region"):
            pass


class TestCollectEnv:
    def test_report_contains_core_info(self):
        from dosma_tpu.utils.collect_env import collect_env_info

        info = collect_env_info()
        assert "dosma_tpu" in info
        assert "jax" in info
        assert "numpy" in info


class TestGeometry:
    def test_circle_fit(self):
        from dosma_tpu.utils.geometry_utils import circle_fit

        theta = np.linspace(0, 2 * np.pi, 50, endpoint=False)
        x = 10 + 5 * np.cos(theta)
        y = -3 + 5 * np.sin(theta)
        xc, yc, r = circle_fit(x, y)
        assert abs(xc - 10) < 1e-6 and abs(yc + 3) < 1e-6 and abs(r - 5) < 1e-6

    def test_cart2pol(self):
        from dosma_tpu.utils.geometry_utils import cart2pol

        rho, phi = cart2pol(np.array([1.0, 0.0, -1.0]), np.array([0.0, 1.0, 0.0]))
        assert np.allclose(rho, 1)
        assert np.allclose(phi, [0, 90, -180])


class TestImgUtils:
    def test_downsample_slice(self):
        from dosma_tpu.utils.img_utils import downsample_slice

        arr = np.ones((4, 4, 6))
        out = downsample_slice(arr, 2)
        assert out.shape == (4, 4, 3)
        assert np.all(out == 2)
        mask = downsample_slice(arr, 2, is_mask=True)
        assert np.all(mask == 1)

    def test_write_regions(self, tmp_path):
        from dosma_tpu.utils.img_utils import write_regions

        arr = np.array([[1, 1, 2], [2, 3, 3]], dtype=float)
        path = str(tmp_path / "regions.png")
        write_regions(path, arr, plt_dict={"labels": ["a", "b", "c"]})
        assert os.path.isfile(path)

    def test_write_regions_zero_raises(self, tmp_path):
        from dosma_tpu.utils.img_utils import write_regions

        with pytest.raises(ValueError):
            write_regions(str(tmp_path / "x.png"), np.array([[0, 1]]))
