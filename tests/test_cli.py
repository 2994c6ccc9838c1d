"""CLI conformance tests (model: reference ``tests/util.py:216-269`` ScanTest
pattern — every CLI-exposed scan has cmd_line_actions and real command
strings run through parse_args)."""

import os

import numpy as np
import pytest

from dosma_tpu.cli import SUPPORTED_SCAN_TYPES, parse_args
from dosma_tpu.core.io.dicom import Tag
from tests.util import write_dicom_series


class TestCmdLineDeclarations:
    def test_all_scans_have_actions(self):
        for scan in SUPPORTED_SCAN_TYPES:
            actions = scan.cmd_line_actions()
            assert len(actions) > 0, scan.NAME
            for method, wrapper in actions:
                assert wrapper.name == method.__name__
                assert isinstance(wrapper.help, str)

    def test_help_does_not_crash(self, capsys):
        with pytest.raises(SystemExit):
            parse_args(["--help"])

    def test_requires_input_path(self):
        with pytest.raises(ValueError):
            parse_args(["qdess"])


class TestQDessCommandLine:
    def test_qdess_t2_end_to_end(self, tmp_path):
        src = tmp_path / "dicoms"
        save = tmp_path / "out"
        write_dicom_series(
            str(src),
            shape=(32, 32, 4),
            n_echos=2,
            echo_times=[8.0, 42.0],
            extra={
                Tag(0x0019, 0x10B6): 3132.0,
                Tag(0x0019, 0x10B7): 1560.0,
                "RepetitionTime": 25.0,
                "FlipAngle": 30.0,
            },
        )
        cmd = f"--d {src} --s {save} qdess --fc generate_t2_map --t1 1200"
        parse_args(cmd.split())

        assert os.path.isdir(save / "qdess")
        assert os.path.isfile(save / "qdess" / "qdess.data")
        # T2 map saved under the tissue's analytics dir.
        assert os.path.isdir(save / "fc")

    def test_load_after_save(self, tmp_path):
        src = tmp_path / "dicoms"
        save = tmp_path / "out"
        write_dicom_series(
            str(src), shape=(16, 16, 2), n_echos=2,
            extra={Tag(0x0019, 0x10B6): 3132.0, Tag(0x0019, 0x10B7): 1560.0},
        )
        parse_args(f"--d {src} --s {save} qdess".split())
        # Reload from the saved state (no dicom path).
        parse_args(f"--l {save} qdess".split())


class TestSegmentCommandLine:
    def test_qdess_segment_e2e(self, tmp_path):
        """Full CLI segmentation flow with synthetic weights: load dicoms,
        find the tissue weight file, build the model, write the mask."""
        import jax

        from dosma_tpu.models.unet2d import init_unet2d_params
        from dosma_tpu.models.weights import save_keras_unet2d_weights

        src = tmp_path / "dicoms"
        save = tmp_path / "out"
        weights = tmp_path / "weights"
        weights.mkdir()
        save_keras_unet2d_weights(
            str(weights / "iwoai-2019-unet2d_fc-tc-pc-men_weights.h5"),
            init_unet2d_params(jax.random.PRNGKey(0), num_classes=4),
        )
        write_dicom_series(
            str(src), shape=(96, 96, 4), n_echos=2, plane="sagittal",
            extra={Tag(0x0019, 0x10B6): 3132.0, Tag(0x0019, 0x10B7): 1560.0},
        )
        cmd = (
            f"--d {src} --s {save} qdess --fc segment "
            f"--weights_dir {weights} --model iwoai-2019-t6 --rss"
        )
        parse_args(cmd.split())
        assert os.path.isfile(save / "fc" / "fc.nii.gz")

    def test_qdess_segment_to_analytics_realistic(self, tmp_path, monkeypatch, caplog):
        """Full coupling on a plausible mask: segmentation -> set_mask ->
        split_regions -> T2 map -> knee regional analytics. A condyle-shaped
        (annular-arc) mask is injected at the model boundary so the femoral
        region split runs its happy path — the too-few-voxels bailout that
        random weights trigger must NOT fire (ref flow
        ``/root/reference/dosma/cli.py:589-647``)."""
        import logging

        import jax

        from dosma_tpu import cli as cli_mod
        from dosma_tpu.core.med_volume import MedicalVolume
        from dosma_tpu.models.unet2d import init_unet2d_params
        from dosma_tpu.models.weights import save_keras_unet2d_weights

        src = tmp_path / "dicoms"
        save = tmp_path / "out"
        weights = tmp_path / "weights"
        weights.mkdir()
        save_keras_unet2d_weights(
            str(weights / "iwoai-2019-unet2d_fc-tc-pc-men_weights.h5"),
            init_unet2d_params(jax.random.PRNGKey(0), num_classes=4),
        )
        write_dicom_series(
            str(src), shape=(64, 64, 8), n_echos=2, plane="sagittal",
            echo_times=[8.0, 42.0],
            extra={
                Tag(0x0019, 0x10B6): 3132.0,
                Tag(0x0019, 0x10B7): 1560.0,
                "RepetitionTime": 25.0,
                "FlipAngle": 30.0,
            },
        )

        class _CondyleModel:
            """Stub SegModel producing an annular condyle-like arc."""

            batch_size = 4

            def generate_mask(self, volume):
                h, w, d = volume.shape[:3]
                yv, xv = np.meshgrid(range(h), range(w), indexing="ij")
                cx, cy, R = w / 2, h / 2, h / 3
                rad = np.sqrt((xv - cx) ** 2 + (yv - cy) ** 2)
                annulus = (rad > R * 0.8) & (rad < R * 1.1) & (yv > cy - R)
                arr = np.repeat(annulus[..., None], d, axis=2).astype(np.uint8)
                mask = MedicalVolume(arr, np.asarray(volume.affine))
                return {k: mask for k in ("fc", "tc", "pc", "men")}

        monkeypatch.setattr(cli_mod, "get_model", lambda *a, **k: _CondyleModel())

        with caplog.at_level(logging.WARNING):
            parse_args(
                f"--d {src} --s {save} qdess --fc segment "
                f"--weights_dir {weights} --model iwoai-2019-t6 --rss".split()
            )
            parse_args(f"--l {save} qdess --fc generate_t2_map --t1 1200".split())
            parse_args(f"--l {save} --s {save} knee --fc --t2 --ml".split())

        bailouts = [r for r in caplog.records if "too few voxels" in r.getMessage()]
        assert not bailouts, [r.getMessage() for r in bailouts]
        assert os.path.isfile(save / "fc" / "fc.nii.gz")
        # Regional analytics were produced (xlsx metrics under the tissue dir).
        import pathlib

        fc_files = [str(p) for p in pathlib.Path(save / "fc").rglob("*")]
        assert any(f.endswith(".xlsx") for f in fc_files), fc_files


def test_tuple_parameter_comma_string():
    """Tuple-typed action parameters with defaults parse '0,100' into
    (0, 100) rather than character-splitting the string."""
    from dosma_tpu.cli import parse_basic_type
    from typing import Tuple

    assert parse_basic_type("0,100", tuple) == (0, 100)
    assert parse_basic_type("0.5,99.5", Tuple[float, float]) == (0.5, 99.5)
    assert parse_basic_type(["1", "2"], tuple) == (1, 2) or parse_basic_type(["1", "2"], tuple) == ("1", "2")


def test_cli_device_load_flag(tmp_path):
    """--device_load routes from_dicom through the prefetch path (on the CPU
    backend the volumes land as jax arrays on the host device)."""
    import os

    from tests.util import write_dicom_series

    from dosma_tpu.cli import parse_args

    src = tmp_path / "dicoms"
    write_dicom_series(
        str(src), shape=(16, 16, 2), n_echos=2,
    )
    save = tmp_path / "save"
    os.makedirs(save, exist_ok=True)
    parse_args(
        ["--dicom", str(src), "--save", str(save), "--device_load", "qdess"]
    )
    # The scan saved; volumes round-tripped through device memory.
    assert any(p.endswith(".pik") or "qdess" in p.lower() for p in os.listdir(save)) or os.listdir(save)
