"""Command-line interface for dosma_tpu.

Behavior-parity re-design of ``/root/reference/dosma/cli.py``: a
reflection-driven argparse where each scan's ``cmd_line_actions()`` becomes
a subparser whose arguments come from method signature type annotations
(ref ``cli.py:482-540``), with segmentation weight-file grouping
(ref ``:543-565, 589-647``) and preference flags (ref ``:742-749``).

Run: ``python -m dosma_tpu.cli --dicom D --save S qdess --fc segment ...``
"""

from __future__ import annotations

import argparse
import ast
import functools
import inspect
import logging
import os
import time
import warnings
from collections import defaultdict
from typing import Sequence

from dosma_tpu.core.quant_vals import QuantitativeValueType as QV
from dosma_tpu.defaults import preferences
from dosma_tpu.models.seg_model import SegModel
from dosma_tpu.models.util import SUPPORTED_MODELS, get_model, model_from_config
from dosma_tpu.msk import knee
from dosma_tpu.scan_sequences.mri.cones import Cones
from dosma_tpu.scan_sequences.mri.cube_quant import CubeQuant
from dosma_tpu.scan_sequences.mri.mapss import Mapss
from dosma_tpu.scan_sequences.mri.qdess import QDess
from dosma_tpu.scan_sequences.scans import ScanSequence
from dosma_tpu.tissues.tissue import Tissue
from dosma_tpu.utils import env
from dosma_tpu.utils.logger import setup_logger

SUPPORTED_QUANTITATIVE_VALUES = [QV.T2, QV.T1_RHO, QV.T2_STAR]

DEBUG_KEY = "debug"
DICOM_KEY = "dicom"
SAVE_KEY = "save"
LOAD_KEY = "load"
IGNORE_EXT_KEY = "ignore_ext"
SPLIT_BY_KEY = "split_by"
GPU_KEY = "gpu"
NUM_WORKERS_KEY = "num-workers"

SCAN_KEY = "scan"
SCAN_ACTION_KEY = "scan_action"

SEGMENTATION_MODEL_KEY = "model"
SEGMENTATION_CONFIG_KEY = "config"
SEGMENTATION_WEIGHTS_DIR_KEY = "weights_dir"
SEGMENTATION_BATCH_SIZE_KEY = "batch_size"

TISSUES_KEY = "tissues"

SUPPORTED_SCAN_TYPES = [Cones, CubeQuant, Mapss, QDess]
BASIC_TYPES = [bool, str, float, int, list, tuple]

_logger = logging.getLogger(__name__)


def _signature(fn):
    """Signature with string annotations evaluated (scan modules use
    ``from __future__ import annotations``)."""
    return inspect.signature(fn, eval_str=True)


class CommandLineScanContainer:
    """CLI wrapper around a scan: loads from dicoms or saved data, proxies
    attribute access, and auto-injects num_workers/verbose/show_pbar
    (ref ``cli.py:77-171``)."""

    def __init__(
        self,
        scan_type: type,
        dicom_path,
        load_path,
        ignore_ext: bool = False,
        group_by=None,
        num_workers=0,
        **kwargs,
    ):
        self.scan_type = scan_type

        if (dicom_path is not None) and (not os.path.isdir(dicom_path)):
            if load_path is not None:
                warnings.warn(
                    f"Dicom_path {dicom_path} not found. Will load data from {load_path}"
                )
            else:
                raise NotADirectoryError(f"{dicom_path} is not a directory")

        is_dicom_available = (dicom_path is not None) and os.path.isdir(dicom_path)
        group_by = group_by if group_by is not None else scan_type.__DEFAULT_SPLIT_BY__
        if is_dicom_available:
            scan = scan_type.from_dicom(
                dicom_path, group_by=group_by, ignore_ext=ignore_ext, num_workers=num_workers
            )
        else:
            scan = self.load(load_path, num_workers=num_workers)

        self.scan = scan
        self.generic_args = {
            "num_workers": num_workers,
            "max_workers": num_workers,
            "verbose": True,
            "show_pbar": True,
        }

    def __getattr__(self, name):
        attr = getattr(self.scan, name)
        if callable(attr):
            params = inspect.signature(attr).parameters
            common = params.keys() & self.generic_args.keys()
            kwargs = {k: self.generic_args[k] for k in common}
            if kwargs:
                attr = functools.partial(attr, **kwargs)
        return attr

    def load(self, path: str, num_workers: int = 0):
        scan_type = self.scan_type
        file_path = None
        if os.path.isfile(path):
            file_path = path
        elif os.path.isdir(path) and scan_type.NAME:
            fname = f"{scan_type.NAME}.data"
            for _path in (
                os.path.join(path, fname),
                os.path.join(self._save_dir(path, create_dir=False), fname),
            ):
                if os.path.isfile(_path):
                    file_path = _path
                    break
        if file_path is None:
            raise ValueError(f"Cannot load {scan_type.__name__} data from path '{path}'")
        return scan_type.load(file_path, num_workers)

    def _save_dir(self, dir_path: str, create_dir: bool = True):
        folder_id = self.scan_type.NAME
        name_len = len(folder_id) + 2
        if folder_id not in dir_path[-name_len:]:
            scan_dirpath = os.path.join(dir_path, folder_id)
        else:
            scan_dirpath = dir_path
        if create_dir:
            os.makedirs(scan_dirpath, exist_ok=True)
        return scan_dirpath

    def save(self, path, save_custom: bool = True, image_data_format=None, num_workers: int = 0):
        path = self._save_dir(path, create_dir=True)
        return self.scan.save(path, save_custom, image_data_format, num_workers)


def get_nargs_for_basic_type(base_type: type):
    if base_type in (str, float, int):
        return 1
    if base_type in (list, tuple):
        return "+"


def add_tissues(parser: argparse.ArgumentParser):
    for tissue in knee.SUPPORTED_TISSUES:
        parser.add_argument(
            f"--{tissue.STR_ID}",
            action="store_const",
            default=False,
            const=True,
            help=f"analyze {tissue.FULL_NAME}",
        )


def parse_tissues(vargin: dict):
    tissues = []
    for tissue in knee.SUPPORTED_TISSUES:
        t = tissue()
        if t.STR_ID in vargin and vargin[t.STR_ID] and t.STR_ID not in [x.STR_ID for x in tissues]:
            if vargin[LOAD_KEY]:
                t.load_data(vargin[LOAD_KEY])
            tissues.append(t)

    if len(tissues) == 0:
        _logger.info("No tissues specified, computing for all supported tissues...")
        for tissue in knee.SUPPORTED_TISSUES:
            t = tissue()
            if vargin[LOAD_KEY]:
                t.load_data(vargin[LOAD_KEY])
            tissues.append(t)

    _logger.info("Tissue(s): " + ", ".join(t.FULL_NAME for t in tissues))
    return tissues


def add_segmentation_subparser(parser):
    parser.add_argument(
        f"--{SEGMENTATION_WEIGHTS_DIR_KEY}",
        type=str,
        nargs=1,
        required=True,
        help="path to directory with weights",
    )
    parser.add_argument(
        f"--{SEGMENTATION_MODEL_KEY}",
        choices=SUPPORTED_MODELS,
        nargs="?",
        default=None,
        help=f"built-in model to use for segmentation. Choices: {SUPPORTED_MODELS}",
    )
    parser.add_argument(
        f"--{SEGMENTATION_CONFIG_KEY}",
        type=str,
        default=None,
        help="config file for non-built-in model",
    )
    parser.add_argument(
        f"--{SEGMENTATION_BATCH_SIZE_KEY}",
        metavar="B",
        type=int,
        default=preferences.segmentation_batch_size,
        nargs="?",
        help=f"batch size for inference. Default: {preferences.segmentation_batch_size}",
    )
    return parser


def handle_segmentation(vargin, scan: ScanSequence, tissue: Tissue):
    if not vargin[SEGMENTATION_MODEL_KEY] and not vargin[SEGMENTATION_CONFIG_KEY]:
        raise ValueError(
            f"Either `--{SEGMENTATION_MODEL_KEY}` or `--{SEGMENTATION_CONFIG_KEY}` "
            f"must be specified"
        )

    segment_weights_path = vargin[SEGMENTATION_WEIGHTS_DIR_KEY][0]
    if isinstance(tissue, Sequence):
        weights = [t.find_weights(segment_weights_path) for t in tissue]
        assert all(w == weights[0] for w in weights)
        weights_path = weights[0]
    else:
        weights_path = tissue.find_weights(segment_weights_path)

    dims = scan.get_dimensions()
    input_shape = (dims[0], dims[1], 1)
    if vargin[SEGMENTATION_MODEL_KEY]:
        model = get_model(
            vargin[SEGMENTATION_MODEL_KEY], input_shape=input_shape, weights_path=weights_path
        )
    else:
        model = model_from_config(
            vargin[SEGMENTATION_CONFIG_KEY],
            weights_dir=segment_weights_path,
            input_shape=input_shape,
        )
    model.batch_size = vargin[SEGMENTATION_BATCH_SIZE_KEY]
    return model


CUSTOM_TYPE_TO_HANDLE_DICT = {SegModel: handle_segmentation}


def add_custom_argument(parser, param_type):
    if param_type is SegModel:
        add_segmentation_subparser(parser)
        return True
    return False


def extract_basic_type(param_type):
    """Basic type from ``typing`` aliases (e.g. Tuple → tuple)."""
    return param_type.__origin__


def add_base_argument(
    parser, param_name, param_type, param_default, param_help, additional_param_names=None
):
    if additional_param_names is None:
        additional_param_names = []

    try:
        if param_type not in BASIC_TYPES:
            param_type = extract_basic_type(param_type)
    except (AttributeError, TypeError):
        raise TypeError(f"Parameter '{param_name}' - type '{param_type}' not in BASIC_TYPES")

    has_default = param_default is not inspect._empty
    if has_default:
        param_help = f"{param_help}. Default: {param_default}"

    param_names = [f"--{n}" for n in additional_param_names]
    param_names.append(f"--{param_name}")

    if param_type is bool:
        if not has_default:
            raise ValueError("All boolean parameters must have a default value.")
        parser.add_argument(
            *param_names,
            action=f"store_{str(not param_default).lower()}",
            dest=param_name,
            help=param_help,
        )
        return

    nargs_no_default = get_nargs_for_basic_type(param_type)
    nargs = "?" if has_default else nargs_no_default
    parser.add_argument(
        *param_names,
        nargs=nargs,
        default=param_default if has_default else None,
        dest=param_name,
        help=param_help,
        required=not has_default,
    )


def parse_basic_type(val, param_type):
    if param_type not in BASIC_TYPES:
        param_type = extract_basic_type(param_type)
    if type(val) is param_type:
        return val
    if param_type in (list, tuple):
        return param_type(val) if val is not None else val
    nargs = get_nargs_for_basic_type(param_type)
    if type(val) is list and nargs == 1:
        return val[0]
    return param_type(val) if val else val


def add_scans(dosma_subparser):
    for scan in SUPPORTED_SCAN_TYPES:
        supported_actions = scan.cmd_line_actions()
        if len(supported_actions) == 0:
            continue
        scan_parser = dosma_subparser.add_parser(
            scan.NAME, help=f"analyze {scan.NAME} sequence"
        )
        add_tissues(scan_parser)

        scan_subparser = scan_parser.add_subparsers(
            description=f"{scan.NAME} subcommands", dest=SCAN_ACTION_KEY
        )

        for action, action_wrapper in supported_actions:
            func_signature = _signature(action)
            action_parser = scan_subparser.add_parser(
                action_wrapper.name, aliases=action_wrapper.aliases, help=action_wrapper.help
            )

            for param_name, param in func_signature.parameters.items():
                param_type = param.annotation
                param_default = param.default
                if param_name == "self" or param_type is Tissue:
                    continue
                param_help = action_wrapper.get_param_help(param_name)
                alternative_param_names = action_wrapper.get_alternative_param_names(param_name)

                if param_type is inspect._empty:
                    raise ValueError(
                        f"scan {scan.NAME}, action {action_wrapper.name}, param {param_name} "
                        f"does not have an annotation. Use typing in the method declaration"
                    )

                if add_custom_argument(action_parser, param_type):
                    continue
                add_base_argument(
                    action_parser,
                    param_name,
                    param_type,
                    param_default,
                    param_help=param_help,
                    additional_param_names=alternative_param_names,
                )

        scan_parser.set_defaults(func=handle_scan)


def _find_tissue_groups(vargin, tissues: Sequence[Tissue]):
    """Group tissues sharing one weight file (multi-class segmentation)."""
    if not isinstance(tissues, Sequence):
        assert isinstance(tissues, Tissue)
        tissues = [tissues]
    weights_dir = vargin[SEGMENTATION_WEIGHTS_DIR_KEY][0]
    weights_to_tissues = defaultdict(list)
    for tissue in tissues:
        weights_to_tissues[tissue.find_weights(weights_dir)].append(tissue)
    return weights_to_tissues


def _build_params(vargin, scan, parameters, tissue=None):
    param_dict = {}
    for param_name, param in parameters.items():
        param_type = param.annotation
        if param_name == "self":
            continue
        if param_type is Tissue:
            assert tissue is not None
            param_dict["tissue"] = tissue
            continue
        if param_type in CUSTOM_TYPE_TO_HANDLE_DICT:
            param_dict[param_name] = CUSTOM_TYPE_TO_HANDLE_DICT[param_type](vargin, scan, tissue)
        else:
            param_dict[param_name] = parse_basic_type(vargin[param_name], param_type)
    return param_dict


def handle_scan(vargin):
    scan_name = vargin[SCAN_KEY]
    _logger.info(f"Analyzing {scan_name}...")
    scan = None
    for p_scan in SUPPORTED_SCAN_TYPES:
        if p_scan.NAME == scan_name:
            scan = p_scan
            break

    scan = CommandLineScanContainer(
        scan,
        dicom_path=vargin[DICOM_KEY],
        load_path=vargin[LOAD_KEY],
        ignore_ext=vargin[IGNORE_EXT_KEY],
        group_by=vargin[SPLIT_BY_KEY] if vargin[SPLIT_BY_KEY] else None,
        num_workers=vargin[NUM_WORKERS_KEY],
    )

    tissues = vargin["tissues"]
    scan_action = vargin[SCAN_ACTION_KEY]

    action = None
    for act, action_wrapper in scan.cmd_line_actions():
        if scan_action == action_wrapper.name or scan_action in action_wrapper.aliases:
            action = act
            break

    if action is None:
        scan.save(vargin[SAVE_KEY], image_data_format=preferences.image_data_format)
        return

    func_signature = _signature(action)
    parameters = func_signature.parameters
    if scan_action == "segment":
        weights_to_tissues = _find_tissue_groups(vargin, tissues)
        for _weights_file, seg_tissues in weights_to_tissues.items():
            if len(seg_tissues) == 1:
                seg_tissues = seg_tissues[0]
            param_dict = _build_params(vargin, scan, parameters, seg_tissues)
            getattr(scan, action.__name__)(**param_dict)
    else:
        if "tissue" in func_signature.parameters.keys():
            for tissue in tissues:
                param_dict = _build_params(vargin, scan, parameters, tissue)
                getattr(scan, action.__name__)(**param_dict)
        else:
            param_dict = _build_params(vargin, scan, parameters)
            getattr(scan, action.__name__)(**param_dict)

    scan.save(vargin[SAVE_KEY], image_data_format=preferences.image_data_format)
    for tissue in tissues:
        tissue.save_data(vargin[SAVE_KEY], data_format=preferences.image_data_format)

    return scan


def parse_dicom_tag_splitby(vargin_str):
    if not vargin_str:
        return vargin_str
    try:
        return ast.literal_eval(vargin_str)
    except Exception:
        return vargin_str


def parse_args(f_input=None):
    """Parse command-line args (ref ``cli.py:661-810``)."""
    parser = argparse.ArgumentParser(
        prog="DOSMA-TPU",
        description="A TPU-native open source MRI analysis pipeline",
        epilog="Either `--dicom` or `--load` must be specified. "
        "If both are given, `--dicom` will be used",
    )
    parser.add_argument(f"--{DEBUG_KEY}", action="store_true", help="use debug mode")
    parser.add_argument(
        "--d", f"--{DICOM_KEY}", metavar="D", type=str, default=None, nargs="?",
        dest=DICOM_KEY, help="path to directory storing dicom files",
    )
    parser.add_argument(
        "--l", f"--{LOAD_KEY}", metavar="L", type=str, default=None, nargs="?",
        dest=LOAD_KEY, help="path to data directory to load from",
    )
    parser.add_argument(
        "--s", f"--{SAVE_KEY}", metavar="S", type=str, default=None, nargs="?",
        dest=SAVE_KEY, help="path to data directory to save to. Default: L/D",
    )
    parser.add_argument(
        f"--{IGNORE_EXT_KEY}", action="store_true", default=False, dest=IGNORE_EXT_KEY,
        help="ignore .dcm extension when loading dicoms. Default: False",
    )
    parser.add_argument(
        f"--{SPLIT_BY_KEY}", metavar="G", type=str, default=None, nargs="?",
        dest=SPLIT_BY_KEY, help="override dicom tag to split volumes by (eg. `EchoNumbers`)",
    )
    parser.add_argument(
        f"--{GPU_KEY}", metavar="G", type=str, default=None, nargs="?", dest=GPU_KEY,
        help="gpu id (no-op on TPU builds). Default: None",
    )
    parser.add_argument(
        f"--{NUM_WORKERS_KEY}", metavar="G", type=int, default=0, dest=NUM_WORKERS_KEY,
        help="num cpu workers. Default: 0",
    )

    preferences_flags = preferences.cmd_line_flags()
    for flag in preferences_flags.keys():
        argparse_kwargs = dict(preferences_flags[flag])
        argparse_kwargs["dest"] = flag
        aliases = argparse_kwargs.pop("aliases", None)
        argparse_kwargs.pop("name", None)
        parser.add_argument(*aliases, **argparse_kwargs)

    subparsers = parser.add_subparsers(help="sub-command help", dest=SCAN_KEY)
    add_scans(subparsers)
    knee.knee_parser(subparsers)

    start_time = time.time()
    if f_input:
        args = parser.parse_args(f_input)
    else:
        args = parser.parse_args()
        setup_logger(env.log_file_path())

    vargin = vars(args)
    if vargin[DEBUG_KEY]:
        env.debug(True)

    gpu = vargin[GPU_KEY]
    _logger.debug(vargin)
    if gpu is not None:
        os.environ["CUDA_VISIBLE_DEVICES"] = gpu

    for flag in preferences_flags.keys():
        preferences.set(flag, vargin[flag])

    dicom_path = vargin[DICOM_KEY]
    load_path = vargin[LOAD_KEY]
    if not dicom_path and not load_path:
        raise ValueError("Must provide path to dicoms or path to load data from")

    save_path = vargin[SAVE_KEY]
    if not save_path:
        save_path = load_path if load_path else f"{dicom_path}/data"
        vargin[SAVE_KEY] = save_path
    if not os.path.isdir(save_path):
        os.makedirs(save_path)

    vargin["tissues"] = parse_tissues(vargin)
    vargin[SPLIT_BY_KEY] = parse_dicom_tag_splitby(vargin[SPLIT_BY_KEY])

    args.func(vargin)

    time_elapsed = time.time() - start_time
    _logger.info(f"Time Elapsed: {time_elapsed:.2f} seconds")
    return time_elapsed


if __name__ == "__main__":
    parse_args()
