"""
Torch YOLOv8 -> JAX weight converter.

The reference initializes both the student and the FP32 teacher from
Ultralytics `yolov8*.pt` weights (reference train.py:93,
models/mcaq_yolo.py:243-250).  This module maps an Ultralytics
DetectionModel state_dict onto this package's flax module tree:

  torch `model.{idx}.*`  ->  flax backbone/neck/head submodules
  conv (O,I,kh,kw)       ->  HWIO (kh,kw,I,O)
  BN weight/bias         ->  scale/bias; running stats -> batch_stats

Note on inputs: a full Ultralytics `.pt` pickle embeds ultralytics class
objects and cannot be unpickled without that package.  Accepted inputs are
(a) a plain state_dict checkpoint (torch.save(model.state_dict())), or
(b) an in-memory dict of numpy/torch tensors.  `extract_state_dict.py`
one-liner for an env WITH ultralytics:
    torch.save(YOLO('yolov8n.pt').model.state_dict(), 'yolov8n_sd.pt')
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# torch layer index -> (section, flax module name) for the standard YOLOv8
# topology (backbone 0-9, neck 10-21, head 22)
_BACKBONE_MAP = {
    0: "ConvBnSiLU_0",
    1: "ConvBnSiLU_1",
    2: "C2f_0",
    3: "ConvBnSiLU_2",
    4: "C2f_1",
    5: "ConvBnSiLU_3",
    6: "C2f_2",
    7: "ConvBnSiLU_4",
    8: "C2f_3",
    9: "SPPF_0",
}
_NECK_MAP = {
    12: "C2f_0",
    15: "C2f_1",
    16: "ConvBnSiLU_0",
    18: "C2f_2",
    19: "ConvBnSiLU_1",
    21: "C2f_3",
}
HEAD_IDX = 22


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(t) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return _to_np(t).transpose(2, 3, 1, 0)


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_convbn(sd: Dict, prefix: str, params: Dict, stats: Dict, path):
    """Ultralytics Conv block: {prefix}.conv.weight + {prefix}.bn.*"""
    _set(params, path + ("Conv_0", "kernel"), _conv_kernel(sd[f"{prefix}.conv.weight"]))
    _set(params, path + ("BatchNorm_0", "scale"), _to_np(sd[f"{prefix}.bn.weight"]))
    _set(params, path + ("BatchNorm_0", "bias"), _to_np(sd[f"{prefix}.bn.bias"]))
    _set(stats, path + ("BatchNorm_0", "mean"), _to_np(sd[f"{prefix}.bn.running_mean"]))
    _set(stats, path + ("BatchNorm_0", "var"), _to_np(sd[f"{prefix}.bn.running_var"]))


def _convert_bottleneck(sd, prefix, params, stats, path):
    _convert_convbn(sd, f"{prefix}.cv1", params, stats, path + ("ConvBnSiLU_0",))
    _convert_convbn(sd, f"{prefix}.cv2", params, stats, path + ("ConvBnSiLU_1",))


def _convert_c2f(sd, prefix, params, stats, path):
    _convert_convbn(sd, f"{prefix}.cv1", params, stats, path + ("ConvBnSiLU_0",))
    n = 0
    while f"{prefix}.m.{n}.cv1.conv.weight" in sd:
        _convert_bottleneck(sd, f"{prefix}.m.{n}", params, stats,
                            path + (f"Bottleneck_{n}",))
        n += 1
    _convert_convbn(sd, f"{prefix}.cv2", params, stats, path + ("ConvBnSiLU_1",))


def _convert_sppf(sd, prefix, params, stats, path):
    _convert_convbn(sd, f"{prefix}.cv1", params, stats, path + ("ConvBnSiLU_0",))
    _convert_convbn(sd, f"{prefix}.cv2", params, stats, path + ("ConvBnSiLU_1",))


def _convert_detect(sd, prefix, params, stats):
    """Detect head: cv2[i] box branch, cv3[i] cls branch, per scale i."""
    for i in range(3):
        _convert_convbn(sd, f"{prefix}.cv2.{i}.0", params, stats,
                        ("head", f"box{i}_conv0"))
        _convert_convbn(sd, f"{prefix}.cv2.{i}.1", params, stats,
                        ("head", f"box{i}_conv1"))
        _set(params, ("head", f"box{i}_out", "kernel"),
             _conv_kernel(sd[f"{prefix}.cv2.{i}.2.weight"]))
        _set(params, ("head", f"box{i}_out", "bias"),
             _to_np(sd[f"{prefix}.cv2.{i}.2.bias"]))

        _convert_convbn(sd, f"{prefix}.cv3.{i}.0", params, stats,
                        ("head", f"cls{i}_conv0"))
        _convert_convbn(sd, f"{prefix}.cv3.{i}.1", params, stats,
                        ("head", f"cls{i}_conv1"))
        _set(params, ("head", f"cls{i}_out", "kernel"),
             _conv_kernel(sd[f"{prefix}.cv3.{i}.2.weight"]))
        _set(params, ("head", f"cls{i}_out", "bias"),
             _to_np(sd[f"{prefix}.cv3.{i}.2.bias"]))
    # dfl.conv is the fixed arange(16) expectation kernel — parameter-free
    # in this implementation (dfl_decode), nothing to convert.


class _TrackedSD(dict):
    """state_dict wrapper that records every key the converter reads, so
    coverage of the SOURCE checkpoint can be asserted (VERDICT r3 item 5:
    fail loudly on unconsumed keys instead of overlay-skipping)."""

    def __init__(self, data):
        super().__init__(data)
        self.consumed = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)


def _ignorable_source_key(key: str) -> bool:
    """Real Ultralytics state_dicts carry keys that are correct to skip:
    BN bookkeeping counters and the Detect head's FIXED arange(REG_MAX)
    DFL expectation kernel (parameter-free `dfl_decode` here)."""
    return (key.endswith("num_batches_tracked")
            or key == f"{HEAD_IDX}.dfl.conv.weight")


def convert_torch_yolov8(state_dict, strict: bool = True) -> Tuple[Dict, Dict]:
    """Ultralytics DetectionModel state_dict -> (params, batch_stats) trees
    matching mcaq_yolo_tpu.models.YOLOv8 (and the backbone/neck/head subtrees
    of MCAQYOLO).

    strict=True (default): raise if ANY source key was not consumed by the
    conversion (beyond the documented ignorables) — a silently-dropped key
    means the checkpoint's topology and this converter's map disagree, and
    the loaded model would diverge from the trained one with no error."""
    if isinstance(state_dict, (str, bytes)):
        import torch

        # weights_only=True: plain state_dicts load fine and an untrusted
        # .pt can otherwise execute arbitrary code via pickle.  Full
        # Ultralytics pickles (which embed class objects) are unsupported
        # either way — they can't unpickle without ultralytics installed.
        obj = torch.load(state_dict, map_location="cpu", weights_only=True)
        if isinstance(obj, dict) and all(hasattr(v, "shape") for v in obj.values()):
            pass
        else:
            raise ValueError(
                "Unsupported checkpoint format — export a plain state_dict "
                "(see module docstring)."
            )
        state_dict = obj

    sd = _TrackedSD({
        k.removeprefix("model.model.").removeprefix("model."): v
        for k, v in state_dict.items()
    })
    # now keys look like "0.conv.weight", "22.cv2.0.0.conv.weight", ...

    params: Dict = {"backbone": {}, "neck": {}, "head": {}}
    stats: Dict = {"backbone": {}, "neck": {}, "head": {}}

    for idx, name in _BACKBONE_MAP.items():
        prefix = str(idx)
        if name.startswith("ConvBnSiLU"):
            _convert_convbn(sd, prefix, params, stats, ("backbone", name))
        elif name.startswith("C2f"):
            _convert_c2f(sd, prefix, params, stats, ("backbone", name))
        else:
            _convert_sppf(sd, prefix, params, stats, ("backbone", name))

    for idx, name in _NECK_MAP.items():
        prefix = str(idx)
        if name.startswith("ConvBnSiLU"):
            _convert_convbn(sd, prefix, params, stats, ("neck", name))
        else:
            _convert_c2f(sd, prefix, params, stats, ("neck", name))

    _convert_detect(sd, str(HEAD_IDX), params, stats)

    unconsumed = sorted(
        k for k in sd if k not in sd.consumed and not _ignorable_source_key(k)
    )
    if unconsumed and strict:
        raise ValueError(
            f"{len(unconsumed)} source checkpoint key(s) were NOT consumed "
            f"by the conversion (topology mismatch?): {unconsumed[:10]}"
            + (" ..." if len(unconsumed) > 10 else "")
        )
    return params, stats


def load_pretrained_into(variables: Dict, state_dict,
                         strict: bool = True) -> Dict:
    """Overlay converted torch weights onto an initialized flax variables
    tree (YOLOv8 or MCAQYOLO — shapes are validated leaf-by-leaf; with
    strict=True, full source-key coverage is also enforced, see
    convert_torch_yolov8)."""
    import jax.numpy as jnp

    params, stats = convert_torch_yolov8(state_dict, strict=strict)

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"converted key {path}/{k} missing in target tree")
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, f"{path}/{k}")
            else:
                if tuple(dst[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{dst[k].shape} vs {v.shape}"
                    )
                out[k] = jnp.asarray(v, dst[k].dtype)
        return out

    new_vars = dict(variables)
    new_vars["params"] = overlay(variables["params"], params)
    if "batch_stats" in variables and variables["batch_stats"]:
        new_vars["batch_stats"] = overlay(variables["batch_stats"], stats)
    return new_vars
