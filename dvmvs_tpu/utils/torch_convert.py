"""PyTorch state-dict -> Flax variables converter.

Maps the reference's 5 per-module torch checkpoints
(feature extractor / FPN / encoder / LSTM / decoder; see
reference: fusionnet/run-testing.py:31-41 for the module order) onto the
dvmvs_tpu model tree, for near-bitwise parity evaluation against released
weights.

Conventions:
  - conv weights: OIHW -> HWIO (also correct for depthwise convs:
    (C,1,k,k) -> (k,k,1,C) matches Flax feature_group_count kernels)
  - BatchNorm: weight->scale, bias->bias, running stats -> batch_stats
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 3, 1, 0)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _convert_conv(params, sd, torch_prefix, flax_path, bias=False):
    _set(params, flax_path + ("kernel",), _conv(sd[f"{torch_prefix}.weight"]))
    if bias:
        _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])


def _convert_bn(params, stats, sd, torch_prefix, flax_path):
    _set(params, flax_path + ("scale",), sd[f"{torch_prefix}.weight"])
    _set(params, flax_path + ("bias",), sd[f"{torch_prefix}.bias"])
    _set(stats, flax_path + ("mean",), sd[f"{torch_prefix}.running_mean"])
    _set(stats, flax_path + ("var",), sd[f"{torch_prefix}.running_var"])


def _convert_conv_bn(params, stats, sd, torch_prefix, flax_path):
    """reference conv_layer: Sequential(Conv2d, BatchNorm2d, ReLU)."""
    _convert_conv(params, sd, f"{torch_prefix}.0", flax_path + ("conv",))
    _convert_bn(params, stats, sd, f"{torch_prefix}.1", flax_path + ("bn",))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().numpy() for k, v in sd.items()}


# --------------------------------------------------------------- modules
def convert_feature_extractor(sd, params, stats):
    """Torch FeatureExtractor (mnasnet slices, fusionnet/model.py:122-140)."""
    fe = ("feature_extractor",)
    # stem: layer1.{0 conv,1 bn,3 dw,4 bn,6 proj,7 bn}
    _convert_conv(params, sd, "layer1.0", fe + ("stem_conv",))
    _convert_bn(params, stats, sd, "layer1.1", fe + ("stem_bn",))
    _convert_conv(params, sd, "layer1.3", fe + ("stem_dw",))
    _convert_bn(params, stats, sd, "layer1.4", fe + ("stem_dw_bn",))
    _convert_conv(params, sd, "layer1.6", fe + ("stem_proj",))
    _convert_bn(params, stats, sd, "layer1.7", fe + ("stem_proj_bn",))

    # (torch_layer, index_in_layer, our_stack, n_blocks)
    stacks = [
        ("layer2", 0, "stack1", 3),
        ("layer3", 0, "stack2", 3),
        ("layer4", 0, "stack3", 3),
        ("layer4", 1, "stack4", 2),
        ("layer5", 0, "stack5", 4),
        ("layer5", 1, "stack6", 1),
    ]
    inner = [("0", "expand"), ("1", "expand_bn"), ("3", "depthwise"),
             ("4", "depthwise_bn"), ("6", "project"), ("7", "project_bn")]
    for tlayer, tidx, ours, n_blocks in stacks:
        for b in range(n_blocks):
            tp = f"{tlayer}.{tidx}.{b}.layers"
            fp = fe + (ours, f"block{b}")
            for idx, name in inner:
                if name.endswith("_bn"):
                    _convert_bn(params, stats, sd, f"{tp}.{idx}", fp + (name,))
                else:
                    _convert_conv(params, sd, f"{tp}.{idx}", fp + (name,))


def convert_feature_shrinker(sd, params, stats):
    """Torch FeatureShrinker (torchvision FPN, fusionnet/model.py:143-164)."""
    fs = ("feature_shrinker",)
    for i in range(5):
        _convert_conv(params, sd, f"fpn.inner_blocks.{i}", fs + (f"inner{i}",), bias=True)
        _convert_conv(params, sd, f"fpn.layer_blocks.{i}", fs + (f"layer{i}",), bias=True)


def convert_cost_volume_encoder(sd, params, stats):
    enc = ("cost_volume_encoder",)
    for i in range(4):
        _convert_conv_bn(params, stats, sd, f"aggregator{i}", enc + (f"aggregator{i}",))
        bp = f"encoder_block{i}"
        _convert_conv_bn(params, stats, sd, f"{bp}.down_convolution.down_conv",
                         enc + (bp, "down_convolution"))
        _convert_conv_bn(params, stats, sd, f"{bp}.standard_convolution.conv1",
                         enc + (bp, "standard_convolution", "conv1"))
        _convert_conv_bn(params, stats, sd, f"{bp}.standard_convolution.conv2",
                         enc + (bp, "standard_convolution", "conv2"))


def convert_lstm_fusion(sd, params, stats):
    _convert_conv(params, sd, "lstm_cell.conv", ("lstm_fusion", "lstm_cell", "conv"))


def convert_cost_volume_decoder(sd, params, stats):
    dec = ("cost_volume_decoder",)
    for i in range(1, 5):
        bp = f"decoder_block{i}"
        _convert_conv_bn(params, stats, sd, f"{bp}.up_convolution.conv",
                         dec + (bp, "up_convolution", "conv"))
        _convert_conv_bn(params, stats, sd, f"{bp}.convolution1", dec + (bp, "convolution1"))
        _convert_conv_bn(params, stats, sd, f"{bp}.convolution2", dec + (bp, "convolution2"))
    _convert_conv_bn(params, stats, sd, "refine.0", dec + ("refine0",))
    _convert_conv_bn(params, stats, sd, "refine.1", dec + ("refine1",))
    for name in ("one_sixteen", "one_eight", "quarter", "half", "full"):
        _convert_conv(params, sd, f"depth_layer_{name}.0",
                      dec + (f"depth_layer_{name}", "conv"), bias=True)


MODULE_CONVERTERS = {
    "feature_extractor": convert_feature_extractor,
    "feature_shrinker": convert_feature_shrinker,
    "cost_volume_encoder": convert_cost_volume_encoder,
    "lstm_fusion": convert_lstm_fusion,
    "cost_volume_decoder": convert_cost_volume_decoder,
}


def convert_torch_checkpoints(module_paths: Dict[str, str], template_variables):
    """Build a variables pytree from torch checkpoint files.

    module_paths: {module_name: torch_file_path}; missing modules keep the
    template's values. Returns a new variables dict.
    """
    import jax

    params = jax.tree.map(np.asarray, dict(template_variables["params"]))
    stats = jax.tree.map(np.asarray, dict(template_variables.get("batch_stats", {})))

    def to_mutable(d):
        return {k: to_mutable(v) for k, v in d.items()} if isinstance(d, dict) else d

    params, stats = to_mutable(params), to_mutable(stats)
    for name, path in module_paths.items():
        sd = load_torch_state_dict(path)
        MODULE_CONVERTERS[name](sd, params, stats)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
