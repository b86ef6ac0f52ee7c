"""Import keras-applications EfficientNet weights into EffNetEncoder.

Completes the pretrained-backbone import trio (reference architecture.py
:35-42 instantiates efn.EfficientNetB0..B7 with imagenet weights).  Names:

    stem_conv / stem_bn                  -> encoder/stem/{conv,bn}
    block{S}{L}_expand_conv/_expand_bn   -> encoder/s{S-1}_b{i}/expand/{conv,bn}
    block{S}{L}_dwconv / _bn             -> .../depthwise/{conv,bn}
    block{S}{L}_se_reduce / _se_expand   -> .../se/{reduce,expand}
    block{S}{L}_project_conv/_project_bn -> .../project/{conv,bn}

Keras EfficientNet normalizes inputs inside the model (Rescaling 1/255 +
imagenet Normalization); this framework does the equivalent outside via
Architecture.preprocess()'s torch mode, so imported encoders expect the
same preprocessed inputs they get in training here.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

from .mobilenet_import import _bn_split, _merge, _set

_BLOCK_RE = re.compile(r"^block(\d+)([a-z])_(.+)$")


def load_effnet_encoder_h5(path_or_view):
    """Returns (params, batch_stats) trees for ``EffNetEncoder`` (any
    variant — the block population is inferred from the layer names)."""
    from .h5_import import as_weights_view

    view = as_weights_view(path_or_view)

    params: Dict = {}
    stats: Dict = {}

    def conv(dst, layer, depthwise=False):
        weights = view.get(layer)
        kernel = np.asarray(weights[0], np.float32)
        if depthwise:
            kernel = np.transpose(kernel, (0, 1, 3, 2))
        entry = {"kernel": kernel}
        if len(weights) > 1:
            entry["bias"] = np.asarray(weights[1], np.float32)
        _set(params, dst, entry)

    def bn(dst, layer):
        bn_params, bn_stats = _bn_split(view.get(layer))
        _set(params, dst, bn_params)
        _set(stats, dst, bn_stats)

    conv("stem/conv", "stem_conv")
    bn("stem/bn", "stem_bn")

    for name in view.order:
        match = _BLOCK_RE.match(name)
        if not match:
            continue
        stage = int(match.group(1)) - 1
        block_index = ord(match.group(2)) - ord("a")
        part = match.group(3)
        dst = f"s{stage}_b{block_index}"
        if part == "expand_conv":
            conv(f"{dst}/expand/conv", name)
        elif part == "expand_bn":
            bn(f"{dst}/expand/bn", name)
        elif part == "dwconv":
            conv(f"{dst}/depthwise/conv", name, depthwise=True)
        elif part == "bn":
            bn(f"{dst}/depthwise/bn", name)
        elif part == "se_reduce":
            conv(f"{dst}/se/reduce", name)
        elif part == "se_expand":
            conv(f"{dst}/se/expand", name)
        elif part == "project_conv":
            conv(f"{dst}/project/conv", name)
        elif part == "project_bn":
            bn(f"{dst}/project/bn", name)

    return params, stats


# decoder conv blocks of the reference eff_net model (model.py:387-404)
_DECODER = [
    "b_1",
    "conv6_1", "conv6_2",
    "conv7_1", "conv7_2",
    "conv8_1", "conv8_2",
    "conv9_1", "conv9_2",
]


def infer_effnet_variant(path_or_view) -> str:
    """Which B0..B7 the file holds, from its block population.

    The reference names every eff_net model 'effb0' regardless of the
    backbone actually used (model.py:407 name='effb0', default efnet =
    EfficientNetB1!), so the variant must come from the weights: depth
    scaling uniquely determines the per-stage block counts, and width
    scaling the stem channel count — together they identify the variant
    even for files truncated at the block6a skip cut.
    """
    from .efficientnet import _STAGES, _VARIANTS, _round_filters, _round_repeats
    from .h5_import import as_weights_view

    view = as_weights_view(path_or_view)
    blocks_per_stage: Dict[int, int] = {}
    for name in view.order:
        match = _BLOCK_RE.match(name)
        if match and match.group(3) == "dwconv":
            stage = int(match.group(1)) - 1
            blocks_per_stage[stage] = max(
                blocks_per_stage.get(stage, 0), ord(match.group(2)) - ord("a") + 1
            )
    stem_channels = view.get("stem_conv")[0].shape[-1]

    for variant, (width, depth) in _VARIANTS.items():
        if _round_filters(32, width) != stem_channels:
            continue
        ok = True
        for stage, present in blocks_per_stage.items():
            expected = _round_repeats(_STAGES[stage][2], depth)
            # a segmentation file is cut at block6a: the deepest observed
            # stage may be partial, every earlier one must match exactly
            if stage == max(blocks_per_stage):
                ok = ok and present <= expected
            else:
                ok = ok and present == expected
        if ok:
            return variant
    raise ValueError(
        f"cannot identify an EfficientNet variant: stem={stem_channels} "
        f"blocks={blocks_per_stage}"
    )


def load_effnet_seg_h5(path_or_view):
    """Full-variables import of a reference-trained eff_net_fine_tuning
    model (reference model.py:368-407): EfficientNet encoder + the BN-free
    conv_block_simple decoder + the 1x1 logits head."""
    from .h5_import import as_weights_view

    view = as_weights_view(path_or_view)
    enc_params, enc_stats = load_effnet_encoder_h5(view)

    params: Dict = {"encoder": enc_params}
    for name in _DECODER + ["logits"]:
        layer = name if name == "logits" else f"{name}_conv"
        kernel, bias = view.get(layer)
        params[name] = {"kernel": np.asarray(kernel, np.float32), "bias": np.asarray(bias, np.float32)}
    return {"params": params, "batch_stats": {"encoder": enc_stats}}


def load_into_effnet_seg(variables, h5_path: str):
    """Replace the encoder subtree of EffNetSeg variables with imported
    backbone weights (decoder untouched)."""
    params, stats = load_effnet_encoder_h5(h5_path)
    new_vars = dict(variables)
    new_params = dict(new_vars["params"])
    new_params["encoder"] = _merge(dict(new_params.get("encoder", {})), params)
    new_vars["params"] = new_params
    batch_stats = dict(new_vars.get("batch_stats", {}))
    batch_stats["encoder"] = _merge(dict(batch_stats.get("encoder", {})), stats)
    new_vars["batch_stats"] = batch_stats
    return new_vars
