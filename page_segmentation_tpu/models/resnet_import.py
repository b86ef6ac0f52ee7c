"""Import keras-applications ResNet50 weights into ResNet50Encoder.

Counterpart of mobilenet_import.py for the reference's ResNet50 backbone
(reference model.py:327: ``weights='imagenet'``).  Name mapping:

    conv1_conv / conv1_bn                  -> encoder/stem_{conv,bn}
    conv{s+2}_block{b+1}_{1,2,3}_{conv,bn} -> encoder/stage{s}_block{b}/{c1,c2,c3}/{conv,bn}
    conv{s+2}_block{b+1}_0_{conv,bn}       -> .../shortcut/{conv,bn}
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .mobilenet_import import _bn_split, _merge, _set

_BLOCKS = [3, 4, 6, 3]


def load_resnet50_encoder_h5(path_or_view):
    """Returns (params, batch_stats) trees for ``ResNet50Encoder``."""
    from .h5_import import as_weights_view

    view = as_weights_view(path_or_view)

    params: Dict = {}
    stats: Dict = {}

    def conv(dst, layer):
        weights = view.get(layer)
        entry = {"kernel": np.asarray(weights[0], np.float32)}
        if len(weights) > 1:
            entry["bias"] = np.asarray(weights[1], np.float32)
        _set(params, dst, entry)

    def bn(dst, layer):
        bn_params, bn_stats = _bn_split(view.get(layer))
        _set(params, dst, bn_params)
        _set(stats, dst, bn_stats)

    conv("stem_conv", "conv1_conv")
    bn("stem_bn", "conv1_bn")
    for stage, blocks in enumerate(_BLOCKS):
        for b in range(blocks):
            keras = f"conv{stage + 2}_block{b + 1}"
            mine = f"stage{stage}_block{b}"
            for idx, sub in ((1, "c1"), (2, "c2"), (3, "c3")):
                conv(f"{mine}/{sub}/conv", f"{keras}_{idx}_conv")
                bn(f"{mine}/{sub}/bn", f"{keras}_{idx}_bn")
            if b == 0:
                conv(f"{mine}/shortcut/conv", f"{keras}_0_conv")
                bn(f"{mine}/shortcut/bn", f"{keras}_0_bn")

    return params, stats


# decoder conv blocks of the reference res_net model (model.py:338-362);
# Keras layer = "<name>_conv" (conv_block_simple, model.py:310-318)
_DECODER = [
    "b_1",
    "conv6_1", "conv6_2",
    "conv7_1", "conv7_2",
    "conv8_1", "conv8_2",
    "conv9_1", "conv9_2",
    "conv10_1", "conv10_2",
]


def load_resnet_seg_h5(path_or_view):
    """Full-variables import of a reference-trained res_net_fine_tuning
    model (reference model.py:320-366): ResNet50 encoder + the BN-free
    conv_block_simple decoder + the 1x1 logits head."""
    from .h5_import import as_weights_view

    view = as_weights_view(path_or_view)
    enc_params, enc_stats = load_resnet50_encoder_h5(view)

    params: Dict = {"encoder": enc_params}
    for name in _DECODER + ["logits"]:
        layer = name if name == "logits" else f"{name}_conv"
        kernel, bias = view.get(layer)
        params[name] = {"kernel": np.asarray(kernel, np.float32), "bias": np.asarray(bias, np.float32)}
    return {"params": params, "batch_stats": {"encoder": enc_stats}}


def load_into_resnet_seg(variables, h5_path: str):
    """Replace the encoder subtree of ResNet50Seg variables with weights
    imported from a Keras ResNet50 .h5 (decoder untouched)."""
    params, stats = load_resnet50_encoder_h5(h5_path)
    new_vars = dict(variables)
    new_params = dict(new_vars["params"])
    new_params["encoder"] = _merge(dict(new_params.get("encoder", {})), params)
    new_vars["params"] = new_params
    batch_stats = dict(new_vars.get("batch_stats", {}))
    batch_stats["encoder"] = _merge(dict(batch_stats.get("encoder", {})), stats)
    new_vars["batch_stats"] = batch_stats
    return new_vars
