"""Import Keras-applications MobileNetV2 weights into MobileNetV2Encoder.

The reference's mobilenet architecture builds on
``tf.keras.applications.MobileNetV2(weights='imagenet')``
(reference model.py:101); this importer maps a Keras MobileNetV2 ``.h5``
(e.g. a locally downloaded imagenet checkpoint, or a fine-tuned model
containing the backbone) onto the flax encoder so those weights transfer.

Name mapping (Keras -> flax module path):
    Conv1 / bn_Conv1                  -> encoder/stem/{conv,bn}
    expanded_conv_{depthwise,project} -> encoder/block_0/...
    block_N_{expand,depthwise,project}(_BN) -> encoder/block_N/...
Keras BN weights are (gamma, beta, moving_mean, moving_variance) ->
flax (scale, bias) params + (mean, var) batch_stats.  Depthwise kernels
transpose (kh, kw, C, 1) -> (kh, kw, 1, C).

Note: the final ``Conv_1``/1280-feature head is not part of the encoder
(the reference taps block_16_project as the deepest skip) and is skipped.
Our block_16 skip is the post-BN projection (the reference taps the conv
pre-BN output; BN is affine at inference, so the decoder absorbs it).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _bn_split(weights) -> Tuple[Dict, Dict]:
    gamma, beta, mean, var = (np.asarray(w, np.float32) for w in weights)
    return {"scale": gamma, "bias": beta}, {"mean": mean, "var": var}


def load_mobilenet_encoder_h5(path: str):
    """Returns (params, batch_stats) trees for ``MobileNetV2Encoder``
    (module name 'encoder')."""
    import h5py

    from .h5_import import _decode

    with h5py.File(path, "r") as f:
        group = f["model_weights"] if "model_weights" in f else f
        layer_names = [_decode(n) for n in group.attrs["layer_names"]]

        def layer_weights(name):
            layer_group = group[name]
            weight_names = [_decode(n) for n in layer_group.attrs.get("weight_names", [])]
            return [np.asarray(layer_group[wn]) for wn in weight_names]

        params: Dict = {}
        stats: Dict = {}

        def conv_bn(dst: str, conv_layer: str, bn_layer: str, depthwise: bool = False):
            kernel = np.asarray(layer_weights(conv_layer)[0], np.float32)
            if depthwise:
                kernel = np.transpose(kernel, (0, 1, 3, 2))
            bn_params, bn_stats = _bn_split(layer_weights(bn_layer))
            sub = {"dwconv" if depthwise else "conv": {"kernel": kernel}, "bn": bn_params}
            _set(params, dst, sub)
            _set(stats, dst, {"bn": bn_stats})

        conv_bn("stem", "Conv1", "bn_Conv1")
        block_index = 0
        while True:
            prefix = "expanded_conv" if block_index == 0 else f"block_{block_index}"
            if f"{prefix}_depthwise" not in layer_names:
                break
            block = f"block_{block_index}"
            if f"{prefix}_expand" in layer_names:
                conv_bn(f"{block}/expand", f"{prefix}_expand", f"{prefix}_expand_BN")
            conv_bn(
                f"{block}/depthwise", f"{prefix}_depthwise", f"{prefix}_depthwise_BN",
                depthwise=True,
            )
            conv_bn(f"{block}/project", f"{prefix}_project", f"{prefix}_project_BN")
            block_index += 1

    return params, stats


def _set(tree: Dict, path: str, value: Dict) -> None:
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
    existing = node.setdefault(parts[-1], {})
    existing.update(value)


def load_into_mobilenet_seg(variables, h5_path: str):
    """Replace the encoder subtree of a MobileNetSeg variables dict with
    weights imported from a Keras MobileNetV2 .h5 (decoder stays as-is)."""
    import jax

    params, stats = load_mobilenet_encoder_h5(h5_path)
    new_vars = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy
    new_params = dict(new_vars["params"])
    new_params["encoder"] = _merge(dict(new_params.get("encoder", {})), params)
    new_vars = dict(new_vars)
    new_vars["params"] = new_params
    batch_stats = dict(new_vars.get("batch_stats", {}))
    batch_stats["encoder"] = _merge(dict(batch_stats.get("encoder", {})), stats)
    new_vars["batch_stats"] = batch_stats
    return new_vars


def _merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for key, value in override.items():
        if isinstance(value, dict) and isinstance(out.get(key), dict):
            out[key] = _merge(out[key], value)
        else:
            out[key] = value
    return out
