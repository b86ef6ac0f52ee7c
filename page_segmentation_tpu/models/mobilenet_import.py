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


def load_mobilenet_encoder_h5(path_or_view):
    """Returns (params, batch_stats) trees for ``MobileNetV2Encoder``
    (module name 'encoder').  Accepts a file path or a ``KerasWeights``
    view (the backbone may be nested inside a full segmentation model)."""
    from .h5_import import as_weights_view

    view = as_weights_view(path_or_view)

    params: Dict = {}
    stats: Dict = {}

    def conv_bn(dst: str, conv_layer: str, bn_layer: str, depthwise: bool = False):
        kernel = np.asarray(view.get(conv_layer)[0], np.float32)
        if depthwise:
            kernel = np.transpose(kernel, (0, 1, 3, 2))
        if bn_layer in view:
            bn_params, bn_stats = _bn_split(view.get(bn_layer))
        else:
            # the reference taps block_16_project PRE-BN as the deepest skip
            # (model.py:109), so a full mobile_net .h5 never serializes that
            # BN; an exactly-identity BN (var = 1 - eps so the 1e-3 epsilon
            # cancels) makes our post-BN tap equal the reference's pre-BN one
            channels = kernel.shape[-2] if depthwise else kernel.shape[-1]
            bn_params = {"scale": np.ones(channels, np.float32), "bias": np.zeros(channels, np.float32)}
            bn_stats = {"mean": np.zeros(channels, np.float32),
                        "var": np.full(channels, 1.0 - 1e-3, np.float32)}
        sub = {"dwconv" if depthwise else "conv": {"kernel": kernel}, "bn": bn_params}
        _set(params, dst, sub)
        _set(stats, dst, {"bn": bn_stats})

    conv_bn("stem", "Conv1", "bn_Conv1")
    block_index = 0
    while True:
        prefix = "expanded_conv" if block_index == 0 else f"block_{block_index}"
        if f"{prefix}_depthwise" not in view:
            break
        block = f"block_{block_index}"
        if f"{prefix}_expand" in view:
            conv_bn(f"{block}/expand", f"{prefix}_expand", f"{prefix}_expand_BN")
        conv_bn(
            f"{block}/depthwise", f"{prefix}_depthwise", f"{prefix}_depthwise_BN",
            depthwise=True,
        )
        conv_bn(f"{block}/project", f"{prefix}_project", f"{prefix}_project_BN")
        block_index += 1

    return params, stats


def load_mobilenet_seg_h5(path_or_view):
    """Full-variables import of a reference-trained mobile_net model
    (reference model.py:95-148): nested MobileNetV2 down-stack + the five
    Conv2DTranspose upsamplers + the 1x1 logits head."""
    from .h5_import import as_weights_view

    view = as_weights_view(path_or_view)
    enc_params, enc_stats = load_mobilenet_encoder_h5(view)

    params: Dict = {"encoder": enc_params}
    ups = view.matching(lambda n: "conv2d_transpose" in n)
    targets = ["up0", "up1", "up2", "up3", "up_final"]
    if len(ups) != len(targets):
        raise ValueError(
            f"mobile_net decoder expects {len(targets)} Conv2DTranspose "
            f"layers, found {len(ups)}: {ups}"
        )
    for dst, src in zip(targets, ups):
        kernel, bias = view.get(src)
        params[dst] = {"kernel": np.asarray(kernel, np.float32), "bias": np.asarray(bias, np.float32)}
    kernel, bias = view.get("logits")
    params["logits"] = {"kernel": np.asarray(kernel, np.float32), "bias": np.asarray(bias, np.float32)}
    return {"params": params, "batch_stats": {"encoder": enc_stats}}


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
