"""Keras ``.h5`` model/weights importer.

Parity bridge: the reference stores models as Keras ``.h5``
(network.py:76-107, trainer settings model_suffix '.h5'); importing those
weights into the flax modules lets us gate the >=99.9% per-pixel agreement
target against identical parameters.

Mapping strategy: Keras weighted layers appear in ``layer_names`` in model
build order; our flax modules name parameters so that the in-order list of
(conv | conv_transpose) layers maps 1:1.  Kernel layouts copy straight
through (Conv2D: (kh,kw,in,out); Conv2DTranspose: (kh,kw,out,in) — see
models/layers.py).
"""
from __future__ import annotations

import json
from typing import List, Optional, Tuple

import numpy as np

from .registry import Architecture

# in-order names of weighted layers in each flax module
_ORDERINGS = {
    "fcn_skip": ["conv1", "conv2", "conv3", "conv4", "conv5", "conv6", "conv7",
                 "deconv1", "deconv2", "deconv3", "deconv4", "deconv5", "logits"],
    "fcn": ["conv1", "conv2", "conv3", "conv4", "conv5", "conv6", "conv7",
            "deconv1", "deconv2", "deconv3", "deconv4", "deconv5", "logits"],
    "unet": ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "conv5a", "conv5b",
             "up6", "conv6a", "conv6b", "up7", "conv7a", "conv7b",
             "up8", "conv8a", "conv8b", "up9", "conv9a", "conv9b", "logits"],
    # Keras lists layers in graph-topological order: inside a residual
    # block the shortcut conv serializes between the two path convs
    "res_unet": ["stem_c0", "stem_c1", "stem_sc",
                 "enc2_c1", "enc2_sc", "enc2_c2",
                 "enc3_c1", "enc3_sc", "enc3_c2",
                 "enc4_c1", "enc4_sc", "enc4_c2",
                 "enc5_c1", "enc5_sc", "enc5_c2",
                 "bridge1", "bridge2",
                 "dec1_c1", "dec1_sc", "dec1_c2",
                 "dec2_c1", "dec2_sc", "dec2_c2",
                 "dec3_c1", "dec3_sc", "dec3_c2",
                 "dec4_c1", "dec4_sc", "dec4_c2",
                 "logits"],
}


def _decode(value):
    return value.decode() if isinstance(value, bytes) else value


def _weighted_layers(h5file) -> List[Tuple[str, np.ndarray, Optional[np.ndarray]]]:
    """[(layer_name, kernel, bias)] in model build order."""
    group = h5file["model_weights"] if "model_weights" in h5file else h5file
    layer_names = [_decode(n) for n in group.attrs["layer_names"]]
    out = []
    for name in layer_names:
        layer_group = group[name]
        weight_names = [_decode(n) for n in layer_group.attrs.get("weight_names", [])]
        if not weight_names:
            continue
        kernel = bias = None
        for wn in weight_names:
            arr = np.asarray(layer_group[wn])
            if "kernel" in wn:
                kernel = arr
            elif "bias" in wn:
                bias = arr
        if kernel is not None:
            out.append((name, kernel, bias))
    return out


def detect_architecture(h5file) -> Optional[Architecture]:
    config = h5file.attrs.get("model_config")
    if config is None:
        return None
    try:
        name = json.loads(_decode(config)).get("config", {}).get("name", "")
    except Exception:
        return None
    try:
        return Architecture(name)
    except ValueError:
        for arch in Architecture:
            if arch.value in name:
                return arch
    return None


def load_keras_h5(path: str, architecture: Architecture, n_classes: int):
    """Returns (flax params dict, detected Architecture or None)."""
    import h5py

    with h5py.File(path, "r") as f:
        detected = detect_architecture(f)
        arch = detected or architecture
        ordering = _ORDERINGS.get(arch.value)
        if ordering is None:
            raise NotImplementedError(f".h5 import not supported for {arch.value}")
        layers = _weighted_layers(f)

    if len(layers) != len(ordering):
        raise ValueError(
            f"Layer count mismatch importing {path}: "
            f"{len(layers)} weighted layers vs {len(ordering)} expected for {arch.value}"
        )

    params = {}
    for target, (name, kernel, bias) in zip(ordering, layers):
        entry = {"kernel": kernel.astype(np.float32)}
        if bias is not None:
            entry["bias"] = bias.astype(np.float32)
        params[target] = entry
    return params, detected
