"""Export flax params to a Keras-legacy ``.h5`` weights file.

Round-trip companion to h5_import.py: models trained here can be handed
back to reference-era tooling (Keras ``load_weights``), and our own
importer reads the files too.  Layer names follow the Keras auto-naming
convention for a freshly-built reference model (conv2d, conv2d_1, ...,
conv2d_transpose, ..., logits) so name-based loading also works.
"""
from __future__ import annotations

import json
from typing import List, Tuple

import numpy as np

from .h5_import import _ORDERINGS
from .registry import Architecture


def _keras_layer_names(arch: Architecture) -> List[Tuple[str, str]]:
    """[(flax param name, keras layer name)] in build order."""
    ordering = _ORDERINGS[arch.value]
    out = []
    conv_count = 0
    deconv_count = 0
    for name in ordering:
        if name == "logits":
            out.append((name, "logits"))
        elif name.startswith("deconv"):
            keras = "conv2d_transpose" if deconv_count == 0 else f"conv2d_transpose_{deconv_count}"
            deconv_count += 1
            out.append((name, keras))
        else:
            keras = "conv2d" if conv_count == 0 else f"conv2d_{conv_count}"
            conv_count += 1
            out.append((name, keras))
    return out


def save_keras_h5(path: str, params, architecture: Architecture) -> None:
    """Write a legacy Keras weights .h5 for the given architecture."""
    import h5py

    if architecture.value not in _ORDERINGS:
        raise NotImplementedError(f".h5 export not supported for {architecture.value}")
    pairs = _keras_layer_names(architecture)

    with h5py.File(path, "w") as f:
        group = f.create_group("model_weights")
        layer_names = []
        for flax_name, keras_name in pairs:
            entry = params[flax_name]
            layer_group = group.create_group(keras_name)
            weight_names = []
            sub = layer_group.create_group(keras_name)
            sub.create_dataset("kernel", data=np.asarray(entry["kernel"], np.float32))
            weight_names.append(f"{keras_name}/kernel")
            if "bias" in entry:
                sub.create_dataset("bias", data=np.asarray(entry["bias"], np.float32))
                weight_names.append(f"{keras_name}/bias")
            layer_group.attrs["weight_names"] = np.array(
                [n.encode() for n in weight_names], dtype=object
            )
            layer_names.append(keras_name)
        group.attrs["layer_names"] = np.array([n.encode() for n in layer_names], dtype=object)
        group.attrs["backend"] = b"tensorflow"
        f.attrs["model_config"] = json.dumps(
            {"class_name": "Functional", "config": {"name": architecture.value}}
        )
