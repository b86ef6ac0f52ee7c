"""Legacy TF1 checkpoint (.meta + data) migration.

The reference shells out to a ``scripts/migrate_model.py`` it does not
ship when it finds a TF1 ``.meta`` next to a missing ``.h5``
(reference network.py:60-68) — the migration path is lost with the
script.  Here it is native: a ``MetaGraphDef``'s ``trainable_variables``
collection preserves variable *creation order*, so the same by-order
layer mapping that the Keras ``.h5`` importer uses
(``models/h5_import._ORDERINGS``) applies without depending on the TF1
era's variable names.  Strict shape validation against a fresh init of
the target architecture refuses any checkpoint whose conv plan does not
match exactly.

Requires TensorFlow importable (only to read the checkpoint; nothing is
executed).  Kernel layout note: TF1 ``conv2d_transpose`` kernels are
``(kh, kw, out, in)`` — the same layout Keras ``Conv2DTranspose`` saves
and the by-order consumers already expect, so values pass through
unchanged.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from .h5_import import _ORDERINGS
from .registry import Architecture


def _resolve_prefix(path: str) -> Tuple[str, str]:
    """(checkpoint prefix, meta path) from a .meta path, a checkpoint
    prefix, or a .h5 path whose sibling .meta exists (the reference's
    trigger, network.py:60-68)."""
    if path.endswith(".meta"):
        return path[:-5], path
    if path.endswith(".h5"):
        meta = path[:-3] + ".meta"
        return meta[:-5], meta
    return path, path + ".meta"


def ordered_trainable_names(meta_path: str) -> List[str]:
    """Variable names in creation order from the MetaGraphDef's
    trainable_variables collection (no session, no graph import)."""
    from tensorflow.core.framework import variable_pb2
    from tensorflow.core.protobuf import meta_graph_pb2

    mg = meta_graph_pb2.MetaGraphDef()
    with open(meta_path, "rb") as f:
        data = f.read()
    try:
        mg.ParseFromString(data)
    except Exception as exc:
        raise ValueError(f"{meta_path}: not a valid TF1 meta graph ({exc})") from exc
    collection = mg.collection_def.get("trainable_variables")
    if collection is None or not collection.bytes_list.value:
        raise ValueError(
            f"{meta_path}: no trainable_variables collection — not a "
            "trainable TF1 checkpoint"
        )
    names = []
    for item in collection.bytes_list.value:
        var = variable_pb2.VariableDef()
        var.ParseFromString(item)
        names.append(var.variable_name.split(":")[0])
    return names


def _pair_layers(names: List[str], values: List[np.ndarray]):
    """Group the ordered flat variable list into (kernel, bias) layers:
    a rank-4 kernel optionally followed by a rank-1 bias of matching
    width (creation order within a layer is kernel then bias)."""
    layers = []
    i = 0
    while i < len(values):
        kernel_name, kernel = names[i], values[i]
        if kernel.ndim != 4:
            raise ValueError(
                f"variable '{kernel_name}' has rank {kernel.ndim}, expected "
                "a rank-4 conv kernel — this TF1 graph is not a pure conv "
                "stack and cannot be mapped by order"
            )
        bias: Optional[np.ndarray] = None
        j = i + 1
        if (
            j < len(values)
            and values[j].ndim == 1
            and values[j].shape[0] in (kernel.shape[-1], kernel.shape[-2])
        ):
            bias = values[j]
            j += 1
        layers.append((kernel_name, kernel, bias))
        i = j
    return layers


def load_tf1_checkpoint(path: str, architecture: Architecture, n_classes: int):
    """Returns a flax params dict migrated from a TF1 checkpoint.

    ``path``: the ``.meta`` file, the checkpoint prefix, or the missing
    ``.h5`` path whose sibling ``.meta`` exists.
    """
    try:
        import tensorflow as tf  # read-only: checkpoint reader + protos
    except ImportError as exc:  # pragma: no cover - env without TF
        raise ImportError(
            "migrating a TF1 .meta checkpoint requires TensorFlow to read "
            "it; install tensorflow or convert the model to Keras .h5"
        ) from exc

    prefix, meta_path = _resolve_prefix(path)
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"no TF1 meta graph at {meta_path}")
    ordering = _ORDERINGS.get(architecture.value)
    if ordering is None:
        raise NotImplementedError(
            f"TF1 migration is by-order and only defined for the conv "
            f"families {sorted(_ORDERINGS)}, not {architecture.value}"
        )

    names = ordered_trainable_names(meta_path)
    reader = tf.train.load_checkpoint(prefix)
    values = [np.asarray(reader.get_tensor(name)) for name in names]
    layers = _pair_layers(names, values)
    if len(layers) != len(ordering):
        raise ValueError(
            f"{meta_path}: {len(layers)} conv layers vs {len(ordering)} "
            f"expected for {architecture.value} — wrong architecture?"
        )

    # strict shape validation against a fresh init of the target
    import jax
    import jax.numpy as jnp

    module = architecture.model(n_classes)
    init = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
    params = {}
    for target, (name, kernel, bias) in zip(ordering, layers):
        want = tuple(np.asarray(init[target]["kernel"]).shape)
        if tuple(kernel.shape) != want:
            raise ValueError(
                f"{meta_path}: layer '{target}' kernel is {tuple(kernel.shape)}, "
                f"expected {want} (variable '{name}') — refusing an "
                "ambiguous by-order migration"
            )
        entry = {"kernel": kernel.astype(np.float32)}
        if bias is not None:
            entry["bias"] = bias.astype(np.float32)
        params[target] = entry
    return params
