"""Checkpoint save/restore.

Replaces the reference's Keras ModelCheckpoint `.h5` files
(network.py:177-183) with a native directory format:

    <dir>/params.msgpack   flax-serialized params (float32)
    <dir>/opt_state.msgpack  optional optimizer state (resume)
    <dir>/meta.json        architecture, n_classes, monitor value, step

Orbax is used for async training-state checkpoints when requested; the
msgpack path is the portable default (works anywhere flax does).  Keras
``.h5`` files are importable via models/h5_import.py for parity testing.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, variables, meta: Optional[Dict[str, Any]] = None, opt_state=None) -> None:
    """``variables`` is either the full flax collection dict
    ({'params': ..., 'batch_stats': ...}) or a bare params tree."""
    os.makedirs(path, exist_ok=True)
    variables = jax.device_get(variables)
    if not isinstance(variables, dict) or "params" not in variables:
        variables = {"params": variables}
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(_to_numpy(dict(variables))))
    if opt_state is not None:
        state_dict = serialization.to_state_dict(jax.device_get(opt_state))
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.msgpack_serialize(_to_numpy(state_dict)))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=2, default=str)


def load_checkpoint(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Returns (variables, meta) where variables always has a 'params' key."""
    params_file = os.path.join(path, "params.msgpack")
    if not os.path.exists(params_file):
        raise FileNotFoundError(f"No checkpoint at {path}")
    with open(params_file, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    if "params" not in variables:  # legacy bare-params checkpoint
        variables = {"params": variables}
    meta = {}
    meta_file = os.path.join(path, "meta.json")
    if os.path.exists(meta_file):
        with open(meta_file, "r") as f:
            meta = json.load(f)
    return variables, meta


def load_opt_state(path: str, template=None):
    """Restore the optimizer state; pass the freshly-initialized state as
    ``template`` to recover the original pytree structure."""
    opt_file = os.path.join(path, "opt_state.msgpack")
    if not os.path.exists(opt_file):
        return None
    with open(opt_file, "rb") as f:
        state_dict = serialization.msgpack_restore(f.read())
    if template is None:
        return state_dict
    return serialization.from_state_dict(template, state_dict)


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


# ----------------------------------------------------------------- orbax
class OrbaxCheckpointer:
    """Async Orbax-backed training-state checkpointing (SURVEY §5 aux:
    the reference has only Keras ModelCheckpoint; large-scale training
    wants async, atomic, versioned state saves).

    Saves {'variables', 'opt_state', 'meta'} per step under ``directory``;
    keeps the newest ``max_to_keep``.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, variables, opt_state=None, meta: Optional[Dict] = None) -> None:
        payload = {"variables": variables}
        if opt_state is not None:
            payload["opt_state"] = serialization.to_state_dict(jax.device_get(opt_state))
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(payload),
            meta=self._ocp.args.JsonSave(meta or {}),
        )
        self.manager.save(step, args=args)

    def restore(self, step: Optional[int] = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        restored = self.manager.restore(
            step,
            args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore(),
                meta=self._ocp.args.JsonRestore(),
            ),
        )
        return step, restored["state"], restored["meta"]

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


def load_meta(path: str) -> Dict[str, Any]:
    """Just the checkpoint metadata (meta.json) — no weight deserialization."""
    meta_file = os.path.join(path, "meta.json")
    if not os.path.exists(meta_file):
        return {}
    with open(meta_file, "r") as f:
        return json.load(f)
