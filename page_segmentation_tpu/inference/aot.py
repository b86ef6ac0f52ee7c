"""AOT model export: the compiled predict program as a deployment artifact.

The reference's deployment artifact is a Keras ``.h5`` that needs the full
TF runtime plus the library's custom-object table at load time (reference
network.py:76-84).  The TPU-native equivalent exports the *computation*:
``export_classifier`` serializes the fused predict program — on-device
normalization + model forward + argmax, weights baked in as constants —
via ``jax.export`` (StableHLO).  The artifact is one self-contained file
that any machine with jax can load and run on every exported platform
(TPU and CPU by default); no flax, no checkpoint files, no model code.

Shapes are exported *symbolically* by default: one program covers any
``(batch, k*h, k*w)`` input, where ``k`` is the architecture's total
stride factor, so the artifact serves arbitrary page sizes without
re-export (the consumer still specializes/compiles per concrete shape,
exactly like the in-process bucketed jit cache).  Architectures whose
ops reject symbolic dims can be exported at a static shape list instead.

Artifact layout (zip):
    manifest.json               format/version, architecture, n_classes,
                                output kind, platforms, stride factor,
                                symbolic flag, static shape list
    program.jaxexp              the serialized Exported (symbolic mode)
    program_{H}x{W}.jaxexp      one per shape (static mode)
"""
from __future__ import annotations

import json
import zipfile
from typing import Optional, Sequence, Tuple

import numpy as np

FORMAT = "page-segmentation-tpu-aot"
VERSION = 1


def _build_fn(classifier, output: str):
    """The deployable computation: prepared uint8 page batch -> output.

    Input contract matches ``PixelClassifier._prepare_input``
    (classifier.py): grayscale prepared pages (inverted + line-height
    scaled), ``(B, H, W) uint8``; RGB-encoder families replicate the gray
    channel on device exactly as the host path does.
    """
    import jax.numpy as jnp

    module = classifier.module
    variables = classifier.variables
    preprocess = classifier.architecture.device_preprocess()
    rgb = classifier.rgb

    def fn(image_u8):
        x = image_u8.astype(jnp.float32)
        x = jnp.stack([x] * 3, axis=-1) if rgb else x[..., None]
        logits = module.apply(variables, preprocess(x))
        if output == "logits":
            return logits.astype(jnp.float32)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return fn


def export_classifier(
    classifier,
    path: str,
    *,
    output: str = "pred",
    platforms: Sequence[str] = ("tpu", "cpu"),
    shapes: Optional[Sequence[Tuple[int, int]]] = None,
) -> dict:
    """Serialize ``classifier``'s predict program (weights included) to
    ``path``.  Returns the manifest dict.

    output: ``"pred"`` (uint8 argmax class map — the serving artifact) or
    ``"logits"`` (float32 — for downstream softmax/thresholding).
    shapes: ``None`` exports one symbolic-shape program; a list of
    ``(H, W)`` exports one program per static shape (batch stays
    symbolic).  H/W must be multiples of the architecture's stride factor.
    """
    import jax
    from jax import export as jax_export

    if output not in ("pred", "logits"):
        raise ValueError(f"output must be 'pred' or 'logits', got {output!r}")
    stride = classifier.architecture.stride_factor
    fn = _build_fn(classifier, output)
    import jax.numpy as jnp

    exporter = jax_export.export(jax.jit(fn), platforms=list(platforms))
    programs = {}
    if shapes is None:
        b, h, w = jax_export.symbolic_shape(f"b, {stride}*h, {stride}*w")
        programs["program.jaxexp"] = exporter(
            jax.ShapeDtypeStruct((b, h, w), jnp.uint8)
        ).serialize()
    else:
        (b,) = jax_export.symbolic_shape("b")
        for height, width in shapes:
            if height % stride or width % stride:
                raise ValueError(
                    f"shape ({height}, {width}) is not a multiple of the "
                    f"{classifier.architecture.value} stride factor {stride}"
                )
            programs[f"program_{height}x{width}.jaxexp"] = exporter(
                jax.ShapeDtypeStruct((b, height, width), jnp.uint8)
            ).serialize()
    manifest = {
        "format": FORMAT,
        "version": VERSION,
        "architecture": classifier.architecture.value,
        "n_classes": classifier.n_classes,
        "output": output,
        "platforms": list(platforms),
        "stride_factor": stride,
        "symbolic": shapes is None,
        "shapes": [list(s) for s in shapes] if shapes is not None else [],
        "jax_version": jax.__version__,
    }
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("manifest.json", json.dumps(manifest, indent=1))
        for name, blob in programs.items():
            zf.writestr(name, blob)
    return manifest


class AotClassifier:
    """Load and run an exported artifact — no model code or weights needed.

    ``predict(images)`` accepts one page ``(H, W)`` or a batch
    ``(B, H, W)`` of prepared uint8 pages, pads each dim up to the next
    stride multiple (zeros = background in the inverted page convention),
    runs the exported program, and crops back.  Returns the class map
    (uint8) or logits per the artifact's output kind.
    """

    def __init__(self, path: str):
        from jax import export as jax_export

        with zipfile.ZipFile(path) as zf:
            self.manifest = json.loads(zf.read("manifest.json"))
            if self.manifest.get("format") != FORMAT:
                raise ValueError(f"{path} is not a {FORMAT} artifact")
            self._programs = {}
            for info in zf.infolist():
                if info.filename.endswith(".jaxexp"):
                    self._programs[info.filename] = jax_export.deserialize(
                        zf.read(info.filename)
                    )
        self.stride = self.manifest["stride_factor"]
        self.n_classes = self.manifest["n_classes"]
        self.output = self.manifest["output"]

    def _program_for(self, height: int, width: int):
        if self.manifest["symbolic"]:
            return self._programs["program.jaxexp"], height, width
        # static mode: smallest exported shape that fits
        best = None
        for h, w in sorted(self.manifest["shapes"]):
            if h >= height and w >= width and (
                best is None or h * w < best[0] * best[1]
            ):
                best = (h, w)
        if best is None:
            raise ValueError(
                f"no exported shape fits ({height}, {width}); "
                f"have {self.manifest['shapes']}"
            )
        return self._programs[f"program_{best[0]}x{best[1]}.jaxexp"], best[0], best[1]

    def predict(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.uint8)
        single = images.ndim == 2
        if single:
            images = images[None]
        height, width = images.shape[1:3]
        pad_h = -height % self.stride
        pad_w = -width % self.stride
        program, target_h, target_w = self._program_for(
            height + pad_h, width + pad_w
        )
        pad_h, pad_w = target_h - height, target_w - width
        if pad_h or pad_w:
            images = np.pad(images, ((0, 0), (0, pad_h), (0, pad_w)))
        out = np.asarray(program.call(images))
        out = out[:, :height, :width]
        return out[0] if single else out

    __call__ = predict
