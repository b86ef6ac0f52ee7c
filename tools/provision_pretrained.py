"""Provision an ImageNet-pretrained encoder for fine-tuning.

The reference builds its fine-tune architectures with
``weights='imagenet'`` (reference model.py:101 MobileNetV2, :327
ResNet50, :377 EfficientNet), downloading from the Keras model zoo at
model-construction time.  This framework runs in zero-egress
environments, so the user supplies the weights file instead; this tool
makes that a validated one-file drop:

    python tools/provision_pretrained.py backbone.h5 [--out ENCODER_DIR]

It detects the backbone family (MobileNetV2 / ResNet50 / EfficientNet
B0-B7, variant inferred from the weight structure), imports the encoder
through the same machinery ``train --pretrained_encoder`` uses
(models/{mobilenet,resnet,efficientnet}_import.py — Keras-verified),
prints the file's sha256 for provenance records, and (with --out)
converts it to a native msgpack encoder checkpoint loadable without
h5py — ``train --pretrained_encoder ENCODER_DIR`` accepts either form.

Where to get the files (any machine with egress; copy them over):

    from tensorflow.keras.applications import MobileNetV2, ResNet50, EfficientNetB0
    MobileNetV2(weights="imagenet", include_top=False).save("mobilenetv2_imagenet.h5")
    ResNet50(weights="imagenet", include_top=False).save("resnet50_imagenet.h5")
    EfficientNetB0(weights="imagenet", include_top=False).save("effnetb0_imagenet.h5")

Record the sha256 this tool prints next to the file; re-running the tool
verifies the copy.
"""
import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def detect_family(view) -> str:
    """Backbone family from the weight scopes."""
    if "Conv1" in view and "bn_Conv1" in view:
        return "mobilenet"
    if "conv1_conv" in view:
        return "resnet"
    if "stem_conv" in view:
        return "effnet"
    raise SystemExit(
        "unrecognized backbone: expected keras-applications MobileNetV2 "
        "(Conv1/bn_Conv1...), ResNet50 (conv1_conv...), or EfficientNet "
        "(stem_conv/blockXY_...) layer names"
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="validate + convert a keras-applications backbone .h5")
    parser.add_argument("weights", help="backbone .h5 (include_top=False save)")
    parser.add_argument("--out", default=None,
                        help="write a native msgpack encoder checkpoint here "
                             "(train --pretrained_encoder accepts the dir)")
    args = parser.parse_args(argv)

    sha256 = hashlib.sha256(open(args.weights, "rb").read()).hexdigest()

    from page_segmentation_tpu.models.h5_import import as_weights_view

    view = as_weights_view(args.weights)
    family = detect_family(view)

    if family == "mobilenet":
        from page_segmentation_tpu.models.mobilenet_import import load_mobilenet_encoder_h5

        params, stats = load_mobilenet_encoder_h5(view)
        variant = "mobilenetv2"
    elif family == "resnet":
        from page_segmentation_tpu.models.resnet_import import load_resnet50_encoder_h5

        params, stats = load_resnet50_encoder_h5(view)
        variant = "resnet50"
    else:
        from page_segmentation_tpu.models.efficientnet_import import (
            infer_effnet_variant, load_effnet_encoder_h5)

        variant = infer_effnet_variant(view)
        params, stats = load_effnet_encoder_h5(view)

    import jax

    n_tensors = len(jax.tree_util.tree_leaves(params)) + len(jax.tree_util.tree_leaves(stats))
    report = {
        "family": family,
        "variant": variant,
        "tensors": n_tensors,
        "sha256": sha256,
    }

    if args.out:
        from page_segmentation_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(
            args.out,
            {"params": {"encoder": params}, "batch_stats": {"encoder": stats}},
            meta={
                "pretrained_encoder": True,
                "family": family,
                "variant": variant,
                "source_sha256": sha256,
            },
        )
        report["converted_to"] = args.out
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
