"""Generate the Keras legacy-.h5 export manifests for the three pretrained
segmentation families (page_segmentation_tpu/models/h5_export_manifests.json).

The reference checkpoints every architecture as a Keras ``.h5``
(reference network.py:177-183).  Exporting our flax models back to that
format by *order* (reference decoder layer names are Keras-counter
dependent, so by-name loading is not reproducible) requires knowing, for
each family, the exact sequence of weighted layers and the per-layer
weight order that Keras writes.  Rather than hardcode Keras's graph
serialization rules, this script builds the reference-shaped oracle
models (tests/keras_oracles.py), saves each with real Keras, and records
the observed layout:

    {family: {"keras_version": ..., "layers": [
        {"name": <layer group>, "weights": [[<weight path>, <shape>], ...]},
        ...]}}

For layers whose values are model-constants rather than trained weights
(the EfficientNet ``normalization`` preprocessing layer), the values are
inlined so export can reproduce them.

Run (needs TF, ~10 min for all EfficientNet variants):
    python tools/gen_h5_export_manifests.py [--families mobile_net image_res_net effb0 ...]
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "page_segmentation_tpu", "models", "h5_export_manifests.json",
)


def _decode(v):
    return v.decode() if isinstance(v, bytes) else v


def manifest_for(model):
    import h5py

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "m.h5")
        model.save(path)
        layers = []
        with h5py.File(path, "r") as f:
            group = f["model_weights"]
            for layer_name in (_decode(n) for n in group.attrs["layer_names"]):
                weight_names = [
                    _decode(n) for n in group[layer_name].attrs.get("weight_names", [])
                ]
                if not weight_names:
                    continue
                entry = {
                    "name": layer_name,
                    "weights": [
                        [wn, list(group[layer_name][wn].shape)] for wn in weight_names
                    ],
                }
                # preprocessing constants (identity in the oracle build):
                # inline the values — they are not represented in flax
                if any(wn.rsplit("/", 2)[-2].startswith("normalization")
                       for wn in weight_names if "/" in wn):
                    entry["values"] = [
                        [float(x) for x in group[layer_name][wn][()].reshape(-1)]
                        if group[layer_name][wn].shape else
                        [float(group[layer_name][wn][()])]
                        for wn in weight_names
                    ]
                layers.append(entry)
    return layers


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--families", nargs="*", default=None,
                        help="subset to regenerate (default: all)")
    args = parser.parse_args()

    import tensorflow as tf

    from tests.keras_oracles import EFFNET_BUILDERS, keras_mobile_net, keras_res_net

    builders = {"mobile_net": keras_mobile_net, "image_res_net": keras_res_net}
    builders.update(EFFNET_BUILDERS)
    wanted = args.families or list(builders)

    manifests = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            manifests = json.load(f)

    for family in wanted:
        print(f"building {family} ...", flush=True)
        model = builders[family]()
        manifests[family] = {
            "keras_version": tf.keras.__version__,
            "layers": manifest_for(model),
        }
        n = sum(len(l["weights"]) for l in manifests[family]["layers"])
        print(f"  {len(manifests[family]['layers'])} weighted layers, {n} weights")
        del model
        tf.keras.backend.clear_session()

    with open(OUT, "w") as f:
        json.dump(manifests, f, indent=1)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
