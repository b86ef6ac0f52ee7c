"""(Re)freeze the golden corpus's derived outputs into frozen.json.

Run after changing make_corpus.py (and inspect the diff — a hash change
means deterministic host-stage behavior changed):

    python tests/golden_corpus/make_corpus.py
    python tests/golden_corpus/freeze.py

Freezes, for all pages:
  - mask_sha256[setting][file]: gen-masks output hashes for every
    MaskType setting (all_types / text_nontext / baseline / textline /
    text_only) + the emitted image_map.json
  - char_height[page]: compute-image-normalizations results
  - xycut[page]: find_segments rectangles over the all_types masks
"""
import hashlib
import json
import os
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

from page_segmentation_tpu.cli.main import main as cli  # noqa: E402
from page_segmentation_tpu.core.colors import ColorMap  # noqa: E402
from page_segmentation_tpu.core.image_io import imread_rgb  # noqa: E402
from page_segmentation_tpu.segmentation.pc_segmentation import find_segments  # noqa: E402

SETTINGS = ["all_types", "text_nontext", "baseline", "textline", "text_only"]
SEG_MAP = {
    "(255, 255, 255)": (0, "background"),
    "(255, 0, 0)": (1, "text"),
    "(0, 255, 0)": (2, "image"),
}


def main():
    frozen = {"mask_sha256": {}, "char_height": {}, "xycut": {}}
    with tempfile.TemporaryDirectory() as tmp:
        for setting in SETTINGS:
            out = os.path.join(tmp, f"masks_{setting}")
            rc = cli(["gen-masks", "--input_dir", os.path.join(HERE, "xml"),
                      "--output_dir", out, "--setting", setting])
            assert rc == 0
            frozen["mask_sha256"][setting] = {
                name: hashlib.sha256(
                    open(os.path.join(out, name), "rb").read()).hexdigest()
                for name in sorted(os.listdir(out))
            }

        norm = os.path.join(tmp, "norm")
        rc = cli(["compute-image-normalizations",
                  "--input_dir", os.path.join(HERE, "images"),
                  "--output_dir", norm])
        assert rc == 0
        for name in sorted(os.listdir(norm)):
            with open(os.path.join(norm, name)) as f:
                frozen["char_height"][name[:-5]] = json.load(f)["char_height"]

        cmap = ColorMap(SEG_MAP)
        masks = os.path.join(tmp, "masks_all_types")
        pages = sorted(n[: -len(".mask.png")] for n in os.listdir(masks)
                       if n.endswith(".mask.png"))
        for page in pages:
            rgb = imread_rgb(os.path.join(masks, f"{page}.mask.png"))
            texts, images = find_segments(
                400, rgb, frozen["char_height"][page], 300, cmap)
            frozen["xycut"][page] = {
                "text": [[s.x_start, s.y_start, s.x_end, s.y_end] for s in texts],
                "image": [[s.x_start, s.y_start, s.x_end, s.y_end] for s in images],
            }

    with open(os.path.join(HERE, "frozen.json"), "w") as f:
        json.dump(frozen, f, indent=1, sort_keys=True)
    print("frozen.json refrozen:",
          {s: len(v) for s, v in frozen["mask_sha256"].items()},
          frozen["char_height"])


if __name__ == "__main__":
    main()
