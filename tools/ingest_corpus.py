"""One-command ingest: real scans + PAGE-XML -> ready-to-train dataset.

The reference documents a multi-step shell recipe for this
(reference examples/dataset-creation-example.sh:17-55: binarize, rasterize
masks from PAGE-XML, estimate normalizations, assemble the dataset file).
This tool runs the whole chain through the framework's own CLI so a real
historical-scan corpus drop becomes one command:

    python tools/ingest_corpus.py \
        --images /path/scans --xml /path/page_xml --output /path/dataset \
        [--binary /path/binarized] [--setting all_types] \
        [--n-train -1 --n-test 10 --n-eval 10]

Steps (all framework CLI / ops, nothing external):
  1. gen-masks: PAGE-XML -> color mask PNGs + image_map.json
  2. binaries: copy the provided directory, or Otsu-binarize the scans
     (written as TRUE 1-bit PNGs — the fast on-disk layout, bit-equal
     through every reader)
  3. compute-image-normalizations: per-page char heights
  4. create-dataset-file: the train/test/eval split JSON

Output layout (the create-dataset-file contract):
    <output>/{images,binary_images,masks,normalizations}/ + image_map.json
    + dataset.json

Dry-run-tested against the golden corpus in
tests/test_ingest_corpus.py; the moment a real corpus exists this is the
single command that stages it (VERDICT r3 next-step #7).
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", required=True, help="raw scan directory")
    parser.add_argument("--xml", required=True, help="PAGE-XML directory")
    parser.add_argument("--binary", default=None,
                        help="pre-binarized pages (copied as-is); omitted = "
                             "Otsu-binarize the scans, stored as 1-bit PNGs")
    parser.add_argument("--output", required=True, help="dataset root to build")
    parser.add_argument("--setting", default="all_types",
                        choices=["all_types", "text_nontext", "baseline",
                                 "textline", "text_only"])
    parser.add_argument("--pcgts-version", default=None,
                        choices=["2019", "2017", "2013", "2010"])
    parser.add_argument("--average-all", action="store_true",
                        help="use the corpus-average char height for every "
                             "page (reference ocrd_compute_normalizations "
                             "--average_all)")
    parser.add_argument("--n-train", type=float, default=-1)
    parser.add_argument("--n-test", type=float, default=0)
    parser.add_argument("--n-eval", type=float, default=0)
    parser.add_argument("--seed", type=int, default=None,
                        help="shuffle seed for the split (default: random)")
    args = parser.parse_args(argv)

    from page_segmentation_tpu.cli.main import main as cli

    out = args.output
    dirs = {s: os.path.join(out, s)
            for s in ("images", "binary_images", "masks", "normalizations")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    # 1. masks from PAGE-XML (+ image_map.json moved to the dataset root)
    rc = cli(["gen-masks", "--input_dir", args.xml,
              "--output_dir", dirs["masks"], "--setting", args.setting]
             + (["--pcgts_version", args.pcgts_version]
                if args.pcgts_version else []))
    if rc != 0:
        return rc
    map_src = os.path.join(dirs["masks"], "image_map.json")
    image_map = os.path.join(out, "image_map.json")
    if os.path.exists(map_src):
        shutil.move(map_src, image_map)

    # 2. images + binaries
    names = sorted(n for n in os.listdir(args.images)
                   if n.lower().endswith(IMAGE_EXTS))
    if not names:
        print(f"no images found under {args.images}", file=sys.stderr)
        return 1
    for name in names:
        dst = os.path.join(dirs["images"], name)
        if not os.path.exists(dst):
            shutil.copy(os.path.join(args.images, name), dst)
    if args.binary:
        for name in names:
            src = os.path.join(args.binary, name)
            if not os.path.exists(src):
                print(f"missing binary for {name} under {args.binary}",
                      file=sys.stderr)
                return 1
            shutil.copy(src, os.path.join(dirs["binary_images"], name))
    else:
        import numpy as np

        from page_segmentation_tpu.core.image_io import (
            imread, imsave_bilevel)
        from page_segmentation_tpu.ops.threshold import otsu_threshold

        for name in names:
            gray = imread(os.path.join(args.images, name), as_gray=True)
            # cv2 Otsu convention: strictly-above-threshold pixels are paper
            thresh = otsu_threshold(gray) + 1
            stem = os.path.splitext(name)[0]
            imsave_bilevel(
                os.path.join(dirs["binary_images"], stem + ".png"),
                (gray >= thresh).astype(np.uint8) * 255,
            )

    # 3. per-page char heights from the binarized pages
    rc = cli(["compute-image-normalizations",
              "--input_dir", dirs["binary_images"],
              "--output_dir", dirs["normalizations"]]
             + (["--average_all"] if args.average_all else []))
    if rc != 0:
        return rc

    # 4. the split file
    if args.seed is not None:
        import random

        random.seed(args.seed)
    dataset_json = os.path.join(out, "dataset.json")
    rc = cli(["create-dataset-file", "--dataset_path", out,
              "--output_file", dataset_json,
              "--n_train", str(args.n_train), "--n_test", str(args.n_test),
              "--n_eval", str(args.n_eval), "--verify_filenames"])
    if rc != 0:
        return rc
    split = json.load(open(dataset_json))
    print(json.dumps({
        "dataset": out,
        "pages": len(names),
        "train": len(split["train"]),
        "test": len(split["test"]),
        "eval": len(split["eval"]),
        "image_map": image_map,
        "dataset_json": dataset_json,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
