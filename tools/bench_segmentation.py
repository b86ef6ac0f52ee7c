"""Bench the page-segmentation stage: prediction PNG -> region masks.

Covers the reference's second headline workflow (pc_segmentation.py +
render.py via the `page-segmentation` CLI), which has no recorded perf
line yet: per page, decode the prediction color PNG, run `find_segments`
(XY-cut) and render, and separately the `--text_contours` morphological
variant (`get_text_contours` + render_morphological).  All host-side
single-core work — no device, no link — so the number is a *host* line
like the disk-pipeline bench, honest about this class of host.

Input pages: the 9 golden-corpus all-types GT masks (realistic block
structure: paragraphs, headings, drop caps, tables, images, marginalia)
upscaled nearest to 300-DPI A4 (3508x2480), written to disk so the PNG
decode sits inside the clock exactly as in the CLI contract.

Usage: python tools/bench_segmentation.py [--reps 3] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A4 = (3508, 2480)
CORPUS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden_corpus")
SEG_MAP = {
    "(255, 255, 255)": (0, "background"),
    "(255, 0, 0)": (1, "text"),
    "(0, 255, 0)": (2, "image"),
}


def build_pages(workdir: str):
    """All-types GT masks at A4 scale, one PNG per golden page."""
    from page_segmentation_tpu.core.image_io import imread_rgb, imsave
    from page_segmentation_tpu.ops.resize import resize_nearest_cv
    from page_segmentation_tpu.pagexml.mask_gen import MaskGenerator, MaskSetting, MaskType

    masks_dir = os.path.join(workdir, "masks")
    os.makedirs(masks_dir, exist_ok=True)
    gen = MaskGenerator(MaskSetting(mask_type=MaskType.ALLTYPES))
    xml_dir = os.path.join(CORPUS, "xml")
    paths = []
    char_heights = json.load(open(os.path.join(CORPUS, "frozen.json")))["char_height"]
    pages = []
    for name in sorted(os.listdir(xml_dir)):
        gen.save(os.path.join(xml_dir, name), masks_dir)
    for name in sorted(os.listdir(masks_dir)):
        stem = name.split(".")[0]
        rgb = imread_rgb(os.path.join(masks_dir, name))
        big = resize_nearest_cv(rgb, A4)
        out = os.path.join(workdir, f"{stem}.pred.png")
        imsave(out, big)
        ch = round(char_heights[stem] * A4[0] / rgb.shape[0])
        pages.append((out, ch))
        paths.append(out)
    return pages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--resize-height", type=int, default=300)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.core.image_io import imread_rgb
    from page_segmentation_tpu.segmentation.pc_segmentation import (
        find_segments, get_text_contours)
    from page_segmentation_tpu.segmentation.render import (
        render_morphological, render_regions, render_xycut)

    cmap = ColorMap(SEG_MAP)
    modes = {}
    with tempfile.TemporaryDirectory() as workdir:
        pages = build_pages(workdir)
        out_dir = os.path.join(workdir, "seg")

        def run_mode(contours: bool):
            walls, stage = [], {"decode": [], "segment": [], "render": []}
            region_counts = []
            for rep in range(max(1, args.reps)):
                t0 = time.perf_counter()
                for path, ch in pages:
                    ta = time.perf_counter()
                    image = imread_rgb(path)
                    tb = time.perf_counter()
                    texts, images = find_segments(
                        image.shape[0], image, ch, args.resize_height, cmap,
                        only_images=contours)
                    if contours:
                        regions = get_text_contours(image, ch, cmap)
                        method = render_morphological
                    else:
                        regions, method = texts, render_xycut
                    tc = time.perf_counter()
                    render_regions(out_dir, "png", image.shape[:2], path,
                                   cmap, method, regions, images)
                    td = time.perf_counter()
                    stage["decode"].append(tb - ta)
                    stage["segment"].append(tc - tb)
                    stage["render"].append(td - tc)
                    if rep == 0:
                        region_counts.append(len(regions) + len(images))
                walls.append(time.perf_counter() - t0)
                print(f"rep {rep}: {len(pages)} pages in {walls[-1]:.2f}s = "
                      f"{len(pages) / walls[-1]:.1f} pages/s", file=sys.stderr)
            wall = statistics.median(walls)
            return {
                "pages_per_sec": round(len(pages) / wall, 2),
                "rep_pages_per_sec": [round(len(pages) / w, 2) for w in walls],
                "stage_median_ms": {k: round(statistics.median(v) * 1e3, 1)
                                    for k, v in stage.items()},
                "regions_per_page": region_counts,
            }

        modes["xycut"] = run_mode(contours=False)
        modes["text_contours"] = run_mode(contours=True)

    result = {
        "metric": "segmentation_pages_per_sec",
        "value": modes["xycut"]["pages_per_sec"],
        "unit": "pages/sec",
        "page_shape": list(A4),
        "n_pages": 9,
        "resize_height": args.resize_height,
        "host_cpus": os.cpu_count(),
        "modes": modes,
        "note": ("host-only stage (no device/link); golden all-types GT masks "
                 "upscaled nearest to 300-DPI A4; PNG decode inside the clock "
                 "as in the page-segmentation CLI"),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
