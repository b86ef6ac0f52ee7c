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
    """All-types GT masks at A4 scale, one page in BOTH encodings: the
    indexed PNG our own predict stage writes (imsave_indexed — the
    pipeline contract) and a plain RGB PNG (arbitrary external input).
    Returns [(rgb_path, idx_path, char_height), ...]."""
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.core.image_io import imread_rgb, imsave, imsave_indexed
    from page_segmentation_tpu.ops.resize import resize_nearest_cv
    from page_segmentation_tpu.pagexml.mask_gen import MaskGenerator, MaskSetting, MaskType

    masks_dir = os.path.join(workdir, "masks")
    os.makedirs(masks_dir, exist_ok=True)
    gen = MaskGenerator(MaskSetting(mask_type=MaskType.ALLTYPES))
    xml_dir = os.path.join(CORPUS, "xml")
    char_heights = json.load(open(os.path.join(CORPUS, "frozen.json")))["char_height"]
    palette = ColorMap(SEG_MAP).palette
    pages = []
    for name in sorted(os.listdir(xml_dir)):
        gen.save(os.path.join(xml_dir, name), masks_dir)
    for name in sorted(os.listdir(masks_dir)):
        stem = name.split(".")[0]
        rgb = imread_rgb(os.path.join(masks_dir, name))
        big = resize_nearest_cv(rgb, A4)
        labels = np.zeros(big.shape[:2], np.uint8)
        for idx, color in enumerate(palette):
            labels[(big == color).all(-1)] = idx
        rgb_path = os.path.join(workdir, f"{stem}.rgb.pred.png")
        idx_path = os.path.join(workdir, f"{stem}.pred.png")
        imsave(rgb_path, big)
        imsave_indexed(idx_path, labels, palette)
        ch = round(char_heights[stem] * A4[0] / rgb.shape[0])
        pages.append((rgb_path, idx_path, ch))
    return pages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--resize-height", type=int, default=300)
    ap.add_argument("--batch", type=int, default=9,
                    help="pages per pipeline batch (9 = all golden pages "
                         "in one device morphology dispatch)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-device", action="store_true",
                    help="skip the device-morphology A/B line (the host "
                         "chain is the production placement on this link; "
                         "a wedged tunnel phase otherwise stalls a host-"
                         "only capture indefinitely)")
    args = ap.parse_args()

    import jax

    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.segmentation.batch import PageSegmenter

    cmap = ColorMap(SEG_MAP)
    modes = {}
    with tempfile.TemporaryDirectory() as workdir:
        pages = build_pages(workdir)
        out_dir = os.path.join(workdir, "seg")

        def run_mode(contours: bool, source: str = "indexed",
                     backend: str = "auto", reps: int = 0):
            """One PageSegmenter config through the pipelined driver
            (decode-ahead + indexed fast path + device morphology when a
            TPU is present), whole-run wall per rep."""
            segmenter = PageSegmenter(
                cmap, args.resize_height, contours, out_dir, backend=backend,
                batch_size=args.batch)
            pairs = [((idx if source == "indexed" else rgb), ch)
                     for rgb, idx, ch in pages]
            # one uncounted warmup pass: first-pass costs (program/cache
            # warm, allocator growth) otherwise land in rep 0 and drag
            # the median on short runs (same policy as bench.py's warmup)
            list(segmenter.run(pairs))
            walls, region_counts = [], []
            for rep in range(max(1, reps or args.reps)):
                t0 = time.perf_counter()
                results = list(segmenter.run(pairs))
                walls.append(time.perf_counter() - t0)
                if rep == 0:
                    region_counts = [len(r[1]) + len(r[2]) for r in results]
                print(f"rep {rep}: {len(pages)} pages in {walls[-1]:.2f}s = "
                      f"{len(pages) / walls[-1]:.1f} pages/s "
                      f"[{'contours' if contours else 'xycut'}/{source}/{backend}]",
                      file=sys.stderr)
            wall = statistics.median(walls)
            return {
                "pages_per_sec": round(len(pages) / wall, 2),
                "rep_pages_per_sec": [round(len(pages) / w, 2) for w in walls],
                "source": source,
                "backend": backend,
                "regions_per_page": region_counts,
            }

        modes["xycut"] = run_mode(contours=False)
        modes["text_contours"] = run_mode(contours=True)
        if not args.skip_device:
            # the device-morphology placement, recorded for the A/B even
            # though auto resolves to host on this link (see batch.py)
            modes["text_contours_device"] = run_mode(
                contours=True, backend="device", reps=min(args.reps, 3))
        # legacy comparison line: arbitrary RGB input, host morphology —
        # the pre-pipeline configuration
        modes["text_contours_rgb_host"] = run_mode(
            contours=True, source="rgb", backend="host",
            reps=min(args.reps, 3))

    n_pages = len(modes['xycut']['regions_per_page'])
    result = {
        "metric": "segmentation_pages_per_sec",
        "value": modes["xycut"]["pages_per_sec"],
        "unit": "pages/sec",
        "page_shape": list(A4),
        "n_pages": n_pages,
        "resize_height": args.resize_height,
        "host_cpus": os.cpu_count(),
        "jax_backend": jax.default_backend(),
        "modes": modes,
        "note": ("pipelined driver (segmentation/batch.py): decode-ahead "
                 "prefetch; indexed prediction PNGs (the predict stage's "
                 "own output format) decoded to labels; text-contours "
                 "morphology batched on device when a TPU is present. "
                 "Golden all-types GT masks upscaled nearest to 300-DPI A4; "
                 "PNG decode inside the clock as in the CLI"),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
