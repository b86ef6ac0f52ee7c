"""Deterministic generator of the golden corpus: three historical-style
page scans (textured paper, text blocks, a figure, marginalia) with
matching binarizations and PAGE-XML 2019 ground truth.

Run once to (re)create the checked-in corpus:
    python tests/golden_corpus/make_corpus.py
The test suite treats the generated files + frozen outputs as fixtures;
regenerating must be byte-identical (fixed seeds, no timestamps).
"""
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

from page_segmentation_tpu.core.image_io import imsave  # noqa: E402

H, W = 400, 300
NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"


def _paper(rng):
    """Aged-paper texture: light base + low-frequency mottling + grain."""
    base = np.full((H, W), 225.0)
    yy, xx = np.mgrid[0:H, 0:W]
    mottle = 8 * np.sin(yy / 37.0 + rng.rand() * 6) * np.cos(xx / 53.0 + rng.rand() * 6)
    grain = rng.randn(H, W) * 4
    return base + mottle + grain


def _text_block(img, rng, top, left, bottom, right, char_h=14):
    """Rows of dark glyph-like strokes; returns the block's polygon."""
    for row in range(top, bottom - char_h, int(char_h * 1.7)):
        col = left
        while col < right - 6:
            glyph_w = rng.randint(4, 11)
            if rng.rand() < 0.82:
                shade = rng.randint(15, 70)
                img[row : row + char_h, col : col + glyph_w] = shade
                if rng.rand() < 0.3:  # ascender/descender
                    img[row - 3 : row, col : col + 2] = shade
            col += glyph_w + rng.randint(2, 5)
    return [(left, top), (right, top), (right, bottom), (left, bottom)]


def _figure(img, rng, top, left, bottom, right):
    """A halftone-ish illustration block."""
    yy, xx = np.mgrid[top:bottom, left:right]
    tone = 120 + 40 * np.sin(yy / 9.0) * np.cos(xx / 7.0) + rng.randn(*yy.shape) * 10
    img[top:bottom, left:right] = tone
    return [(left, top), (right, top), (right, bottom), (left, bottom)]


def _region(region_id, rtype, polygon, tag="TextRegion", extra=""):
    points = " ".join(f"{x},{y}" for x, y in polygon)
    type_attr = f' type="{rtype}"' if rtype else ""
    return (
        f'    <{tag} id="{region_id}"{type_attr}{extra}>\n'
        f'      <Coords points="{points}"/>\n'
        f"    </{tag}>\n"
    )


def make_page(index: int):
    rng = np.random.RandomState(100 + index)
    img = _paper(rng)

    regions = []
    main_poly = _text_block(img, rng, 60, 40, 250, 240)
    regions.append(_region(f"r{index}_main", "paragraph", main_poly))
    if index != 1:
        fig_poly = _figure(img, rng, 270, 70, 360, 230)
        regions.append(_region(f"r{index}_fig", None, fig_poly, tag="ImageRegion"))
    else:
        second_poly = _text_block(img, rng, 280, 40, 370, 240)
        regions.append(_region(f"r{index}_second", "paragraph", second_poly))
    head_poly = _text_block(img, rng, 20, 80, 45, 220, char_h=10)
    regions.append(_region(f"r{index}_head", "heading", head_poly))
    margin_poly = _text_block(img, rng, 100, 250, 180, 290, char_h=8)
    regions.append(_region(f"r{index}_marg", "marginalia", margin_poly))

    image = np.clip(img, 0, 255).astype(np.uint8)
    binary = np.where(image < 128, 0, 255).astype(np.uint8)  # ink black

    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<PcGts xmlns="{NS}">\n'
        f'  <Page imageFilename="page{index}.png" imageHeight="{H}" imageWidth="{W}">\n'
        + "".join(regions)
        + "  </Page>\n</PcGts>\n"
    )
    return image, binary, xml


def main():
    for sub in ("images", "binary", "xml"):
        os.makedirs(os.path.join(HERE, sub), exist_ok=True)
    for i in range(3):
        image, binary, xml = make_page(i)
        imsave(os.path.join(HERE, "images", f"page{i}.png"), image)
        imsave(os.path.join(HERE, "binary", f"page{i}.png"), binary)
        with open(os.path.join(HERE, "xml", f"page{i}.xml"), "w") as f:
            f.write(xml)
    print("corpus written to", HERE)


if __name__ == "__main__":
    main()
