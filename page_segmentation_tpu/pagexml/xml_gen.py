"""PAGE-XML *output* generation: segmentation regions -> PAGE-XML.

The inverse of mask_gen.py: where that module rasterizes PRImA PAGE-XML
ground truth into masks, this one serializes the segmentation results
(XY-cut rectangles / morphological text contours, segmentation/xycut.py
region types) into a PAGE-XML document that downstream OCR tooling
(the consumers of the reference frontend's region polygons) can ingest.

Documents use the 2019-07-15 schema namespace and are deterministic:
the Metadata timestamps are caller-provided (a fixed placeholder by
default) so generated files diff cleanly.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import numpy as np
from lxml import etree

from ..segmentation.xycut import AnyRegion, RectSegment
from .mask_gen import PCGTSVersion

_PLACEHOLDER_TIME = "1970-01-01T00:00:00"


def _page_points(region: AnyRegion) -> str:
    """Region outline as a PAGE points attribute, (x=column, y=row).

    Contours already carry (col, row) points; RectSegment uses the
    xycut convention (x indexes rows, y columns) and is transposed here.
    """
    if isinstance(region, RectSegment):
        polygon = [
            (region.y_start, region.x_start),
            (region.y_end, region.x_start),
            (region.y_end, region.x_end),
            (region.y_start, region.x_end),
        ]
    else:
        polygon = region.polygon_coords()
    return " ".join(f"{int(x)},{int(y)}" for x, y in np.asarray(polygon).reshape(-1, 2))


def build_pagexml(
    image_filename: str,
    image_size: Tuple[int, int],
    text_regions: Sequence[AnyRegion] = (),
    image_regions: Sequence[AnyRegion] = (),
    extra_regions: Iterable[Tuple[str, Optional[str], AnyRegion]] = (),
    creator: str = "page_segmentation_tpu",
    created: str = _PLACEHOLDER_TIME,
    version: PCGTSVersion = PCGTSVersion.PCGTS2019,
) -> bytes:
    """Serialize regions into a PAGE-XML document (bytes, UTF-8).

    ``text_regions`` become ``TextRegion type="paragraph"``,
    ``image_regions`` become ``ImageRegion``; ``extra_regions`` entries are
    ``(tag, type_attr, region)`` for anything else (headings, tables, ...).
    ``image_size`` is (height, width); polygons come from the region's
    ``polygon_coords()`` in (x=column, y=row) order, PAGE's convention.
    """
    ns = version.get_namespace()
    root = etree.Element("PcGts", nsmap={None: ns})

    meta = etree.SubElement(root, "Metadata")
    etree.SubElement(meta, "Creator").text = creator
    etree.SubElement(meta, "Created").text = created
    etree.SubElement(meta, "LastChange").text = created

    height, width = image_size
    page = etree.SubElement(
        root,
        "Page",
        imageFilename=str(image_filename),
        imageHeight=str(int(height)),
        imageWidth=str(int(width)),
    )

    def add(tag: str, type_attr: Optional[str], region: AnyRegion, index: int) -> None:
        attrs = {"id": f"r{index}"}
        if type_attr:
            attrs["type"] = type_attr
        element = etree.SubElement(page, tag, **attrs)
        etree.SubElement(element, "Coords", points=_page_points(region))

    index = 0
    for region in text_regions:
        add("TextRegion", "paragraph", region, index)
        index += 1
    for region in image_regions:
        add("ImageRegion", None, region, index)
        index += 1
    for tag, type_attr, region in extra_regions:
        add(tag, type_attr, region, index)
        index += 1

    return etree.tostring(
        root, xml_declaration=True, encoding="UTF-8", pretty_print=True
    )


def save_pagexml(path: str, *args, **kwargs) -> str:
    """Write :func:`build_pagexml` output to ``path``; returns the path."""
    payload = build_pagexml(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(payload)
    return path
