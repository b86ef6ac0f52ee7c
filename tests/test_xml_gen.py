"""PAGE-XML output generation: regions -> XML -> (mask_gen parse) round trip."""
import numpy as np
import pytest

from page_segmentation_tpu.pagexml.mask_gen import (
    MaskSetting,
    MaskType,
    PageXMLTypes,
    get_xml_regions,
)
from page_segmentation_tpu.pagexml.xml_gen import build_pagexml, save_pagexml
from page_segmentation_tpu.segmentation.xycut import CVContour, RectSegment


def test_roundtrip_rects_and_contours(tmp_path):
    text = [RectSegment(x_start=10, y_start=20, x_end=60, y_end=90)]  # x=rows, y=cols
    poly = CVContour(np.array([[5, 100], [40, 100], [40, 140], [5, 140]]))  # (col,row)
    path = str(tmp_path / "page.xml")
    save_pagexml(path, "page.png", (200, 150), text_regions=text, image_regions=[poly])

    parsed = get_xml_regions(path, MaskSetting(mask_type=MaskType.ALLTYPES))
    assert parsed.image_size == (200, 150)
    by_type = {r.type: r for r in parsed.xml_regions}
    assert PageXMLTypes.PARAGRAPH in by_type and PageXMLTypes.IMAGE in by_type
    # PAGE convention (x=col, y=row): RectSegment transposed on the way out
    assert by_type[PageXMLTypes.PARAGRAPH].polygon == [(20, 10), (90, 10), (90, 60), (20, 60)]
    assert by_type[PageXMLTypes.IMAGE].polygon == [(5, 100), (40, 100), (40, 140), (5, 140)]


def test_deterministic_output():
    a = build_pagexml("p.png", (10, 10), text_regions=[RectSegment(1, 2, 3, 4)])
    b = build_pagexml("p.png", (10, 10), text_regions=[RectSegment(1, 2, 3, 4)])
    assert a == b
    assert b"1970-01-01" in a  # placeholder timestamps, no wall clock


def test_extra_region_types(tmp_path):
    path = str(tmp_path / "page.xml")
    save_pagexml(
        path, "page.png", (100, 100),
        extra_regions=[("TextRegion", "heading", RectSegment(0, 0, 10, 50)),
                       ("TableRegion", None, RectSegment(50, 0, 90, 50))],
    )
    parsed = get_xml_regions(path, MaskSetting(mask_type=MaskType.ALLTYPES))
    types = {r.type for r in parsed.xml_regions}
    assert types == {PageXMLTypes.HEADING, PageXMLTypes.TABLE}


def test_cli_xml_output(tmp_path):
    from page_segmentation_tpu.cli.main import main as cli
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.core.image_io import imsave

    cmap = ColorMap({"(255, 255, 255)": (0, "background"),
                     "(255, 0, 0)": (1, "text"), "(0, 255, 0)": (2, "image")})
    cmap.save(tmp_path / "map.json")
    pred = np.zeros((200, 160), np.int32)
    pred[20:90, 20:140] = 1
    pred[120:180, 30:130] = 2
    imsave(tmp_path / "page.png", cmap.to_rgb_array(pred))

    rc = cli(["page-segmentation", "--prediction", str(tmp_path / "page.png"),
              "--output_dir", str(tmp_path / "seg"),
              "--xml_output_dir", str(tmp_path / "xml"),
              "--char_height", "10", "--resize_height", "100",
              "--color_map", str(tmp_path / "map.json")])
    assert rc == 0
    parsed = get_xml_regions(str(tmp_path / "xml" / "page.xml"),
                             MaskSetting(mask_type=MaskType.ALLTYPES))
    assert parsed.image_size == (200, 160)
    types = [r.type for r in parsed.xml_regions]
    assert PageXMLTypes.PARAGRAPH in types and PageXMLTypes.IMAGE in types
