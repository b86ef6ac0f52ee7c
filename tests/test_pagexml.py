import numpy as np
import pytest

from page_segmentation_tpu.pagexml.mask_gen import (
    MaskGenerator,
    MaskSetting,
    MaskType,
    PageXMLTypes,
    PCGTSVersion,
    get_xml_regions,
    page_region_to_binary_mask,
    resolve_relative_path,
    string_to_lp,
)

PAGE_XML = """<?xml version="1.0" encoding="UTF-8"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
  <Page imageFilename="page1.png" imageHeight="100" imageWidth="80">
    <TextRegion id="r1" type="paragraph">
      <Coords points="10,10 70,10 70,40 10,40"/>
      <TextLine id="l1">
        <Coords points="12,12 68,12 68,20 12,20"/>
        <Baseline points="12,18 68,18"/>
      </TextLine>
    </TextRegion>
    <TextRegion id="r2" type="heading">
      <Coords points="10,50 70,50 70,60 10,60"/>
    </TextRegion>
    <ImageRegion id="i1">
      <Coords points="10,70 70,70 70,90 10,90"/>
    </ImageRegion>
  </Page>
</PcGts>
"""


@pytest.fixture
def xml_file(tmp_path):
    path = tmp_path / "page1.xml"
    path.write_text(PAGE_XML)
    return str(path)


def test_string_to_lp():
    assert string_to_lp("1,2 3,4") == [(1, 2), (3, 4)]
    assert string_to_lp(None) == []


def test_version_detect(xml_file):
    from lxml import etree

    root = etree.parse(xml_file).getroot()
    assert PCGTSVersion.detect(root) == PCGTSVersion.PCGTS2019


def test_get_xml_regions_alltypes(xml_file):
    regions = get_xml_regions(xml_file, MaskSetting(mask_type=MaskType.ALLTYPES))
    assert regions.image_size == (100, 80)
    types = [r.type for r in regions.xml_regions]
    assert PageXMLTypes.PARAGRAPH in types
    assert PageXMLTypes.HEADING in types
    assert PageXMLTypes.IMAGE in types
    assert regions.filename.endswith("page1.png")


def test_get_xml_regions_baseline(xml_file):
    regions = get_xml_regions(xml_file, MaskSetting(mask_type=MaskType.BASE_LINE))
    assert len(regions.xml_regions) == 1
    assert regions.xml_regions[0].polygon == [(12, 18), (68, 18)]


def test_mask_generator_alltypes(xml_file, tmp_path):
    out_dir = tmp_path / "masks"
    generator = MaskGenerator(MaskSetting(mask_type=MaskType.ALLTYPES))
    out = generator.save(xml_file, str(out_dir))
    from PIL import Image

    mask = np.asarray(Image.open(out))
    assert mask.shape == (100, 80, 3)
    # paragraph red, heading blue, image green, background white
    assert tuple(mask[20, 40]) == (255, 0, 0)
    assert tuple(mask[55, 40]) == (0, 0, 255)
    assert tuple(mask[80, 40]) == (0, 255, 0)
    assert tuple(mask[0, 0]) == (255, 255, 255)


def test_mask_generator_text_nontext(xml_file, tmp_path):
    generator = MaskGenerator(MaskSetting(mask_type=MaskType.TEXT_GRAPHICS))
    out = generator.save(xml_file, str(tmp_path))
    from PIL import Image

    mask = np.asarray(Image.open(out))
    assert tuple(mask[55, 40]) == (255, 0, 0)  # heading is text
    assert tuple(mask[80, 40]) == (0, 255, 0)  # image region


def test_mask_generator_baseline(xml_file, tmp_path):
    generator = MaskGenerator(MaskSetting(mask_type=MaskType.BASE_LINE, line_width=3))
    out = generator.save(xml_file, str(tmp_path))
    from PIL import Image

    mask = np.asarray(Image.open(out))
    assert tuple(mask[18, 40]) == (255, 0, 0)  # baseline drawn
    assert tuple(mask[80, 40]) == (255, 255, 255)  # no image region in baseline mode


def test_binary_mask(xml_file):
    regions = get_xml_regions(xml_file, MaskSetting(mask_type=MaskType.ALLTYPES))
    binary = page_region_to_binary_mask(regions)
    assert binary.shape == (100, 80)
    assert binary[20, 40] and not binary[0, 0]


def test_image_map():
    mapping = PageXMLTypes.image_map(MaskType.TEXT_GRAPHICS)
    assert mapping["(255, 255, 255)"] == (0, "background")
    assert mapping["(255, 0, 0)"] == (1, "paragraph")
    assert mapping["(0, 255, 0)"] == (2, "ImageRegion")
    from page_segmentation_tpu.core.colors import ColorMap

    cmap = ColorMap(mapping)
    assert cmap.n_classes == 3


def test_resolve_relative_path(tmp_path):
    base = tmp_path / "dir" / "file.xml"
    base.parent.mkdir()
    base.write_text("x")
    assert resolve_relative_path(str(base), "/abs/path.png") == "/abs/path.png"
    assert resolve_relative_path(str(base), "img.png") == str(tmp_path / "dir" / "img.png")


def test_capital_is_text():
    assert not PageXMLTypes.DROP_CAPITAL.is_text(False)
    assert PageXMLTypes.DROP_CAPITAL.is_text(True)
    assert PageXMLTypes.PARAGRAPH.is_text(False)
    assert not PageXMLTypes.IMAGE.is_text(True)
