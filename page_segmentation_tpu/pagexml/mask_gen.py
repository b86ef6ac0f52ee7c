"""PageXML ground-truth mask generation.

Covers the capability of reference pagexml.py: ``MaskType`` (:10-27),
``PCGTSVersion`` with namespace autodetect (:30-54), ``MaskSetting``
(:57-63), ``PageXMLTypes`` — 19 region types with fixed RGB colors
(:66-129) — those tables are PAGE-schema facts — plus region collection
and rasterization (:148-265) built here as a declarative harvest plan:
each mask type maps to a list of (xpath, coords-tag, type) rules consumed
by one generic collector, and rasterization is a painter callback over a
shared canvas routine.  Rasterization is PIL (pure host-side dataset
tooling, not a TPU path).
"""
from __future__ import annotations

import enum
import os
from typing import List, NamedTuple, Optional, Set, Tuple

import numpy as np
from lxml import etree
from PIL import Image, ImageDraw


class MaskType(enum.Enum):
    ALLTYPES = "all_types"
    TEXT_GRAPHICS = "text_nontext"
    BASE_LINE = "baseline"
    TEXT_LINE = "textline"
    TEXT_ONLY = "text_only"

    def get_color(self, region: "Region", capital_is_text: bool) -> Tuple[int, int, int]:
        if self is MaskType.ALLTYPES:
            return region.type.color
        if self is MaskType.TEXT_ONLY:
            return region.type.color_text_only(capital_is_text)
        return region.type.color_text_graphics(capital_is_text)


class PCGTSVersion(enum.Enum):
    PCGTS2019 = "2019"
    PCGTS2017 = "2017"
    PCGTS2013 = "2013"
    PCGTS2010 = "2010"

    def get_namespace(self) -> str:
        return {
            PCGTSVersion.PCGTS2019: "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15",
            PCGTSVersion.PCGTS2017: "http://schema.primaresearch.org/PAGE/gts/pagecontent/2017-07-15",
            PCGTSVersion.PCGTS2013: "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15",
            PCGTSVersion.PCGTS2010: "http://schema.primaresearch.org/PAGE/gts/pagecontent/2010-03-19",
        }[self]

    @staticmethod
    def detect(root) -> "PCGTSVersion":
        for ns in root.nsmap.values():
            if ns.startswith("http://schema.primaresearch.org/PAGE/gts/pagecontent"):
                for version in PCGTSVersion:
                    if version.get_namespace() == ns:
                        return version
                raise Exception("Unknown Schema Version")
        raise Exception("No PAGE namespace found")


class MaskSetting(NamedTuple):
    mask_extension: str = "png"
    mask_type: MaskType = MaskType.ALLTYPES
    pcgts_version: Optional[PCGTSVersion] = None  # autodetect if not given
    line_width: int = 5
    capital_is_text: bool = False
    use_xml_filename: bool = False


class PageXMLTypes(enum.Enum):
    PARAGRAPH = ("paragraph", (255, 0, 0))
    IMAGE = ("ImageRegion", (0, 255, 0))
    GRAPHIC = ("GraphicRegion", (0, 255, 0))
    TABLE = ("TableRegion", (0, 128, 0))
    MATHS = ("MathsRegion", (0, 0, 128))
    HEADING = ("heading", (0, 0, 255))
    HEADER = ("header", (0, 255, 255))
    CATCH_WORD = ("catch-word", (255, 255, 0))
    PAGE_NUMBER = ("page-number", (255, 0, 255))
    SIGNATURE_MARK = ("signature-mark", (128, 0, 128))
    MARGINALIA = ("marginalia", (128, 128, 0))
    OTHER = ("other", (0, 128, 128))
    DROP_CAPITAL = ("drop-capital", (255, 128, 0))
    FLOATING = ("floating", (255, 0, 128))
    CAPTION = ("caption", (128, 255, 0))
    ENDNOTE = ("endnote", (0, 255, 128))
    FOOTER = ("footer", (255, 128, 128))
    FOOTNOTE = ("footnote", (128, 255, 128))
    FOOTNOTE_CONTINUED = ("footnote-continued", (128, 255, 128))
    UNKNOWN = ("", (10, 10, 10))

    def __new__(cls, value, color):
        obj = object.__new__(cls)
        obj._value_ = value
        obj.color = color
        obj.label = value
        return obj

    def color_text_graphics(self, capital_is_text: bool = False) -> Tuple[int, int, int]:
        return (255, 0, 0) if self.is_text(capital_is_text) else (0, 255, 0)

    def color_text_only(self, capital_is_text: bool = False) -> Tuple[int, int, int]:
        return (255, 0, 0) if self.is_text(capital_is_text) else (255, 255, 255)

    def is_text(self, capital_is_text: bool) -> bool:
        return not (
            self is PageXMLTypes.IMAGE
            or self is PageXMLTypes.GRAPHIC
            or (self is PageXMLTypes.DROP_CAPITAL and not capital_is_text)
        )

    @classmethod
    def image_map(cls, mask_type: MaskType) -> dict:
        """The '(r, g, b)' -> (index, label) dict consumed by ColorMap
        (reference pagexml.py:114-129)."""
        types = {
            MaskType.ALLTYPES: list(PageXMLTypes),
            MaskType.TEXT_GRAPHICS: [PageXMLTypes.PARAGRAPH, PageXMLTypes.IMAGE],
            MaskType.TEXT_ONLY: [PageXMLTypes.PARAGRAPH],
            MaskType.TEXT_LINE: [PageXMLTypes.PARAGRAPH],
            MaskType.BASE_LINE: [PageXMLTypes.PARAGRAPH],
        }[mask_type]
        mapping = {
            str(xmltype.color): (i + 1, xmltype.label) for (i, xmltype) in enumerate(types)
        }
        mapping["(255, 255, 255)"] = (0, "background")
        return mapping

    # reference-API alias
    color_map = image_map


class Region(NamedTuple):
    polygon: List[Tuple[int, int]]
    type: PageXMLTypes


class PageRegions(NamedTuple):
    image_size: Tuple[int, int]
    xml_regions: List[Region]
    filename: str

    def only_types(self, types: Set[PageXMLTypes]) -> "PageRegions":
        return PageRegions(
            image_size=self.image_size,
            xml_regions=[x for x in self.xml_regions if x.type in types],
            filename=self.filename,
        )


class MaskGenerator:
    def __init__(self, settings: MaskSetting):
        self.settings = settings

    def save(self, file, output_dir) -> str:
        """Rasterize one PAGE-XML file into ``<page>.mask.<ext>``."""
        page = get_xml_regions(file, self.settings)
        name_source = file if self.settings.use_xml_filename else page.filename
        page_name = os.path.splitext(os.path.basename(name_source))[0]
        os.makedirs(output_dir, exist_ok=True)
        out = os.path.join(output_dir, f"{page_name}.mask.{self.settings.mask_extension}")
        page_region_to_mask(page, self.settings).save(out)
        return out


def string_to_lp(points: Optional[str]) -> List[Tuple[int, int]]:
    """Parse a PAGE-XML points attribute ('x0,y0 x1,y1 ...') into tuples."""
    if not points:
        return []
    return [tuple(int(v) for v in pair.split(",")) for pair in points.split(" ")]


class _Harvest(NamedTuple):
    """One region-collection rule: which elements, where their points
    live, and how to type them (None = read the element's @type)."""

    xpath: str
    coords_tag: str = "pcgts:Coords"
    fixed_type: Optional[PageXMLTypes] = None


_MASK_HARVESTS = {
    # region-level masks read TextRegion outlines typed by their @type;
    # ALLTYPES additionally rasterizes maths/table regions, and both
    # graphic tags collapse onto the IMAGE color (ref pagexml.py:195-218)
    MaskType.ALLTYPES: [
        _Harvest(".//pcgts:TextRegion"),
        _Harvest(".//pcgts:MathsRegion", fixed_type=PageXMLTypes.MATHS),
        _Harvest(".//pcgts:TableRegion", fixed_type=PageXMLTypes.TABLE),
        _Harvest(".//pcgts:ImageRegion", fixed_type=PageXMLTypes.IMAGE),
        _Harvest(".//pcgts:GraphicRegion", fixed_type=PageXMLTypes.IMAGE),
    ],
    MaskType.TEXT_GRAPHICS: [
        _Harvest(".//pcgts:TextRegion"),
        _Harvest(".//pcgts:ImageRegion", fixed_type=PageXMLTypes.IMAGE),
        _Harvest(".//pcgts:GraphicRegion", fixed_type=PageXMLTypes.IMAGE),
    ],
    MaskType.TEXT_ONLY: [_Harvest(".//pcgts:TextRegion")],
    # line-level masks descend into TextLine children instead
    MaskType.TEXT_LINE: [_Harvest(".//pcgts:TextRegion/pcgts:TextLine")],
    MaskType.BASE_LINE: [
        _Harvest(".//pcgts:TextRegion/pcgts:TextLine", coords_tag="pcgts:Baseline")
    ],
}


def _element_type(element) -> PageXMLTypes:
    return PageXMLTypes(element.attrib.get("type", "paragraph"))


def _harvest_regions(root, namespaces, rules: List[_Harvest]) -> List[Region]:
    regions: List[Region] = []
    for rule in rules:
        for element in root.findall(rule.xpath, namespaces):
            coords = element.find(rule.coords_tag, namespaces)
            if coords is None:
                continue
            regions.append(
                Region(
                    polygon=string_to_lp(coords.get("points")),
                    type=rule.fixed_type or _element_type(element),
                )
            )
    return regions


def get_xml_regions(xml_file, setting: MaskSetting) -> PageRegions:
    """Collect the regions a mask type needs from one PAGE-XML file."""
    root = etree.parse(xml_file).getroot()
    version = setting.pcgts_version or PCGTSVersion.detect(root)
    namespaces = {"pcgts": version.get_namespace()}

    regions = _harvest_regions(root, namespaces, _MASK_HARVESTS[setting.mask_type])

    page = root.find(".//pcgts:Page", namespaces)
    return PageRegions(
        image_size=(int(page.get("imageHeight")), int(page.get("imageWidth"))),
        xml_regions=regions,
        filename=resolve_relative_path(xml_file, page.get("imageFilename")),
    )


def resolve_relative_path(base, path) -> str:
    """Resolve ``path`` against ``base`` (a file resolves via its parent
    directory); absolute paths pass through."""
    if os.path.isabs(path):
        return path
    anchor = os.path.dirname(base) if os.path.isfile(base) else base
    return os.path.normpath(os.path.join(anchor, path))


def _rasterize(page_region: PageRegions, mode: str, background, paint) -> Image.Image:
    """Draw every region of a page onto a fresh canvas via ``paint``."""
    height, width = page_region.image_size
    canvas = Image.new(mode, (width, height), background)
    draw = ImageDraw.Draw(canvas)
    for region in page_region.xml_regions:
        paint(draw, region)
    return canvas


def page_region_to_binary_mask(page_region: PageRegions) -> np.ndarray:
    filled = _rasterize(
        page_region, "1", 0, lambda draw, r: draw.polygon(r.polygon, outline=1, fill=1)
    )
    return np.asarray(filled)


def page_region_to_mask(page_region: PageRegions, setting: MaskSetting) -> Image.Image:
    """Color mask for one page: polygons for region/line masks, stroked
    polylines for baselines; degenerate (≤2-point) region outlines are
    skipped as in the reference (pagexml.py:258-261)."""

    def paint(draw, region):
        color = setting.mask_type.get_color(region, setting.capital_is_text)
        if setting.mask_type is MaskType.BASE_LINE:
            draw.line(region.polygon, fill=color, width=setting.line_width)
        elif setting.mask_type is MaskType.TEXT_LINE or len(region.polygon) > 2:
            draw.polygon(region.polygon, outline=color, fill=color)

    return _rasterize(page_region, "RGB", (255, 255, 255), paint)
