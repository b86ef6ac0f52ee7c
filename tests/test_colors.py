import numpy as np
import pytest

from page_segmentation_tpu.core.colors import ColorMap, DEFAULT_IMAGE_MAP


@pytest.fixture
def cmap():
    return ColorMap(
        {
            "(255, 255, 255)": (0, "background"),
            "(255, 0, 0)": (1, "text"),
            (0, 255, 0): (2, "image"),
        }
    )


def test_parse_and_queries(cmap):
    assert cmap.color_for_label("text") == (255, 0, 0)
    assert cmap.index_for_label("image") == 2
    assert cmap.label_for_index(0) == "background"
    assert cmap.n_classes == 3
    assert (255, 0, 0) in cmap


def test_to_rgb_and_back(cmap):
    labels = np.array([[0, 1], [2, 1]])
    rgb = cmap.to_rgb_array(labels)
    assert rgb.dtype == np.uint8
    assert rgb.shape == (2, 2, 3)
    assert tuple(rgb[0, 1]) == (255, 0, 0)
    back = cmap.to_labels(rgb)
    np.testing.assert_array_equal(back, labels)


def test_unknown_color_maps_to_zero(cmap):
    rgb = np.full((2, 2, 3), 7, np.uint8)
    np.testing.assert_array_equal(cmap.to_labels(rgb), 0)


def test_filter_label(cmap):
    rgb = cmap.to_rgb_array(np.array([[1, 0], [1, 2]]))
    mask = cmap.filter_label(rgb, "text")
    np.testing.assert_array_equal(mask, [[1, 0], [1, 0]])
    assert mask.dtype == np.uint8


def test_json_roundtrip(tmp_path, cmap):
    path = tmp_path / "map.json"
    cmap.save(path)
    loaded = ColorMap.load(path)
    assert loaded == cmap


def test_palette(cmap):
    pal = cmap.palette
    assert pal.shape == (3, 3)
    assert tuple(pal[2]) == (0, 255, 0)


def test_imread_labels(tmp_path, cmap):
    from page_segmentation_tpu.core.image_io import imsave

    labels = np.array([[0, 1, 2]] * 4)
    imsave(tmp_path / "m.png", cmap.to_rgb_array(labels))
    out = cmap.imread_labels(tmp_path / "m.png")
    np.testing.assert_array_equal(out, labels)


def test_default_map():
    assert DEFAULT_IMAGE_MAP.color_for_label("text") == (255, 0, 0)


def test_imsave_indexed_decodes_identically(tmp_path, cmap):
    # the indexed color-mask writer must decode to the exact RGB the
    # palette gather produces, through both our decoder and raw PIL
    from PIL import Image

    from page_segmentation_tpu.core.image_io import imread_rgb, imsave, imsave_indexed

    rng = np.random.RandomState(7)
    labels = rng.randint(0, 3, (40, 30)).astype(np.uint8)
    imsave_indexed(tmp_path / "idx.png", labels, cmap.palette)
    imsave(tmp_path / "rgb.png", cmap.to_rgb_array(labels))
    np.testing.assert_array_equal(
        imread_rgb(tmp_path / "idx.png"), imread_rgb(tmp_path / "rgb.png")
    )
    np.testing.assert_array_equal(
        np.asarray(Image.open(tmp_path / "idx.png").convert("RGB")),
        cmap.to_rgb_array(labels),
    )
    # labels round-trip through the ColorMap reader too
    np.testing.assert_array_equal(cmap.imread_labels(tmp_path / "idx.png"), labels)
    # non-PNG extensions fall back to an RGB encode
    imsave_indexed(tmp_path / "idx.bmp", labels, cmap.palette)
    np.testing.assert_array_equal(
        imread_rgb(tmp_path / "idx.bmp"), cmap.to_rgb_array(labels)
    )
