"""Spatial partitioning: sharded band forward must equal single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from page_segmentation_tpu.models.fcn import FCNSkip
from page_segmentation_tpu.parallel.mesh import make_mesh
from page_segmentation_tpu.parallel.spatial import spatial_forward, spatial_predict


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    module = FCNSkip(n_classes=3)
    rng = jax.random.PRNGKey(0)
    variables = dict(module.init(rng, jnp.zeros((1, 32, 32, 1), jnp.float32)))
    mesh = make_mesh(4)
    return module, variables, mesh


def test_spatial_forward_exact(setup):
    module, variables, mesh = setup
    rng = np.random.RandomState(0)
    image = rng.rand(1024, 64, 1).astype(np.float32)

    single = np.asarray(module.apply(variables, jnp.asarray(image[None])))[0]
    sharded = spatial_forward(module, variables, image, mesh, margin=96)

    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=2e-4)
    agreement = (sharded.argmax(-1) == single.argmax(-1)).mean()
    assert agreement == 1.0


def test_spatial_forward_unaligned_height(setup):
    module, variables, mesh = setup
    rng = np.random.RandomState(1)
    image = rng.rand(1000, 48, 1).astype(np.float32)  # not divisible by 4*8

    # single-device oracle on the same zero-padded canvas the split sees
    padded = np.zeros((1024, 48, 1), np.float32)
    padded[:1000] = image
    single = np.asarray(module.apply(variables, jnp.asarray(padded[None])))[0][:1000]
    sharded = spatial_forward(module, variables, image, mesh, margin=96)
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_spatial_margin_too_large(setup):
    module, variables, mesh = setup
    image = np.zeros((256, 32, 1), np.float32)  # 64-row bands < 2x96 margin
    with pytest.raises(ValueError, match="halo margin"):
        spatial_forward(module, variables, image, mesh, margin=96)


def test_spatial_predict_entrypoint(setup):
    module, variables, mesh = setup
    from page_segmentation_tpu.inference.classifier import PixelClassifier

    net = PixelClassifier(n_classes=3)
    rng = np.random.RandomState(2)
    image = (rng.rand(1024, 64) * 255).astype(np.uint8)
    pred = spatial_predict(net, image, mesh)
    assert pred.shape == (1024, 64)

    from page_segmentation_tpu.data.dataset import SingleData

    _, _, single_pred = net.predict_single_data(SingleData(image=image))
    agreement = (pred == single_pred).mean()
    assert agreement == 1.0


ALL_ARCHS = ["fcn_skip", "fcn", "unet", "res_unet"]


@pytest.mark.parametrize("name", ALL_ARCHS)
def test_margin_table_covers_measured_rf(name):
    """DEFAULT_MARGINS must dominate the empirically measured half
    receptive field (single-row perturbation) for every architecture."""
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import DEFAULT_MARGINS, measure_half_rf

    arch = Architecture(name)
    half = measure_half_rf(arch.model(3))
    margin = DEFAULT_MARGINS[name]
    assert margin >= half, f"{name}: margin {margin} < measured half-RF {half}"
    assert margin % arch.stride_factor == 0


@pytest.mark.parametrize("name", ALL_ARCHS)
def test_spatial_forward_exact_all_archs(name):
    """Band-split forward equals the unsplit forward for every grayscale
    architecture at its derived margin."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import DEFAULT_MARGINS

    arch = Architecture(name)
    module = arch.model(3)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))))
    mesh = make_mesh(2)
    rng = np.random.RandomState(3)
    image = rng.rand(768, 64, 1).astype(np.float32)

    single = np.asarray(module.apply(variables, jnp.asarray(image[None])))[0]
    sharded = spatial_forward(
        module, variables, image, mesh,
        margin=DEFAULT_MARGINS[name], stride_factor=arch.stride_factor,
    )
    np.testing.assert_allclose(sharded, single, atol=5e-4)
    assert (sharded.argmax(-1) == single.argmax(-1)).mean() == 1.0


def test_spatial_forward_batch_2d_mesh():
    """Pages x bands 2-D mesh: batch over 'data', rows over 'space' — must
    equal the unsplit forward exactly."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from page_segmentation_tpu.parallel.spatial import spatial_forward_batch

    module = FCNSkip(n_classes=3)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))))
    mesh = make_mesh(4, shape=(2, 2), axis_names=("data", "space"))
    rng = np.random.RandomState(5)
    pages = rng.rand(3, 512, 40, 1).astype(np.float32)  # ragged batch of 3

    single = np.asarray(module.apply(variables, jnp.asarray(pages)))
    sharded = spatial_forward_batch(module, variables, pages, mesh, margin=96)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=2e-4)
    assert (sharded.argmax(-1) == single.argmax(-1)).mean() == 1.0


def test_spatial_forward_single_device_exact():
    """n_devices == 1: no halo ring to wrap — must equal the plain forward
    (the ppermute ring previously fed the band its own rows as halos)."""
    module = FCNSkip(n_classes=3)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))))
    mesh = make_mesh(1)
    rng = np.random.RandomState(9)
    image = rng.rand(256, 32, 1).astype(np.float32)
    single = np.asarray(module.apply(variables, jnp.asarray(image[None])))[0]
    sharded = spatial_forward(module, variables, image, mesh, margin=96)
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_spatial_forward_batch_space_axis_one():
    """(data=2, space=1) mesh: pure data parallelism, exact."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from page_segmentation_tpu.parallel.spatial import spatial_forward_batch

    module = FCNSkip(n_classes=3)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))))
    mesh = make_mesh(2, shape=(2, 1), axis_names=("data", "space"))
    rng = np.random.RandomState(10)
    pages = rng.rand(2, 256, 32, 1).astype(np.float32)
    single = np.asarray(module.apply(variables, jnp.asarray(pages)))
    sharded = spatial_forward_batch(module, variables, pages, mesh, margin=96)
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_spatial_predict_cli_auto_dispatch(tmp_path):
    """predict --n_devices 4: a page above --spatial_threshold routes
    through the spatial mesh and the output PNGs equal the single-device
    run byte for byte (VERDICT: user-reachable spatial partitioning)."""
    import json as _json
    import os

    from page_segmentation_tpu.cli.main import main
    from page_segmentation_tpu.core.colors import ColorMap
    from page_segmentation_tpu.core.image_io import imsave
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.train.checkpoint import save_checkpoint

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")

    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})
    root = tmp_path / "ds"
    for sub in ("images", "binary_images", "normalizations"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(3)
    # tall page: 768 rows so 4 bands of 192 >= 2 x margin(80); char_height
    # == target_line_height keeps the prepared image at full size
    image = rng.randint(0, 256, (768, 96)).astype(np.uint8)
    imsave(root / "images" / "big.png", image)
    imsave(root / "binary_images" / "big.png",
           np.where(image < 128, 0, 255).astype(np.uint8))
    with open(root / "normalizations" / "big.json", "w") as f:
        _json.dump({"char_height": 8}, f)
    cmap.save(root / "image_map.json")

    net = PixelClassifier(n_classes=2, seed=4)
    ckpt = tmp_path / "model"
    save_checkpoint(str(ckpt), net.variables,
                    meta={"architecture": "fcn_skip", "n_classes": 2})

    def run(out, extra):
        rc = main([
            "predict",
            "--load", str(ckpt),
            "--output", str(out),
            "--images", str(root / "images"),
            "--binary", str(root / "binary_images"),
            "--norm", str(root / "normalizations"),
            "--color_map", str(root / "image_map.json"),
            "--target_line_height", "8",
        ] + extra)
        assert rc == 0

    run(tmp_path / "single", [])
    run(tmp_path / "mesh", ["--n_devices", "4", "--spatial_threshold", "10000"])

    for cat in ("color", "overlay", "inverted"):
        a = (tmp_path / "single" / cat / "big.png").read_bytes()
        b = (tmp_path / "mesh" / cat / "big.png").read_bytes()
        assert a == b, f"{cat} differs between single-device and spatial mesh"


@pytest.mark.parametrize("name", ["mobile_net", "image_res_net"])
def test_margin_table_covers_bn_families(name):
    """The BN encoder families' margins also dominate their measured
    half-RF (RGB perturbation probe).  EffNet is deliberately absent:
    its squeeze-excitation blocks global-pool over the page."""
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import DEFAULT_MARGINS, measure_half_rf

    arch = Architecture(name)
    half = measure_half_rf(arch.model(3), channels=3)
    margin = DEFAULT_MARGINS[name]
    assert margin >= half, f"{name}: margin {margin} < measured half-RF {half}"
    assert margin % arch.stride_factor == 0


def test_effnet_not_band_splittable():
    """EffNet must stay out of the margin table: a single-row poke moves
    logits far beyond any local window (global SE pooling)."""
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import DEFAULT_MARGINS

    for name in ("effb0", "effb3", "effb7"):
        assert name not in DEFAULT_MARGINS


def test_spatial_forward_exact_mobilenet():
    """Band-split forward equals the unsplit forward for the MobileNetV2
    encoder family (BN inference uses the frozen moving stats, so banding
    stays exact given margin >= half-RF)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import DEFAULT_MARGINS

    arch = Architecture.MOBILE_NET
    module = arch.model(3)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    mesh = make_mesh(2)
    rng = np.random.RandomState(3)
    image = rng.rand(384, 64, 3).astype(np.float32)

    single = np.asarray(module.apply(variables, jnp.asarray(image[None])))[0]
    sharded = spatial_forward(
        module, variables, image, mesh,
        margin=DEFAULT_MARGINS[arch.value], stride_factor=arch.stride_factor,
    )
    np.testing.assert_allclose(sharded, single, atol=5e-4)
    assert (sharded.argmax(-1) == single.argmax(-1)).mean() == 1.0


def test_spatial_forward_exact_resnet():
    """Same exactness gate for the ResNet50 fine-tuning family (its
    truncated encoder measures half-RF 153 -> margin 192)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import DEFAULT_MARGINS

    arch = Architecture.RES_NET
    module = arch.model(3)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    mesh = make_mesh(2)
    rng = np.random.RandomState(3)
    image = rng.rand(768, 64, 3).astype(np.float32)  # 384-row bands >= 2x192

    single = np.asarray(module.apply(variables, jnp.asarray(image[None])))[0]
    sharded = spatial_forward(
        module, variables, image, mesh,
        margin=DEFAULT_MARGINS[arch.value], stride_factor=arch.stride_factor,
    )
    np.testing.assert_allclose(sharded, single, atol=5e-4)
    assert (sharded.argmax(-1) == single.argmax(-1)).mean() == 1.0


def test_banded_forward_exact():
    """Sequential single-chip banding equals the unsplit forward for every
    margin-table architecture (fixed window shape -> one compile)."""
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import DEFAULT_MARGINS, banded_forward

    for name, chans in (("fcn_skip", 1), ("mobile_net", 3)):
        arch = Architecture(name)
        module = arch.model(3)
        variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, chans))))
        rng = np.random.RandomState(3)
        # stride-aligned height (the classifier pads to stride outside the
        # graph) that is NOT band-aligned: 704 / 192 leaves a ragged band
        image = rng.rand(704, 64, chans).astype(np.float32)
        single = np.asarray(module.apply(variables, jnp.asarray(image[None])))[0]
        banded = banded_forward(
            module, variables, image,
            band_rows=192, margin=DEFAULT_MARGINS[name],
            stride_factor=arch.stride_factor,
        )
        assert banded.shape == single.shape
        np.testing.assert_allclose(banded, single, atol=5e-4, err_msg=name)
        assert (banded.argmax(-1) == single.argmax(-1)).mean() == 1.0, name


def test_banded_forward_small_page_short_circuits():
    """A page that fits one window skips banding entirely."""
    from page_segmentation_tpu.models.registry import Architecture
    from page_segmentation_tpu.parallel.spatial import banded_forward

    arch = Architecture.FCN_SKIP
    module = arch.model(3)
    variables = dict(module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))))
    image = np.random.RandomState(0).rand(96, 48, 1).astype(np.float32)
    single = np.asarray(module.apply(variables, jnp.asarray(image[None])))[0]
    banded = banded_forward(module, variables, image, band_rows=512, margin=80)
    np.testing.assert_allclose(banded, single, atol=1e-5)


def test_predictor_band_rows_path():
    """Predictor(band_rows=...) routes tall pages through banding and the
    prediction equals the plain path; short pages keep the plain path."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.data.dataset import SingleData
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings

    network = PixelClassifier(n_classes=3, seed=0)
    plain = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3), network=network)
    banded = Predictor(
        PredictSettings(color_map=DEFAULT_IMAGE_MAP, n_classes=3, band_rows=192),
        network=network)
    rng = np.random.RandomState(0)
    tall = SingleData(image=(rng.rand(712, 64) * 255).astype(np.uint8),
                      binary=np.ones((712, 64), np.uint8))
    assert banded._use_banded(tall) and not plain._use_banded(tall)
    np.testing.assert_array_equal(
        banded.predict_single(tall).labels, plain.predict_single(tall).labels)
    short = SingleData(image=(rng.rand(96, 64) * 255).astype(np.uint8),
                       binary=np.ones((96, 64), np.uint8))
    assert not banded._use_banded(short)
