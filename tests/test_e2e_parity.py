"""End-to-end parity gate (BASELINE.md north star): identical inputs +
identical weights -> >=99.9% per-pixel class agreement between a
reference-equivalent TF pipeline and this framework's full predict path
(DatasetLoader -> PixelClassifier(.h5) -> Prediction -> output masks).
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.core.image_io import imsave
from page_segmentation_tpu.data.dataset import SingleData
from page_segmentation_tpu.data.loader import DatasetLoader
from page_segmentation_tpu.inference.predictor import Predictor, PredictSettings
from tests.test_tf_parity import _keras_fcn_skip


@pytest.fixture(scope="module")
def cmap():
    return ColorMap(
        {"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text"), "(0, 255, 0)": (2, "image")}
    )


def _synthetic_page(h=400, w=300, seed=0):
    rng = np.random.RandomState(seed)
    image = np.full((h, w), 235, np.uint8)
    for row in range(40, h - 60, 30):
        for col in range(30, w - 40, 14):
            if rng.rand() < 0.8:
                image[row : row + 18, col : col + 10] = rng.randint(10, 60)
    image[int(h * 0.75) : int(h * 0.9), 60:240] = 120
    binary = np.where(image < 128, 0, 255).astype(np.uint8)
    return image, binary


def test_full_pipeline_agreement(tmp_path, cmap):
    # shared trained-like weights
    keras_model = _keras_fcn_skip(3, input_shape=(None, None, 1))
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path)

    image, binary = _synthetic_page()
    imsave(tmp_path / "page.png", image)
    imsave(tmp_path / "page_bin.png", binary)

    # ---- this framework: disk -> loader -> predictor(.h5)
    loader = DatasetLoader(target_line_height=6, color_map=cmap, prediction=True)
    dataset = loader.load_data(
        [
            SingleData(
                image_path=str(tmp_path / "page.png"),
                binary_path=str(tmp_path / "page_bin.png"),
                line_height_px=18,
            )
        ]
    )
    predictor = Predictor(
        PredictSettings(network=h5_path, output=str(tmp_path / "out"), color_map=cmap, n_classes=3)
    )
    prediction = next(predictor.predict(dataset))
    ours = prediction.labels

    # ---- reference-equivalent flow: same prepared inputs through tf.keras
    # with the reference's dynamic pad-to-32 emulated around the graph
    data = dataset.data[0]
    x = (data.image.astype(np.float32) / 255.0)[None, ..., None]
    h, w = data.image.shape
    ph = (32 - h % 32) % 32
    pw = (32 - w % 32) % 32
    padded = np.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    tf_logits = keras_model(padded).numpy()[0, :h, :w]
    theirs = tf_logits.argmax(-1)

    agreement = (ours == theirs).mean()
    assert agreement >= 0.999, f"per-pixel agreement {agreement:.5f}"

    # output trio written and decodable back to the same labels
    predictor.save_prediction(prediction)
    color = cmap.imread_labels(tmp_path / "out" / "color" / "page.png")
    np.testing.assert_array_equal(color, ours)


def test_fast_path_agreement(tmp_path, cmap):
    """The fused batched device path agrees with the TF oracle too."""
    keras_model = _keras_fcn_skip(3, input_shape=(None, None, 1))
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path)

    image, binary = _synthetic_page(seed=1)
    loader = DatasetLoader(target_line_height=6, color_map=cmap, prediction=True)
    dataset = loader.load_data([SingleData(image=image, binary=binary, line_height_px=18)])

    predictor = Predictor(
        PredictSettings(network=h5_path, color_map=cmap, n_classes=3)
    )
    (data, pred, color, overlay, inverted) = next(
        predictor.predict_dataset_fast(dataset, batch_size=1)
    )

    x = (data.image.astype(np.float32) / 255.0)[None, ..., None]
    h, w = data.image.shape
    padded = np.pad(x, ((0, 0), (0, (8 - h % 8) % 8), (0, (8 - w % 8) % 8), (0, 0)))
    theirs = keras_model(padded).numpy()[0, :h, :w].argmax(-1)
    agreement = (pred == theirs).mean()
    assert agreement >= 0.999, f"fast-path agreement {agreement:.5f}"
