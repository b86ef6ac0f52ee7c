"""CLI end-to-end tests: the full dataset-creation -> train -> predict ->
segment -> evaluate loop through the command surface (reference
examples/dataset-creation-example.sh + model-training-example.sh flows)."""
import json
import os

import numpy as np
import pytest

from page_segmentation_tpu.cli.main import main
from page_segmentation_tpu.core.colors import ColorMap
from page_segmentation_tpu.core.image_io import imsave


@pytest.fixture
def dataset_dir(tmp_path):
    """A dataset directory in the reference layout (binary_images/images/
    masks/normalizations) with synthetic pages."""
    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})
    root = tmp_path / "ds"
    for sub in ("binary_images", "images", "masks", "normalizations"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        mask = np.zeros((64, 48), np.uint8)
        mask[16:48, 8:40] = 1
        image = np.where(mask == 1, 40, 230).astype(np.uint8)  # dark text, light bg
        image = np.clip(image + rng.randint(-8, 8, image.shape), 0, 255).astype(np.uint8)
        binary = np.where(mask == 1, 0, 255).astype(np.uint8)
        imsave(root / "images" / f"p{i}.png", image)
        imsave(root / "binary_images" / f"p{i}.png", binary)
        imsave(root / "masks" / f"p{i}.png", cmap.to_rgb_array(mask))
        with open(root / "normalizations" / f"p{i}.json", "w") as f:
            json.dump({"char_height": 8}, f)
    cmap.save(root / "image_map.json")
    return root


def test_create_dataset_file(dataset_dir, tmp_path):
    out = tmp_path / "dataset.json"
    rc = main([
        "create-dataset-file",
        "--dataset_path", str(dataset_dir),
        "--output_file", str(out),
        "--n_train", "2", "--n_test", "1", "--n_eval", "1",
    ])
    assert rc == 0
    content = json.loads(out.read_text())
    assert len(content["train"]) == 2
    assert len(content["test"]) == 1
    assert content["train"][0]["line_height_px"] == 8


def test_full_cli_loop(dataset_dir, tmp_path):
    """create-dataset-file -> train -> predict -> evaluate."""
    dataset_json = tmp_path / "dataset.json"
    main([
        "create-dataset-file",
        "--dataset_path", str(dataset_dir),
        "--output_file", str(dataset_json),
        "--n_train", "3", "--n_test", "1", "--n_eval", "0",
    ])

    model_dir = tmp_path / "model_out"
    rc = main([
        "train",
        "--train", str(dataset_json),
        "--test", str(dataset_json),
        "--output", str(model_dir),
        "--n_iter", "24",  # 8 epochs x 3 pages
        "--l_rate", "0.002",
        "--color_map", str(dataset_dir / "image_map.json"),
        "--target_line_height", "8",
        "--monitor", "val_loss",
        "--seed", "0",
    ])
    assert rc == 0
    assert (model_dir / "model" / "params.msgpack").exists()

    pred_dir = tmp_path / "pred"
    rc = main([
        "predict",
        "--load", str(model_dir / "model"),
        "--output", str(pred_dir),
        "--images", str(dataset_dir / "images"),
        "--binary", str(dataset_dir / "binary_images"),
        "--norm", str(dataset_dir / "normalizations"),
        "--color_map", str(dataset_dir / "image_map.json"),
        "--target_line_height", "8",
    ])
    assert rc == 0
    for cat in ("color", "overlay", "inverted"):
        assert len(os.listdir(pred_dir / cat)) == 4

    # the prediction color masks should recover the text block
    cmap = ColorMap.load(dataset_dir / "image_map.json")
    pred = cmap.imread_labels(pred_dir / "color" / "p0.png")
    assert pred.shape == (64, 48)
    assert (pred[20:44, 12:36] == 1).mean() > 0.9


def test_compute_normalizations(dataset_dir, tmp_path):
    out_dir = tmp_path / "norms"
    # synthetic letters are small; relax by synthesizing letter-sized blobs
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    img = np.full((200, 200), 255, np.uint8)
    for row in range(10, 180, 40):
        for col in range(10, 180, 25):
            img[row : row + 20, col : col + 12] = 0
    imsave(imgs / "a.png", img)
    rc = main([
        "compute-image-normalizations",
        "--input_dir", str(imgs),
        "--output_dir", str(out_dir),
    ])
    assert rc == 0
    data = json.loads((out_dir / "a.json").read_text())
    assert data["char_height"] == 20

    # the reference-documented `ocrd_compute_normalizations` alias
    # (reference README.md:115) routes to the same command
    from page_segmentation_tpu.cli.main import main_compute_normalizations

    out2 = tmp_path / "norms2"
    rc = main_compute_normalizations(
        ["--input_dir", str(imgs), "--output_dir", str(out2)])
    assert rc == 0
    assert json.loads((out2 / "a.json").read_text()) == data


def test_gen_masks_cli(tmp_path):
    xml = tmp_path / "page.xml"
    xml.write_text(
        """<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2017-07-15">
  <Page imageFilename="page.png" imageHeight="50" imageWidth="40">
    <TextRegion id="r1" type="paragraph">
      <Coords points="5,5 35,5 35,30 5,30"/>
    </TextRegion>
  </Page>
</PcGts>"""
    )
    out_dir = tmp_path / "masks"
    rc = main([
        "gen-masks",
        "--input", str(xml),
        "--output_dir", str(out_dir),
        "--setting", "all_types",
    ])
    assert rc == 0
    assert (out_dir / "page.mask.png").exists()
    assert (out_dir / "image_map.json").exists()
    cmap = ColorMap.load(out_dir / "image_map.json")
    mask = cmap.imread_labels(out_dir / "page.mask.png")
    assert mask[15, 20] == cmap.index_for_label("paragraph")


def test_page_segmentation_cli(tmp_path):
    cmap = ColorMap(
        {
            "(255, 255, 255)": (0, "background"),
            "(0, 0, 255)": (1, "text"),
            "(0, 255, 0)": (2, "image"),
        }
    )
    cmap.save(tmp_path / "map.json")
    pred = np.zeros((200, 160), np.int32)
    pred[20:90, 20:140] = 1
    pred[120:180, 30:130] = 2
    imsave(tmp_path / "page.png", cmap.to_rgb_array(pred))
    rc = main([
        "page-segmentation",
        "--prediction", str(tmp_path / "page.png"),
        "--output_dir", str(tmp_path / "segout"),
        "--char_height", "10",
        "--resize_height", "100",
        "--color_map", str(tmp_path / "map.json"),
    ])
    assert rc == 0
    assert (tmp_path / "segout" / "page.png").exists()


def test_evaluate_cli(tmp_path, capsys):
    cmap = ColorMap({"(255, 255, 255)": (0, "background"), "(255, 0, 0)": (1, "text")})
    cmap.save(tmp_path / "map.json")
    (tmp_path / "masks").mkdir()
    (tmp_path / "preds").mkdir()
    mask = np.zeros((20, 20), np.int32)
    mask[5:15, 5:15] = 1
    pred = mask.copy()
    pred[5, 5] = 0
    imsave(tmp_path / "masks" / "a.png", cmap.to_rgb_array(mask))
    imsave(tmp_path / "preds" / "a.png", cmap.to_rgb_array(pred))
    rc = main([
        "evaluate",
        "--masks", str(tmp_path / "masks"),
        "--predictions", str(tmp_path / "preds"),
        "--color_map", str(tmp_path / "map.json"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["accuracy"] == 399 / 400
    assert report["label_1"]["recall"] > 0.98


def test_split_file_reference_format(dataset_dir, tmp_path):
    """--split_file in the reference's format: train/test/eval arrays hold
    dataset-file PATHS (reference README.md:91-108), optionally labeled."""
    dataset_json = tmp_path / "dataset.json"
    main([
        "create-dataset-file",
        "--dataset_path", str(dataset_dir),
        "--output_file", str(dataset_json),
        "--n_train", "3", "--n_test", "1", "--n_eval", "0",
    ])
    split_file = tmp_path / "split.json"
    split_file.write_text(json.dumps({
        "label": "round-trip split",
        "train": [str(dataset_json)],
        "test": [str(dataset_json)],
        "eval": [],
    }))
    out = tmp_path / "model_out"
    rc = main([
        "train", "--split_file", str(split_file),
        "--output", str(out), "--n_epoch", "1",
        "--color_map", str(dataset_dir / "image_map.json"),
        "--target_line_height", "8",
    ])
    assert rc == 0
    assert (out / "model" / "params.msgpack").exists()


def test_dash_case_flag_aliases(tmp_path):
    """Reference walkthroughs use --dash-case flags (dataset-creation-
    example.sh); both spellings must work."""
    xml = tmp_path / "p.xml"
    xml.write_text("""<?xml version="1.0"?>
<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15">
  <Page imageFilename="p.png" imageHeight="40" imageWidth="30">
    <TextRegion id="r" type="paragraph"><Coords points="5,5 25,5 25,35 5,35"/></TextRegion>
  </Page>
</PcGts>""")
    rc = main([
        "gen-masks",
        "--input-dir", str(tmp_path),
        "--output-dir", str(tmp_path / "masks"),
        "--image-map_dir", str(tmp_path / "maps"),
        "--threads", "2",
        "--setting", "text_nontext",
    ])
    assert rc == 0
    assert (tmp_path / "masks" / "p.mask.png").exists()
    assert (tmp_path / "maps" / "image_map.json").exists()


def test_bare_invocation_is_predict(dataset_dir, tmp_path):
    """The base command without a subcommand aliases predict (README.md:30)."""
    out = tmp_path / "model_out"
    # train a tiny model first via the documented path
    dataset_json = tmp_path / "dataset.json"
    main(["create-dataset-file", "--dataset_path", str(dataset_dir),
          "--output_file", str(dataset_json), "--n_train", "-1"])
    main(["train", "--train", str(dataset_json), "--output", str(out),
          "--n_epoch", "1", "--color_map", str(dataset_dir / "image_map.json"),
          "--target_line_height", "8"])
    pred_out = tmp_path / "pred"
    rc = main([
        "--load", str(out / "model"), "--output", str(pred_out),
        "--images", str(dataset_dir / "images"),
        "--binary", str(dataset_dir / "binary_images"),
        "--char_height", "8",
        "--color_map", str(dataset_dir / "image_map.json"),
    ])
    assert rc == 0
    assert (pred_out / "color").is_dir()


def test_cli_friendly_errors(capsys):
    """User-input mistakes exit 2 with a one-line message, not a
    traceback (PS_TPU_TRACEBACK=1 re-raises for debugging)."""
    rc = main(["predict", "--load", "/nope/model", "--output", "/tmp/o",
               "--images", "/nope/imgs"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "error: no such file or directory: /nope/imgs" in err
    assert "Traceback" not in err

    rc = main(["gen-masks", "--input_dir", "/nope", "--output_dir", "/tmp/o2"])
    assert rc == 2
    assert "error:" in capsys.readouterr().err


def test_predict_auto_norm(dataset_dir, tmp_path):
    """predict --auto_norm estimates char_height per page (the
    compute-image-normalizations backend) when no --norm/--char_height is
    given; without it the same invocation errors with guidance."""
    dataset_json = tmp_path / "dataset.json"
    main(["create-dataset-file", "--dataset_path", str(dataset_dir),
          "--output_file", str(dataset_json),
          "--n_train", "4", "--n_test", "0", "--n_eval", "0"])
    model_dir = tmp_path / "model_out"
    rc = main(["train", "--train", str(dataset_json), "--output", str(model_dir),
               "--n_iter", "4", "--color_map", str(dataset_dir / "image_map.json")])
    assert rc == 0

    base = ["predict", "--load", str(model_dir / "model"),
            "--images", str(dataset_dir / "images"),
            "--binary", str(dataset_dir / "binary_images"),
            "--color_map", str(dataset_dir / "image_map.json")]
    with pytest.raises(SystemExit, match="auto_norm"):
        main(base + ["--output", str(tmp_path / "out_err")])
    rc = main(base + ["--output", str(tmp_path / "out_auto"), "--auto_norm"])
    assert rc == 0
    assert len(os.listdir(tmp_path / "out_auto" / "color")) == 4
