"""Head-to-head training A/B: this framework vs the reference TF trainer.

The parity gates (tests/test_tf_parity*.py) prove *inference on imported
weights* matches the reference at >= 99.9% argmax agreement; this tool
settles the remaining axis (VERDICT r4 missing #1): does training FROM
SCRATCH in this framework match or beat the reference's
``Trainer.train()`` on the same data?

Both arms get the IDENTICAL corpus-v4 split (same seed search, same
staged files — tools/train_quality.stage_golden_split), the identical
prepared pages (our DatasetLoader, bit-parity with the reference's
prepare per tests/test_prepare.py), the same lr / epoch cap / early-stop
patience, and the same held-out evaluation (predict -> evaluate CLI).

Arm "tpu"       — our Trainer via the train CLI, on the default JAX
                  platform (the real TPU chip under axon).
Arm "reference" — a tf.keras fcn_skip built to the reference's exact
                  channel plan (reference model.py:45-92 incl. the
                  pad/crop Lambdas) trained with the reference's exact
                  loop semantics (reference network.py:167-242,
                  trainer.py:109-159): batch-1 generator with per-epoch
                  np.random.shuffle, Adam(clipnorm=1.0), sparse
                  softmax-CE-from-logits loss, ModelCheckpoint(best on
                  val_loss) + EarlyStopping(restore_best) +
                  ReduceLROnPlateau(factor .5, patience/2, min_lr 1e-6),
                  steps_per_epoch = n_train.  TF runs on the host CPU
                  (no CUDA device here — recorded in the artifact).

Reference-semantics notes:
* the reference model declares a binary input it never consumes in
  fcn_skip (network.py:57); Keras 3 rejects disconnected inputs, so the
  TF arm takes the image input only — the math is unchanged.
* augmentation uses our augment_triple, which is pixel-exact vs the
  Keras apply_affine_transform the reference wraps
  (tests/test_augment_parity.py), with the reference's
  AugmentationSettings defaults (rotation 2.5, shifts 0.025,
  zoom 0.95-1.05; image order-3, binary/mask order-0 — reference
  trainer.py:13-56).  keras_preprocessing itself is not installed in
  this environment.

Writes bench_runs/r5_train_quality_ab.json with --record.
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from train_quality import (HERE, run_evaluate, stage_golden_split,
                           stage_held_out)


def build_reference_fcn_skip(n_classes: int, seed: int = 1234):
    """The reference's fcn_skip in tf.keras: documented channel plan
    20/30/40/40/60/60/80 with skip concats and Conv2DTranspose decoder,
    plus pad-to-32 / crop-back Lambdas so arbitrary page sizes run
    (reference model.py:10-42,45-92)."""
    import tensorflow as tf

    tf.keras.utils.set_random_seed(seed)
    L = tf.keras.layers

    def pad32(x):
        s = tf.shape(x)
        return tf.image.pad_to_bounding_box(
            x, 0, 0, s[1] + (32 - s[1] % 32) % 32, s[2] + (32 - s[2] % 32) % 32)

    def crop_like(t):
        x, ref = t
        s = tf.shape(ref)
        return tf.image.crop_to_bounding_box(x, 0, 0, s[1], s[2])

    inp = L.Input((None, None, 1))
    padded = L.Lambda(pad32, output_shape=(None, None, 1))(inp)
    conv1 = L.Conv2D(20, 5, padding="same", activation="relu")(padded)
    conv2 = L.Conv2D(30, 5, padding="same", activation=None)(conv1)
    pool2 = L.MaxPooling2D(2, 2, padding="same")(conv2)
    conv3 = L.Conv2D(40, 5, padding="same", activation="relu")(pool2)
    conv4 = L.Conv2D(40, 5, padding="same", activation=None)(conv3)
    pool4 = L.MaxPooling2D(2, 2, padding="same")(conv4)
    conv5 = L.Conv2D(60, 5, padding="same", activation="relu")(pool4)
    conv6 = L.Conv2D(60, 5, padding="same", activation=None)(conv5)
    pool6 = L.MaxPooling2D(2, 2, padding="same")(conv6)
    conv7 = L.Conv2D(80, 5, padding="same", activation="relu")(pool6)
    deconv1 = L.Conv2DTranspose(80, 5, padding="same", activation="relu")(conv7)
    deconv2 = L.Conv2DTranspose(60, 2, strides=2, padding="same",
                                activation="relu")(deconv1)
    deconv2 = L.Concatenate()([deconv2, conv6])
    deconv3 = L.Conv2DTranspose(40, 5, padding="same", activation="relu")(deconv2)
    deconv3 = L.Concatenate()([deconv3, conv5])
    deconv4 = L.Conv2DTranspose(30, 2, strides=2, padding="same",
                                activation="relu")(deconv3)
    deconv4 = L.Concatenate()([deconv4, conv3])
    deconv5 = L.Conv2DTranspose(20, 2, strides=2, padding="same",
                                activation=None)(deconv4)
    deconv5 = L.Concatenate()([deconv5, conv2])
    deconv5 = L.Lambda(crop_like, output_shape=(None, None, 50))([deconv5, inp])
    logits = L.Conv2D(n_classes, 1, name="logits")(deconv5)
    return tf.keras.Model(inp, logits, name="fcn_skip")


def reference_generator(dataset, augment: bool, shuffle: bool, seed: int = 0):
    """The reference's batch-1 input generator semantics
    (network.py:127-165): endless, per-epoch np.random.shuffle, shared
    per-sample augmentation seed across image/binary/mask, x/255
    preprocess."""
    import numpy as np

    from page_segmentation_tpu.data.augment import (augment_triple,
                                                    sample_affine_params)
    from page_segmentation_tpu.train.trainer import AugmentationSettings

    settings = AugmentationSettings()
    data = list(dataset.data)
    order_rng = np.random.RandomState(seed)
    sample_seed = seed
    while True:
        if shuffle:
            order_rng.shuffle(data)
        for d in data:
            i, m = d.image, d.mask
            if augment:
                sample_seed += 1
                rng = np.random.default_rng(sample_seed)
                params = sample_affine_params(
                    rng, i.shape,
                    rotation_range=settings.rotation_range,
                    width_shift_range=settings.width_shift_range,
                    height_shift_range=settings.height_shift_range,
                    shear_range=settings.shear_range,
                    zoom_range=tuple(settings.zoom_range),
                )
                i, _, m = augment_triple(i, None, m, params, settings)
            x = (i.astype("float32") / 255.0)[None, :, :, None]
            y = m.astype("float32")[None, :, :, None]
            yield x, y


def run_reference_arm(staged, held, args, workdir):
    """Train + evaluate the reference-shaped tf.keras arm.  Returns the
    held-out evaluate report plus timing facts."""
    import numpy as np
    import tensorflow as tf

    from page_segmentation_tpu.cli.main import main as cli
    from page_segmentation_tpu.core.image_io import imsave
    from page_segmentation_tpu.data.loader import DatasetLoader
    from page_segmentation_tpu.inference.output import scale_to_original_shape

    cmap = staged["cmap"]
    loader = DatasetLoader(args.target_line_height, cmap)
    train_data = loader.load_data_from_json([staged["dataset_json"]], "train")
    val_data = loader.load_data_from_json([staged["dataset_json"]], "test")

    model = build_reference_fcn_skip(cmap.n_classes)

    def loss(y_true, y_pred):
        return tf.reduce_mean(tf.keras.losses.sparse_categorical_crossentropy(
            y_true, y_pred, from_logits=True))

    def accuracy(y_true, y_pred):
        n = tf.shape(y_pred)[3]
        yt = tf.reshape(y_true, (-1,))
        yp = tf.reshape(y_pred, (-1, n))
        return tf.reduce_mean(tf.cast(tf.equal(
            tf.cast(yt, "int64"), tf.argmax(yp, axis=-1)), "float32"))

    model.compile(
        optimizer=tf.keras.optimizers.Adam(args.l_rate, clipnorm=1.0),
        loss=loss, metrics=[accuracy])

    weights_path = os.path.join(workdir, "reference_best.weights.h5")
    callbacks = [
        tf.keras.callbacks.ModelCheckpoint(
            weights_path, monitor="val_loss", save_best_only=True,
            save_weights_only=True, verbose=0),
        tf.keras.callbacks.EarlyStopping(
            monitor="val_loss", patience=args.patience,
            restore_best_weights=True, verbose=0),
        tf.keras.callbacks.ReduceLROnPlateau(
            monitor="val_loss", factor=0.5, patience=args.patience // 2,
            min_lr=1e-6, verbose=0),
    ]
    t0 = time.monotonic()
    history = model.fit(
        reference_generator(train_data, augment=args.augment, shuffle=True),
        epochs=args.n_epoch,
        steps_per_epoch=len(train_data),
        validation_data=reference_generator(val_data, augment=False,
                                            shuffle=False),
        validation_steps=len(val_data),
        callbacks=callbacks, verbose=0)
    train_seconds = time.monotonic() - t0
    epochs_ran = len(history.history["loss"])
    if os.path.exists(weights_path):
        model.load_weights(weights_path)

    # held-out predict with the same post-prediction handling as ours:
    # prepared page -> logits -> argmax -> scale_to_original_shape ->
    # color PNG via the shared ColorMap -> shared evaluate CLI
    pred_dir = os.path.join(workdir, "reference_pred")
    os.makedirs(pred_dir, exist_ok=True)
    pred_loader = DatasetLoader(args.target_line_height, cmap, prediction=True)
    eval_entries = pred_loader.load_data_from_json(
        [staged["dataset_json"]], "eval")
    for d in eval_entries:
        x = (d.image.astype("float32") / 255.0)[None, :, :, None]
        logits = model.predict_on_batch(x)[0]
        pred = np.argmax(logits, axis=-1)
        d2, pred = scale_to_original_shape(d, pred)
        page = os.path.splitext(os.path.basename(d.image_path))[0]
        imsave(os.path.join(pred_dir, f"{page}.png"),
               cmap.to_rgb_array(pred))
    report = run_evaluate(cli, held, pred_dir, staged["image_map"],
                          staged["test_pages"])
    return report, {
        "train_seconds": round(train_seconds, 1),
        "epochs_ran": epochs_ran,
        "loss_first": round(float(history.history["loss"][0]), 4),
        "loss_last": round(float(history.history["loss"][-1]), 4),
        "platform": "cpu (tf.keras; no CUDA device in this environment)",
        "tf_version": tf.__version__,
    }


def run_step_throughput(args):
    """Production-scale training THROUGHPUT head-to-head on identical
    normalized 300-DPI pages (424x304, the bench --mode train shape).

    The corpus-v4 quality arms are dispatch-bound at 8 tiny pages/epoch;
    this section measures what each framework sustains at the scale the
    deployment actually trains at.  Ours: the jitted fused train step on
    the TPU at batch 48 (batching is a real knob here).  Reference: the
    same fcn_skip through Keras train_on_batch at batch 1 — its
    hard-wired batch shape (reference network.py:235-241 feeds one page
    per step) — on the host CPU (no CUDA device exists here)."""
    import jax
    import jax.numpy as jnp
    import optax
    import tensorflow as tf

    from page_segmentation_tpu.models.fcn import FCNSkip
    from page_segmentation_tpu.models.registry import Architecture, Optimizers
    from page_segmentation_tpu.train.metrics import Loss
    from page_segmentation_tpu.train.steps import make_step_fns

    h, w, n_classes = 424, 304, 3
    out = {"page_hw": [h, w], "n_classes": n_classes}

    # ---- ours: batch-48 compact-transfer steps on the TPU
    module = FCNSkip(n_classes=n_classes, dtype=jnp.bfloat16)
    params = module.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 1), jnp.float32))["params"]
    optimizer = optax.inject_hyperparams(
        lambda learning_rate: Optimizers.ADAM.make(learning_rate)
    )(learning_rate=1e-4)
    opt_state = optimizer.init(params)
    train_step, _ = make_step_fns(
        module, optimizer, Loss.CATEGORICAL_CROSSENTROPY(),
        device_preprocess=Architecture.FCN_SKIP.device_preprocess(),
    )
    batch_size = 48
    rng = np.random.RandomState(0)

    def make_batch(seed):
        r = np.random.RandomState(seed)
        return {
            "image": jax.device_put(
                r.randint(0, 256, (batch_size, h, w, 1)).astype(np.uint8)),
            "mask": jax.device_put(
                r.randint(0, n_classes, (batch_size, h, w)).astype(np.uint8)),
            "binary": jax.device_put(np.ones((batch_size, h, w), np.uint8)),
            "dims": jax.device_put(np.tile(np.int32([h, w]), (batch_size, 1))),
        }

    batches = [make_batch(i) for i in range(6)]
    key = jax.random.PRNGKey(0)
    params, state, opt_state, metrics = train_step(
        params, {}, opt_state, batches[0], key)
    jax.block_until_ready(metrics["loss"])
    steps = 18
    t0 = time.monotonic()
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, state, opt_state, metrics = train_step(
            params, state, opt_state, batches[i % len(batches)], sub)
    jax.block_until_ready(metrics["loss"])
    tpu_secs = time.monotonic() - t0
    out["tpu"] = {
        "pages_per_sec": round(steps * batch_size / tpu_secs, 1),
        "batch_size": batch_size, "steps": steps,
        "seconds": round(tpu_secs, 2), "dtype": "bfloat16",
        "platform": str(jax.devices()[0].platform),
    }

    # ---- reference: batch-1 Keras train_on_batch on the CPU
    model = build_reference_fcn_skip(n_classes)

    def loss(y_true, y_pred):
        return tf.reduce_mean(tf.keras.losses.sparse_categorical_crossentropy(
            y_true, y_pred, from_logits=True))

    model.compile(optimizer=tf.keras.optimizers.Adam(1e-4, clipnorm=1.0),
                  loss=loss)
    xs = [(rng.rand(1, h, w, 1).astype("float32"),
           rng.randint(0, n_classes, (1, h, w, 1)).astype("float32"))
          for _ in range(4)]
    for x, y in xs[:2]:  # warmup/compile
        model.train_on_batch(x, y)
    ref_pages = 12
    t0 = time.monotonic()
    for i in range(ref_pages):
        x, y = xs[i % len(xs)]
        model.train_on_batch(x, y)
    ref_secs = time.monotonic() - t0
    out["reference"] = {
        "pages_per_sec": round(ref_pages / ref_secs, 2),
        "batch_size": 1, "steps": ref_pages,
        "seconds": round(ref_secs, 2), "dtype": "float32",
        "platform": "cpu (tf.keras; no CUDA device in this environment)",
    }
    out["speedup"] = round(
        out["tpu"]["pages_per_sec"] / out["reference"]["pages_per_sec"], 1)
    return out


def run_tpu_arm(staged, held, args, workdir):
    """Train + evaluate our framework through the same CLI path the
    recorded train-quality artifacts use."""
    import jax

    from page_segmentation_tpu.cli.main import main as cli

    out = os.path.join(workdir, "tpu_train_out")
    t0 = time.monotonic()
    rc = cli(["train", "--split_file", staged["dataset_json"],
              "--output", out,
              "--n_epoch", str(args.n_epoch), "--l_rate", str(args.l_rate),
              "--color_map", staged["image_map"],
              "--target_line_height", str(args.target_line_height),
              "--early_stopping_max_performance_drops", str(args.patience),
              "--seed", "0"]
             + (["--data_augmentation"] if args.augment else []))
    train_seconds = time.monotonic() - t0
    assert rc == 0
    scalars = [json.loads(line)
               for line in open(os.path.join(out, "scalars.jsonl"))]
    pred = os.path.join(workdir, "tpu_pred")
    rc = cli(["predict", "--load", os.path.join(out, "model"),
              "--output", pred, "--fast",
              "--images", os.path.join(held, "images"),
              "--binary", os.path.join(held, "binary"),
              "--norm", os.path.join(held, "norm"),
              "--color_map", staged["image_map"],
              "--target_line_height", str(args.target_line_height),
              "--high_res_output"])
    assert rc == 0
    report = run_evaluate(cli, held, os.path.join(pred, "color"),
                          staged["image_map"], staged["test_pages"])
    return report, {
        "train_seconds": round(train_seconds, 1),
        "epochs_ran": len(scalars),
        "loss_first": round(scalars[0]["loss"], 4),
        "loss_last": round(scalars[-1]["loss"], 4),
        "platform": str(jax.devices()[0].platform),
    }


def arm_summary(report, facts, n_train):
    pages = facts["epochs_ran"] * n_train
    return {
        "fgpa": round(report["fgpa"], 4),
        "accuracy": round(report["accuracy"], 4),
        "per_label": {k: {m: round(v, 4) if isinstance(v, float) else v
                          for m, v in d.items()}
                      for k, d in report.items() if k.startswith("label_")},
        "train_pages_per_sec": round(pages / facts["train_seconds"], 2),
        **facts,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-epoch", type=int, default=300)
    parser.add_argument("--l-rate", type=float, default=3e-4)
    # 30 = our recorded recipe's patience (3x the reference default —
    # strictly MORE chances for the reference arm to improve)
    parser.add_argument("--patience", type=int, default=30)
    parser.add_argument("--target-line-height", type=int, default=10)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--augment", action="store_true", default=True)
    parser.add_argument("--no-augment", dest="augment", action="store_false")
    parser.add_argument("--arms", default="tpu,reference,steps",
                        help="comma list: tpu, reference, steps "
                             "(production-scale step throughput)")
    parser.add_argument("--record", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ps_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from page_segmentation_tpu.cli.main import main as cli

    arms = args.arms.split(",")
    with tempfile.TemporaryDirectory() as tmp:
        staged = stage_golden_split(tmp, cli, args.seed)
        held = stage_held_out(tmp, staged["ds"], staged["test_pages"],
                              staged["cmap"])
        n_train = staged["n_pages"] - 3
        result = {
            "metric": "train_quality_ab",
            "unit": "fgpa",
            "split_seed": staged["split_seed"],
            "test_pages": staged["test_pages"],
            "train_pages": n_train,
            "n_epoch": args.n_epoch,
            "l_rate": args.l_rate,
            "patience": args.patience,
            "augmented": bool(args.augment),
            "mode": "identical corpus-v4 split/seed/prepared-pages/budget; "
                    "arm 'reference' = reference-exact tf.keras fcn_skip + "
                    "loop semantics (batch-1, Adam clipnorm 1.0, "
                    "best-on-val checkpoint, early stop, LR plateau); "
                    "arm 'tpu' = our Trainer via the train CLI; both "
                    "evaluated by the same evaluate CLI on the 2 untouched "
                    "eval pages",
        }
        if "tpu" in arms:
            report, facts = run_tpu_arm(staged, held, args, tmp)
            result["tpu"] = arm_summary(report, facts, n_train)
            print(json.dumps({"arm": "tpu", **result["tpu"]}),
                  file=sys.stderr)
        if "reference" in arms:
            report, facts = run_reference_arm(staged, held, args, tmp)
            result["reference"] = arm_summary(report, facts, n_train)
            print(json.dumps({"arm": "reference", **result["reference"]}),
                  file=sys.stderr)
        if "tpu" in result and "reference" in result:
            result["value"] = result["tpu"]["fgpa"]
            result["vs_reference_fgpa"] = round(
                result["tpu"]["fgpa"] - result["reference"]["fgpa"], 4)
            result["speedup_train_pages_per_sec"] = round(
                result["tpu"]["train_pages_per_sec"]
                / result["reference"]["train_pages_per_sec"], 2)
        if "steps" in arms:
            result["step_throughput"] = run_step_throughput(args)
            print(json.dumps({"arm": "steps",
                              **result["step_throughput"]}), file=sys.stderr)

    print(json.dumps(result))
    if args.record and not ("tpu" in result and "reference" in result):
        print("--record ignored: the quality arms did not both run "
              "(a partial record would overwrite the full artifact)",
              file=sys.stderr)
        args.record = False
    if args.record:
        path = os.path.join(HERE, "..", "bench_runs",
                            "r5_train_quality_ab.json")
        with open(path, "w") as f:
            json.dump(result, f)
            f.write("\n")
        print(f"recorded {os.path.normpath(path)}", file=sys.stderr)


if __name__ == "__main__":
    main()
