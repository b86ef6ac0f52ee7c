"""Raw-corpus streaming predictor (inference/corpus.py) + `predict
--pipeline` CLI: grouping, decimation choice, equality with a direct
ThroughputPredictor run, and the CLI loop end to end."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from page_segmentation_tpu.core.image_io import imread, imsave
from page_segmentation_tpu.inference.corpus import (
    RawCorpusPredictor,
    RawPage,
    pick_host_decimate,
)


def _page(h, w, seed):
    rng = np.random.RandomState(seed)
    img = np.full((h, w), 235, np.uint8)
    for row in range(h // 8, h - 16, 24):
        for col in range(w // 10, w - 12, 14):
            if rng.rand() < 0.8:
                img[row : row + 12, col : col + 8] = rng.randint(10, 60)
    return img


def _write_corpus(root, shapes, line_height=24):
    """shapes: list of (h, w, count); returns RawPage list."""
    img_dir = os.path.join(root, "images")
    bin_dir = os.path.join(root, "binary")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(bin_dir, exist_ok=True)
    pages = []
    i = 0
    for h, w, count in shapes:
        for _ in range(count):
            img = _page(h, w, i)
            name = f"p{i:03d}.png"
            imsave(os.path.join(img_dir, name), img)
            imsave(os.path.join(bin_dir, name), ((img >= 128) * 255).astype(np.uint8))
            pages.append(
                RawPage(os.path.join(img_dir, name), os.path.join(bin_dir, name),
                        line_height)
            )
            i += 1
    return pages, img_dir, bin_dir


def test_pick_host_decimate():
    assert pick_host_decimate(6 / 50) == 8  # 1/scale = 8.33 -> 8
    assert pick_host_decimate(0.5) == 2
    assert pick_host_decimate(1.0) == 1
    assert pick_host_decimate(2.0) == 1  # upscaling: no decimation
    assert pick_host_decimate(0.01) == 8  # capped
    with pytest.raises(ValueError):
        pick_host_decimate(0.0)


def _classifier():
    import jax.numpy as jnp

    from page_segmentation_tpu.inference.classifier import PixelClassifier

    return PixelClassifier(n_classes=3, seed=0, compute_dtype=jnp.float32)


def test_groups_by_shape_and_line_height(tmp_path):
    pages, _, _ = _write_corpus(str(tmp_path), [(96, 80, 3), (120, 88, 2)])
    pages[-1].line_height_px = 32  # same shape, different norm -> own group
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP

    runner = RawCorpusPredictor(_classifier(), DEFAULT_IMAGE_MAP.palette)
    groups = runner.group(pages)
    keys = sorted(k for k, _ in groups)
    assert keys == [(96, 80, 24), (120, 88, 24), (120, 88, 32)]
    assert sum(len(m) for _, m in groups) == 5


def test_matches_direct_throughput_predictor(tmp_path):
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.pipeline import ThroughputPredictor

    h, w, lh = 96, 80, 24
    pages, _, _ = _write_corpus(str(tmp_path), [(h, w, 4)], line_height=lh)
    cls = _classifier()
    runner = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, target_line_height=6, batch_size=2,
        compute_dtype=jnp.float32,
    )
    got = {p.name: trio for p, *trio in runner.run(pages)}
    assert len(got) == 4

    scale = 6 / lh
    direct = ThroughputPredictor(
        cls.module, cls.variables, DEFAULT_IMAGE_MAP.palette, (h, w), scale,
        host_decimate=pick_host_decimate(scale), compute_dtype=jnp.float32,
        download="packed",
    )
    images = np.stack([imread(p.image_path, as_gray=True) for p in pages])
    binaries = np.stack(
        [((imread(p.image_path, as_gray=True) >= 128) * 255).astype(np.uint8)
         for p in pages]
    )
    ref = [trio for trio in direct.run(images, binaries, batch_size=2)]
    ref_colors = np.concatenate([c for c, _, _ in ref])
    for i, page in enumerate(pages):
        np.testing.assert_array_equal(got[page.name][0], ref_colors[i])


def test_window_bounds_and_order(tmp_path):
    """A window smaller than the group still yields every page, in order."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP

    pages, _, _ = _write_corpus(str(tmp_path), [(96, 80, 5)])
    runner = RawCorpusPredictor(
        _classifier(), DEFAULT_IMAGE_MAP.palette, batch_size=2, window=2,
    )
    names = [p.name for p, *_ in runner.run(pages)]
    assert names == [p.name for p in pages]


def test_rejects_rgb_with_int8():
    """RGB encoder families stream (see the parity test below), but int8
    serving stays grayscale-only: the calibration path is built around
    the single-plane invert+/255 normalize."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.models.registry import Architecture

    cls = PixelClassifier(n_classes=3, architecture=Architecture.MOBILE_NET, seed=0)
    with pytest.raises(ValueError, match="grayscale"):
        RawCorpusPredictor(cls, DEFAULT_IMAGE_MAP.palette, int8=True)


def test_cli_pipeline_end_to_end(tmp_path):
    """`predict --pipeline` writes the trio for a mixed-shape corpus."""
    from page_segmentation_tpu.train.checkpoint import save_checkpoint

    pages, img_dir, bin_dir = _write_corpus(
        str(tmp_path), [(96, 80, 3), (120, 88, 2)]
    )
    cls = _classifier()
    ckpt = os.path.join(str(tmp_path), "model")
    save_checkpoint(ckpt, cls.variables, {"architecture": "fcn_skip",
                                          "n_classes": 3})
    out = os.path.join(str(tmp_path), "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # drop the axon-tunnel gate: sitecustomize's register() force-updates
    # jax_platforms after import, so the env var alone cannot keep a
    # subprocess off a wedged TPU tunnel
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "page_segmentation_tpu.cli", "predict",
         "--load", ckpt, "--output", out, "--images", img_dir,
         "--binary", bin_dir, "--char_height", "24", "--pipeline",
         "--batch_size", "2", "--dtype", "float32"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for sub in ("color", "overlay", "inverted"):
        files = sorted(os.listdir(os.path.join(out, sub)))
        assert files == [p.name for p in pages], (sub, files)


def test_binary_free_threshold_matches_binary_files(tmp_path):
    """binary_path=None + the default 'threshold' mode is byte-equal to
    streaming with binary files written as (img >= 128) * 255 — the
    per-page loader fallback contract (reference dataset.py:172)."""
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP

    pages, _, _ = _write_corpus(str(tmp_path), [(96, 80, 3)])
    cls = _classifier()
    with_files = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, batch_size=2, compute_dtype=jnp.float32,
        # no parked-ring sharing between the two runners: each buffers its own
    )
    ref = {p.name: [np.copy(m) for m in trio]
           for p, *trio in with_files.run(pages)}

    free = [RawPage(p.image_path, None, p.line_height_px) for p in pages]
    runner = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, batch_size=2, compute_dtype=jnp.float32,
    )
    for p, *trio in runner.run(free):
        for got, want in zip(trio, ref[p.name]):
            np.testing.assert_array_equal(got, want)


def test_binary_free_otsu_matches_precomputed_otsu_files(tmp_path):
    """binarize='otsu' == streaming with binary files precomputed by the
    cv2-convention Otsu (strictly-above-t -> 255)."""
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.ops.threshold import otsu_threshold

    pages, img_dir, _ = _write_corpus(str(tmp_path), [(96, 80, 3)])
    otsu_dir = os.path.join(str(tmp_path), "otsu")
    os.makedirs(otsu_dir)
    with_files = []
    for p in pages:
        img = imread(p.image_path, as_gray=True)
        t = otsu_threshold(img)
        path = os.path.join(otsu_dir, p.name)
        imsave(path, ((img > t) * 255).astype(np.uint8))
        with_files.append(RawPage(p.image_path, path, p.line_height_px))

    cls = _classifier()
    ref_runner = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, batch_size=2, compute_dtype=jnp.float32,
    )
    ref = {p.name: [np.copy(m) for m in trio]
           for p, *trio in ref_runner.run(with_files)}

    free = [RawPage(p.image_path, None, p.line_height_px) for p in pages]
    runner = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, batch_size=2, compute_dtype=jnp.float32,
        binarize="otsu",
    )
    seen = 0
    for p, *trio in runner.run(free):
        for got, want in zip(trio, ref[p.name]):
            np.testing.assert_array_equal(got, want)
        seen += 1
    assert seen == 3


@pytest.mark.parametrize("arch_name", ["mobile_net", "image_res_net", "effb0"])
def test_rgb_family_pipeline_matches_per_page_fused(tmp_path, arch_name):
    """The pretrained RGB encoder families stream through --pipeline: at
    scale 1 / decimate 1 / no padding, the streamed trio equals the
    per-page fused batch path (predict_batch_masks), whose host
    preprocessing is the reference's stack-to-RGB + Keras
    preprocess_input chain (reference model.py:97,322,371)."""
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.models.registry import Architecture

    h = w = 64  # multiple of every stride factor: no padding anywhere
    pages, _, _ = _write_corpus(str(tmp_path), [(h, w, 2)], line_height=6)
    cls = PixelClassifier(n_classes=3, architecture=Architecture(arch_name),
                          seed=0, compute_dtype=jnp.float32)
    assert cls.rgb

    images = np.stack([imread(p.image_path, as_gray=True) for p in pages])
    raw_bin = np.stack([imread(p.binary_path, as_gray=True) for p in pages])
    ink = (raw_bin < 128).astype(np.uint8)
    prepared = (255 - images).astype(np.uint8)  # prepare.py inversion
    _, masks = cls.predict_batch_masks(prepared, ink, DEFAULT_IMAGE_MAP.palette)

    runner = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, target_line_height=6, batch_size=2,
        compute_dtype=jnp.float32,
    )
    seen = 0
    by_name = {p.name: i for i, p in enumerate(pages)}
    for page, *trio in runner.run(pages):
        i = by_name[page.name]
        for got, want in zip(trio, masks[:, i]):
            np.testing.assert_array_equal(got, want)
        seen += 1
    assert seen == 2


def test_unet_stride16_pipeline_pads_correctly(tmp_path):
    """A stride-16 family (unet) through the corpus path: the predictor
    must pad to the model's own stride factor, and (gray preprocess:
    pad-zero commutes with invert+/255) equal the per-page batch path
    cropped from its bucket."""
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.inference.classifier import PixelClassifier
    from page_segmentation_tpu.models.registry import Architecture

    h, w = 100, 88  # forces stride-16 padding (112, 96)
    pages, _, _ = _write_corpus(str(tmp_path), [(h, w, 2)], line_height=6)
    cls = PixelClassifier(n_classes=3, architecture=Architecture.UNET,
                          seed=0, compute_dtype=jnp.float32)

    images = np.stack([imread(p.image_path, as_gray=True) for p in pages])
    raw_bin = np.stack([imread(p.binary_path, as_gray=True) for p in pages])
    pad = ((0, 0), (0, 112 - h), (0, 96 - w))
    prepared = np.pad((255 - images).astype(np.uint8), pad)
    ink = np.pad((raw_bin < 128).astype(np.uint8), pad)
    _, masks = cls.predict_batch_masks(prepared, ink, DEFAULT_IMAGE_MAP.palette)

    runner = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, target_line_height=6, batch_size=2,
        compute_dtype=jnp.float32,
    )
    by_name = {p.name: i for i, p in enumerate(pages)}
    for page, *trio in runner.run(pages):
        i = by_name[page.name]
        for got, want in zip(trio, masks[:, i]):
            assert got.shape == (h, w, 3)
            np.testing.assert_array_equal(got, want[:h, :w])


def test_binarize_rejects_unknown_mode():
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP

    with pytest.raises(ValueError, match="binarize"):
        RawCorpusPredictor(_classifier(), DEFAULT_IMAGE_MAP.palette,
                           binarize="sauvola")


def test_cli_pipeline_binary_free(tmp_path):
    """`predict --pipeline` without --binary streams binary-free and its
    trio matches the --binary run (the corpus binaries ARE threshold-128)."""
    from page_segmentation_tpu.train.checkpoint import save_checkpoint

    pages, img_dir, bin_dir = _write_corpus(str(tmp_path), [(96, 80, 2)])
    cls = _classifier()
    ckpt = os.path.join(str(tmp_path), "model")
    save_checkpoint(ckpt, cls.variables, {"architecture": "fcn_skip",
                                          "n_classes": 3})
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # drop the axon-tunnel gate: sitecustomize's register() force-updates
    # jax_platforms after import, so the env var alone cannot keep a
    # subprocess off a wedged TPU tunnel
    env.pop("PALLAS_AXON_POOL_IPS", None)
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = {}
    for label, extra in (("with", ["--binary", bin_dir]), ("free", [])):
        out = os.path.join(str(tmp_path), "out_" + label)
        proc = subprocess.run(
            [sys.executable, "-m", "page_segmentation_tpu.cli", "predict",
             "--load", ckpt, "--output", out, "--images", img_dir,
             "--char_height", "24", "--pipeline", "--batch_size", "2",
             "--dtype", "float32"] + extra,
            capture_output=True, text=True, env=env, cwd=cwd,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        outs[label] = out
    for sub in ("color", "overlay", "inverted"):
        for p in pages:
            a = imread(os.path.join(outs["with"], sub, p.name))
            b = imread(os.path.join(outs["free"], sub, p.name))
            np.testing.assert_array_equal(a, b)

def test_corpus_cc_vote_runs(tmp_path):
    """cc_vote=True (predict --pipeline --post_process cc_majority) fuses
    the majority vote into the dispatch; outputs stay shape-correct and
    the run covers every page (vote exactness is gated in
    tests/test_device_vote.py)."""
    import jax.numpy as jnp

    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP

    pages, _, _ = _write_corpus(str(tmp_path), [(96, 80, 3)])
    runner = RawCorpusPredictor(
        _classifier(), DEFAULT_IMAGE_MAP.palette, batch_size=2,
        cc_vote=True, compute_dtype=jnp.float32,
    )
    out = list(runner.run(pages))
    assert len(out) == 3
    for _, color, overlay, inverted in out:
        assert color.shape == overlay.shape == inverted.shape
        assert color.shape[-1] == 3


def test_heterogeneous_shapes_share_one_run_ring(tmp_path):
    """One run() over three groups: two page shapes (the ring reallocates
    on the shape change) plus a same-shape group whose first slice is
    LARGER than the buffer a 1-page group left behind (the shape[0] < n
    growth branch of _SliceRing.take) — no pixels may mix across groups,
    so every page's color mask must equal a single-group reference run."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP

    pages, _, _ = _write_corpus(str(tmp_path), [(96, 80, 3), (120, 88, 1)])
    # same (120, 88) shape, different line height -> its own group, whose
    # 2-page slices must GROW the 1-page buffer the group above allocated
    more, _, _ = _write_corpus(str(tmp_path / "b"), [(120, 88, 4)], line_height=32)
    for j, p in enumerate(more):  # distinct names vs the first corpus
        p.output_name = f"b{j:03d}.png"
    pages = pages + more
    cls = _classifier()
    runner = RawCorpusPredictor(
        cls, DEFAULT_IMAGE_MAP.palette, batch_size=2, window=2,
    )
    got = {p.name: color for p, color, *_ in runner.run(pages)}
    assert len(got) == 8

    # reference: each group streamed alone through a fresh run()
    for group_pages in (pages[:3], pages[3:4], pages[4:]):
        solo = RawCorpusPredictor(
            cls, DEFAULT_IMAGE_MAP.palette, batch_size=2, window=2,
        )
        for p, color, *_ in solo.run(group_pages):
            np.testing.assert_array_equal(got[p.name], color)


def test_ring_pool_reuse_and_exclusivity(tmp_path):
    """Sequential run() calls reuse one parked slice ring (the warm-buffer
    fast path); overlapping run() generators hold distinct rings; an
    abandoned (closed) generator parks its ring back; and pixel outputs
    through the reused ring stay exact."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP

    pages, _, _ = _write_corpus(str(tmp_path), [(96, 80, 4)])
    runner = RawCorpusPredictor(
        _classifier(), DEFAULT_IMAGE_MAP.palette, batch_size=2, window=2,
    )
    assert runner._spare_ring is None
    # the pool lock must exist from construction: a lazily-created lock is
    # itself a race (two threads could each install a different Lock and
    # both pop the same parked ring)
    assert runner._ring_lock is not None
    first = {p.name: c for p, c, *_ in runner.run(pages)}
    ring_a = runner._spare_ring
    assert ring_a is not None  # parked after the run

    # overlapping generators: the second must NOT get the first's ring
    gen1 = runner.run(pages)
    next(gen1)  # gen1 now owns the parked ring
    assert runner._spare_ring is None
    gen2 = runner.run(pages)
    next(gen2)  # fresh ring; both active at once
    gen1.close()  # abandon mid-run -> its ring parks back
    assert runner._spare_ring is ring_a
    rest = list(gen2)  # gen2 keeps streaming on its own buffers
    assert len(rest) == len(pages) - 1
    gen2.close()
    assert runner._spare_ring is ring_a  # extra ring dropped, not stacked

    # reuse is exact: a second full pass equals the first
    second = {p.name: c for p, c, *_ in runner.run(pages)}
    assert runner._spare_ring is ring_a
    for name, color in first.items():
        np.testing.assert_array_equal(color, second[name])


def test_packed_bilevel_binaries_equal_expanded(tmp_path):
    """A corpus whose binaries are true 1-bit PNGs (imsave_bilevel, the
    recommended layout) streams bit-packed from disk to ink gather and
    must produce byte-identical trios to the 8-bit-binary corpus."""
    from page_segmentation_tpu.core.colors import DEFAULT_IMAGE_MAP
    from page_segmentation_tpu.core.image_io import imsave_bilevel

    pages, _, bin_dir = _write_corpus(str(tmp_path), [(96, 80, 3)])
    packed_dir = os.path.join(str(tmp_path), "binary1")
    os.makedirs(packed_dir)
    packed_pages = []
    for p in pages:
        name = os.path.basename(p.binary_path)
        imsave_bilevel(os.path.join(packed_dir, name), imread(p.binary_path, as_gray=True))
        packed_pages.append(RawPage(p.image_path, os.path.join(packed_dir, name),
                                    p.line_height_px))
    runner = RawCorpusPredictor(_classifier(), DEFAULT_IMAGE_MAP.palette,
                                batch_size=2)
    ref = {p.name: trio for p, *trio in runner.run(pages)}
    got = {p.name: trio for p, *trio in runner.run(packed_pages)}
    assert ref.keys() == got.keys()
    for name in ref:
        for a, b in zip(ref[name], got[name]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
