"""page_segmentation_tpu — TPU-native page segmentation framework.

A ground-up JAX/XLA rebuild of the OCR4All pixel-classifier capability
surface (per-pixel page classification, classic-CV post-segmentation,
PageXML ground-truth generation, evaluation), designed TPU-first: static
bucketed shapes, fused on-device pre/post-processing, data-parallel
execution over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from .core.colors import ColorMap, DEFAULT_IMAGE_MAP  # noqa: F401


def __getattr__(name):
    # lazy re-exports keep `import page_segmentation_tpu` light
    lazy = {
        "Architecture": ("page_segmentation_tpu.models.registry", "Architecture"),
        "Optimizers": ("page_segmentation_tpu.models.registry", "Optimizers"),
        "Loss": ("page_segmentation_tpu.train.metrics", "Loss"),
        "Monitor": ("page_segmentation_tpu.train.metrics", "Monitor"),
        "SingleData": ("page_segmentation_tpu.data.dataset", "SingleData"),
        "Dataset": ("page_segmentation_tpu.data.dataset", "Dataset"),
        "DatasetLoader": ("page_segmentation_tpu.data.loader", "DatasetLoader"),
        "PixelClassifier": ("page_segmentation_tpu.inference.classifier", "PixelClassifier"),
        "Predictor": ("page_segmentation_tpu.inference.predictor", "Predictor"),
        "PredictSettings": ("page_segmentation_tpu.inference.predictor", "PredictSettings"),
        "Prediction": ("page_segmentation_tpu.inference.predictor", "Prediction"),
        "Trainer": ("page_segmentation_tpu.train.trainer", "Trainer"),
        "TrainSettings": ("page_segmentation_tpu.train.trainer", "TrainSettings"),
        "AugmentationSettings": ("page_segmentation_tpu.train.trainer", "AugmentationSettings"),
        "MaskGenerator": ("page_segmentation_tpu.pagexml.mask_gen", "MaskGenerator"),
        "MaskSetting": ("page_segmentation_tpu.pagexml.mask_gen", "MaskSetting"),
        "MaskType": ("page_segmentation_tpu.pagexml.mask_gen", "MaskType"),
        "find_segments": ("page_segmentation_tpu.segmentation.pc_segmentation", "find_segments"),
        "Network": ("page_segmentation_tpu.network", "Network"),
        "find_postprocessor": ("page_segmentation_tpu.inference.postprocess", "find_postprocessor"),
        "Masks": ("page_segmentation_tpu.inference.output", "Masks"),
        "generate_output_masks": ("page_segmentation_tpu.inference.output", "generate_output_masks"),
        "ThroughputPredictor": ("page_segmentation_tpu.inference.pipeline", "ThroughputPredictor"),
        "ParallelPredictor": ("page_segmentation_tpu.parallel.executor", "ParallelPredictor"),
        "make_mesh": ("page_segmentation_tpu.parallel.mesh", "make_mesh"),
        "spatial_predict": ("page_segmentation_tpu.parallel.spatial", "spatial_predict"),
        "banded_forward": ("page_segmentation_tpu.parallel.spatial", "banded_forward"),
        "BatchingService": ("page_segmentation_tpu.inference.server", "BatchingService"),
        "PredictionServer": ("page_segmentation_tpu.inference.server", "PredictionServer"),
        "AotClassifier": ("page_segmentation_tpu.inference.aot", "AotClassifier"),
        "RawCorpusPredictor": ("page_segmentation_tpu.inference.corpus", "RawCorpusPredictor"),
        "get_text_contours": ("page_segmentation_tpu.segmentation.pc_segmentation", "get_text_contours"),
        "build_pagexml": ("page_segmentation_tpu.pagexml.xml_gen", "build_pagexml"),
        "save_pagexml": ("page_segmentation_tpu.pagexml.xml_gen", "save_pagexml"),
        "distributed": ("page_segmentation_tpu.parallel.distributed", None),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        mod = importlib.import_module(module)
        return mod if attr is None else getattr(mod, attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
