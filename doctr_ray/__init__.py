"""doctr_ray — a Ray-Data-native document text-extraction engine.

A from-scratch re-expression of the capabilities of mindee/doctr
(reference at /root/reference, cited by file:line in docstrings) as an
idiomatic ``ray.data.Dataset`` pipeline: streaming Arrow batches,
``map_batches`` task stages for pure kernels, actor pools for stateful
model stages, keyed groupbys for fan-in, partitioned + resumable output.

The engine processes *interleaved text+media documents*::

    docs(doc_id: string,
         spans: list<struct<kind: string, text: string,
                            media_ref: string, offset: int32>>)

``kind='text'`` spans pass through; ``kind='media'`` spans reference a
page-bearing asset which is rasterized, text-detected, recognized, and
re-assembled in reading order into ``kind='ocr_text'`` spans, preserving
the interleaved order by ``offset``.

Because this sandbox has no torch/cv2/PIL/pdfium, the "model" stages are
deterministic pure-numpy implementations with the same *shape* as the
reference's (DB-style detection: threshold -> morphology -> connected
components -> scored boxes; CRNN-style recognition: fixed-grid
segmentation -> batched template scoring -> decode). Real decoders
(PDF via pdfium, images via cv2) are stubbed behind clearly-marked
``NotImplementedError`` in :mod:`doctr_ray.sources.readers`; all Ray-side
plumbing (schemas, batching, actor pools, shuffles, checkpointing) is
real and tested.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (keeps `import doctr_ray` light; Ray and the
    pipeline modules load on first use)."""
    _api = {
        "ocr_spans": ("doctr_ray.pipelines.ocr", "ocr_spans"),
        "ocr_extracted_text": ("doctr_ray.pipelines.ocr", "ocr_extracted_text"),
        "ocr_page_exports": ("doctr_ray.pipelines.ocr", "ocr_page_exports"),
        "recognition_training_set": ("doctr_ray.pipelines.ocr", "recognition_training_set"),
        "kie_predictions": ("doctr_ray.pipelines.kie", "kie_predictions"),
        "docs_dataset": ("doctr_ray.corpus", "docs_dataset"),
        "run_partitioned": ("doctr_ray.state.checkpoint", "run_partitioned"),
        "Document": ("doctr_ray.elements", "Document"),
        "Page": ("doctr_ray.elements", "Page"),
        "ocr_predictor": ("doctr_ray.zoo", "ocr_predictor"),
        "kie_predictor": ("doctr_ray.zoo", "kie_predictor"),
        "sort_reading_order": ("doctr_ray.reading_order", "sort_reading_order"),
        "ReadingOrderPredictor": ("doctr_ray.reading_order", "ReadingOrderPredictor"),
        "synthesize_page": ("doctr_ray.reconstitution", "synthesize_page"),
    }
    if name in _api:
        import importlib

        mod, attr = _api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'doctr_ray' has no attribute {name!r}")
