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
