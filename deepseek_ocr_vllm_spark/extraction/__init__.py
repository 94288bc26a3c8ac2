"""Extraction core: main-content extraction over transcript turn text.

Three payload kinds (detected per turn):
  * HTML-ish markup  → readability-style node scoring + tag-whitelist strip
                       (reference contract: vLLM OCR emits markdown/HTML with
                       <table> fragments — deepseek-ocr.ts:100,222; noise strip
                       deepseek-ocr.ts:383-393)
  * pseudo-PDF layout lines ``x,y,size,font|content``
                     → docling-style block segmentation, reading-order sort,
                       span merge ([TABLE]/heading markers —
                       triton-models/docling_granite_python/1/model.py:18-72;
                       word layout pdf_extract.py:58-73)
  * plain text       → OCR-noise line strip + unicode/whitespace normalize

Two implementations with identical semantics:
  * golden.py     — naive per-row reference (plays the role of the reference
                    repo's pandas golden baselines, tests/reconciliation/)
  * vectorized.py — whole-Arrow-batch implementation used by the Spark job
Both share only leaf helpers + constants (spec.py), never control flow.
"""
