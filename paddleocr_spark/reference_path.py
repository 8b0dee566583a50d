"""Pure-Python sequential extraction — the pytest oracle.

Mirrors the reference's one-document-at-a-time flow
(``toddleocr/engine.py:326-391`` → ``toddleocr/config.py:419-439``):
no Spark, no parallelism, just the kernels applied per span in document
order. The Spark pipeline (operators/extract.py) must produce the
exact same per-document ordered span sequence
``(kind, text, media_ref, order)`` — the BASELINE.json per-row
invariant.
"""

from __future__ import annotations

from .corpus import doc_record, media_record
from .extract_core import clean_text, decode_media_row

__all__ = ["extract_doc", "golden_corpus"]


def extract_doc(doc: dict, media_lookup) -> list[dict]:
    """doc: {doc_id, spans:[{kind,text,media_ref,offset}]};
    media_lookup: media_ref -> media fixture dict.
    Returns ordered rows (doc_id, order, kind, text, media_ref, conf)."""
    out = []
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        if span["kind"] == "text":
            cleaned = clean_text(span["text"])
            if cleaned:
                out.append({
                    "kind": "text", "text": cleaned, "media_ref": "",
                    "conf": 1.0,
                })
        else:
            for frag in decode_media_row(media_lookup(span["media_ref"])):
                out.append({
                    "kind": frag["out_kind"], "text": frag["out_text"],
                    "media_ref": span["media_ref"], "conf": frag["conf"],
                })
    for order, row in enumerate(out):
        row["doc_id"] = doc["doc_id"]
        row["order"] = order
    return out


def golden_corpus(n_docs: int, seed: int = 42, heavy_frac: float = 0.01,
                  media_pool: int | None = None):
    """Generate docs + media in-process and run the sequential extract.
    Returns (docs, media_by_ref, golden_rows)."""
    if media_pool is None:
        media_pool = max(16, n_docs * 2)
    docs = [doc_record(i, seed, heavy_frac, media_pool) for i in range(n_docs)]
    refs = {s["media_ref"] for d in docs for s in d["spans"]
            if s["kind"] == "media"}
    media = {r: media_record(r, seed) for r in sorted(refs)}
    golden = [row for d in docs for row in extract_doc(d, media.__getitem__)]
    return docs, media, golden
