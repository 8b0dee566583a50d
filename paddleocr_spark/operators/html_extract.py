"""HTML main-content extraction over the documents table — the
HTML/DOM half of the north rule's "main-content extraction (HTML
boilerplate strip, PDF/layout parse, DOM heuristics)".

The corpus has no HTML column, so ``htmlize_documents`` wraps each
doc's text in a deterministic page template — title, nav link bar,
short h1, the article paragraph (markup-escaped), a related-links
farm, a second fixed paragraph, a short teaser, footer — with PURE
column expressions, mirrored verbatim in the DuckDB oracle. The
extractor (``kernels/html.py``, Arrow-batched mapInPandas) must then
invert the construction exactly: drop the nav/footer subtrees, the
link farm (link density), and the short blocks (min length), keep the
two real paragraphs in order, decode the escaped entities, and recover
the title. The first ENTITY_PLANT_N docs carry planted ``& < >``
characters so the escape/decode path is load-bearing, not decorative.

At 100 TB this is one Arrow-batched Python stage over a text column —
embarrassingly parallel, no shuffle, column-pruned to (doc_id, html).
"""

from __future__ import annotations

__all__ = ["ENTITY_PLANT_N", "PARA2", "htmlize_documents",
           "html_main_content"]

ENTITY_PLANT_N = 10
ENTITY_SUFFIX = " AT&T says 2<3 & 4>1"
PARA2 = ("Closing thoughts follow in a second paragraph long enough "
         "to clear the minimum block threshold.")

_RESULT_SCHEMA = ("doc_id long, title string, main_text string, "
                  "n_blocks_kept long, n_blocks_dropped long")


def htmlize_documents(spark, sf_dir: str):
    """(doc_id, html): the deterministic page template around each
    doc's (escaped) text."""
    from pyspark.sql import functions as F

    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    body = F.when(F.col("doc_id") < ENTITY_PLANT_N,
                  F.concat(F.col("text"), F.lit(ENTITY_SUFFIX))) \
            .otherwise(F.col("text"))
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;")
    html = F.concat(
        F.lit("<html><head><title>Doc "), F.col("doc_id"),
        F.lit("</title><style>body{margin:0}</style></head><body>"),
        F.lit("<nav><a href='/'>Home</a> <a href='/about'>About</a> "
              "<a href='/contact'>Contact</a></nav>"),
        F.lit("<h1>Doc "), F.col("doc_id"), F.lit("</h1>"),
        F.lit("<p>"), esc, F.lit("</p>"),
        F.lit("<div class='related'><a href='/r1'>related article one"
              "</a> <a href='/r2'>related article two</a></div>"),
        F.lit("<p>"), F.lit(PARA2), F.lit("</p>"),
        F.lit("<p>Read more</p>"),
        F.lit("<footer>(c) 2026 Example Corp. All rights reserved. "
              "<a href='/tos'>Terms</a></footer>"),
        F.lit("</body></html>"))
    return df.select("doc_id", html.alias("html"))


def html_main_content(spark, sf_dir: str):
    """Per doc: title + main text + block-keep/drop counts from the
    DOM heuristics. Expected on this template: title 'Doc <id>', main
    text = normalized article + PARA2, 2 kept / 3 dropped blocks (the
    short h1, the link farm, the teaser)."""
    docs = htmlize_documents(spark, sf_dir)

    def extract(batches):
        import pandas as pd

        from paddleocr_spark.kernels.html import main_content

        for pdf in batches:
            rows = [main_content(h) for h in pdf["html"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "title": [r["title"] for r in rows],
                "main_text": [r["main_text"] for r in rows],
                "n_blocks_kept": pd.Series(
                    [r["n_blocks_kept"] for r in rows], dtype="int64"),
                "n_blocks_dropped": pd.Series(
                    [r["n_blocks_dropped"] for r in rows],
                    dtype="int64"),
            })

    return docs.mapInPandas(extract, schema=_RESULT_SCHEMA)
