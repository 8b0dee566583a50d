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
           "html_main_content", "html_links", "html_link_graph",
           "build_link_graph_table", "html_pagerank", "LINK_COEFFS",
           "PR_ITERS", "PR_SCALE"]

ENTITY_PLANT_N = 10
ENTITY_SUFFIX = " AT&T says 2<3 & 4>1"
PARA2 = ("Closing thoughts follow in a second paragraph long enough "
         "to clear the minimum block threshold.")
# the related-links block points at 3 other docs of the SAME corpus:
# dst_i = (a_i * doc_id + b_i) mod N — a deterministic link graph the
# oracle reproduces from the same formulas (collisions and self-loops
# are kept: they exist on the real web too and both sides agree)
LINK_COEFFS = ((7, 1), (13, 5), (31, 11))
PR_ITERS = 10
PR_SCALE = 10 ** 12  # fixed-point: rank 1.0 == 10^12

_RESULT_SCHEMA = ("doc_id long, title string, main_text string, "
                  "n_blocks_kept long, n_blocks_dropped long")


def htmlize_documents(spark, sf_dir: str):
    """(doc_id, html): the deterministic page template around each
    doc's (escaped) text."""
    from pyspark.sql import functions as F

    df = (spark.read.parquet(f"{sf_dir}/documents.parquet")
          .select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    # corpus size as a broadcast one-row cross join (plan-time, no
    # driver action) — the link formulas need N
    n_row = df.agg(F.count("*").alias("_n"))
    df = df.crossJoin(F.broadcast(n_row))
    body = F.when(F.col("doc_id") < ENTITY_PLANT_N,
                  F.concat(F.col("text"), F.lit(ENTITY_SUFFIX))) \
            .otherwise(F.col("text"))
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;")
    related = [F.lit("<div class='related'>")]
    for a, b in LINK_COEFFS:
        dst = (F.col("doc_id") * a + b) % F.col("_n")
        related += [F.lit("<a href='/doc/"), dst, F.lit("'>doc "),
                    dst, F.lit("</a> ")]
    related.append(F.lit("</div>"))
    html = F.concat(
        F.lit("<html><head><title>Doc "), F.col("doc_id"),
        F.lit("</title><style>body{margin:0}</style></head><body>"),
        F.lit("<nav><a href='/'>Home</a> <a href='/about'>About</a> "
              "<a href='/contact'>Contact</a></nav>"),
        F.lit("<h1>Doc "), F.col("doc_id"), F.lit("</h1>"),
        F.lit("<p>"), esc, F.lit("</p>"),
        *related,
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


def html_links(spark, sf_dir: str):
    """(doc_id, pos, href) for every anchor in every page, in document
    order — one Arrow-batched pass with the same tokenizer the
    main-content extractor uses (so script bodies and comments can
    never fake a link). On this template each page yields 7 rows: the
    3 nav links, the 3 related-doc links, the footer /tos."""
    from pyspark.sql import functions as F

    docs = htmlize_documents(spark, sf_dir)

    def extract(batches):
        import pandas as pd

        from paddleocr_spark.kernels.html import extract_links

        for pdf in batches:
            ids, poss, hrefs = [], [], []
            for doc_id, h in zip(pdf["doc_id"], pdf["html"]):
                for pos, href in enumerate(extract_links(h)):
                    ids.append(doc_id)
                    poss.append(pos)
                    hrefs.append(href)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int64"),
                "href": pd.Series(hrefs, dtype="object"),
            })

    return docs.mapInPandas(
        extract, schema="doc_id long, pos long, href string")


def html_link_graph(spark, sf_dir: str):
    """Distinct (src, dst) edges of the intra-corpus link graph:
    /doc/<id> hrefs parsed back to ids. Collisions between the three
    formulas collapse under DISTINCT; self-loops are kept."""
    from pyspark.sql import functions as F

    return (html_links(spark, sf_dir)
            .where(F.col("href").startswith("/doc/"))
            .select(F.col("doc_id").alias("src"),
                    F.expr("CAST(substring(href, 6) AS BIGINT)")
                    .alias("dst"))
            .distinct())


def _link_graph_dir(sf_dir: str) -> str:
    import hashlib
    import os

    from paddleocr_spark.cachedir import cache_root

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        mtime = int(os.path.getmtime(src))
    except OSError:
        mtime = 0
    # the template coefficients determine the edge content — re-key
    # the table if they ever change
    ident = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{mtime}:{LINK_COEFFS}"
        .encode()).hexdigest()[:12]
    return cache_root("link_graph", f"v1_{ident}")


def build_link_graph_table(spark, sf_dir: str) -> str:
    """Build (or load) the persisted link-graph edge table for this
    corpus — the same build-once shape as the near-dup edge table
    (operators/dedup.py) and the IVF index: the HTML parse runs ONCE
    and every downstream consumer (PageRank's 10 join rounds,
    re-runs across sessions) reads (src, dst) rows from parquet. At
    production scale the link graph IS its own table, written by the
    link-extraction job. Returns the table directory."""
    import os

    out = _link_graph_dir(sf_dir)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    html_link_graph(spark, sf_dir).write.mode("overwrite").parquet(out)
    return out


def html_pagerank(spark, sf_dir: str, iters: int = PR_ITERS,
                  checkpoint: bool = True,
                  checkpoint_dir: str | None = None):
    """Deterministic fixed-point PageRank over the extracted link
    graph — the canonical web-scale iterative DataFrame job.

    All arithmetic is 64-bit integer on ranks scaled by PR_SCALE
    (rank 1.0 == 10^12): contribution = rank DIV outdeg, damping =
    (85 * inflow) DIV 100 + (15 * PR_SCALE DIV 100) DIV N. Integer
    sums are order-independent, so the result is bit-exact across
    partitionings, engines, and the DuckDB oracle's unrolled-CTE
    twin — no float-summation-order caveats. Each round is one join +
    one map-side-combinable sum; a checkpoint every third round keeps
    the logical plan depth bounded (the operators/graph.py lesson)
    while paying the eager-materialization barrier 4x instead of 10x —
    measured 12.2 s -> 4.5 s cold / 4.8 -> 3.7 warm at sf0.01,
    hash-identical output. The default localCheckpoint is right for
    local[*]; pass ``checkpoint_dir=`` for the cluster-durable
    reliable mode (operators/_iter.py — survives executor loss,
    output-identical). Every node has outdegree >= 1 by construction,
    so no dangling-mass term."""
    from pyspark.sql import functions as F

    from paddleocr_spark.operators._cache import eager_persist
    from paddleocr_spark.operators._iter import checkpointer

    ckpt = checkpointer(spark, checkpoint_dir)

    # the link graph is a PERSISTED corpus-prep table (built once per
    # corpus by build_link_graph_table, reused across sessions — the
    # HTML parse never re-runs for PageRank); the memory persist on
    # top keeps the 10 join rounds off the parquet scan. Measured at
    # sf0.1: 17 s with the parse inline per round -> ~4 s with a
    # session cache -> ~1.5 s serving from the prebuilt table.
    # materialize=False: outdeg's count below is edges' first
    # (sequential) consumer and fills both caches in one job
    edges = eager_persist(
        spark.read.parquet(build_link_graph_table(spark, sf_dir)),
        materialize=False)
    nodes = (spark.read.parquet(f"{sf_dir}/documents.parquet")
             .select(F.col("doc_id").cast("long").alias("doc_id")))
    n_row = nodes.agg(F.count("*").alias("_n"))
    # nodes is joined in EVERY round (same access pattern as edges) —
    # persist it too, or each eager round re-scans the parquet and
    # recomputes the count aggregation
    nodes = eager_persist(nodes.crossJoin(F.broadcast(n_row)))

    outdeg = eager_persist(
        edges.groupBy("src").agg(F.count("*").alias("deg")))
    # `div` is Spark's true 64-bit integer division — NOT `/` +
    # cast(long), which routes through a double and can round across
    # an integer boundary once N or the ranks grow
    base = F.expr(f"{15 * PR_SCALE // 100} div _n")
    # the initial ranks are a zero-depth projection of the cached
    # nodes — checkpointing them would buy no plan truncation and
    # cost a whole job; the first in-loop checkpoint (round 3) is the
    # earliest one that pays for itself
    ranks = nodes.select(
        "doc_id", "_n",
        F.expr(f"{PR_SCALE} div _n").alias("rank_fp"))

    for it in range(iters):
        contrib = (ranks
                   .join(outdeg, ranks.doc_id == outdeg.src)
                   .select(F.col("doc_id").alias("c_src"),
                           F.expr("rank_fp div deg").alias("c")))
        inflow = (edges.join(contrib, edges.src == F.col("c_src"))
                  .groupBy("dst").agg(F.sum("c").alias("inflow")))
        ranks = (nodes
                 .join(inflow, nodes.doc_id == inflow.dst, "left")
                 .select(
                     "doc_id", "_n",
                     (base + F.expr(
                         "(85 * coalesce(inflow, 0L)) div 100"))
                     .alias("rank_fp")))
        if checkpoint and ((it + 1) % 3 == 0 or it == iters - 1):
            ranks = ckpt(ranks)

    return ranks.select("doc_id", "rank_fp")
