"""Poly-mode DB detection as an oracle-checked distributed query.

``det_polygons`` decodes the deterministic curved-text fixture maps
(``corpus.poly_map_record``) with the poly-mode DB kernel
(``kernels/db_poly.db_postprocess_poly`` — box_type="poly" +
use_dilation, ``toddleocr/postprocess/db.py:38-84,213-216``) inside one
Arrow ``mapInPandas`` pass and emits every output polygon vertex as an
integer row, hash-comparable against the sequential golden
(``golden.py`` -> ``golden_det_polygons.parquet``).

Plan shape (designed for 10^12 docs): the fixture ids are an embarrassingly
parallel ``spark.range`` — at production scale the same UDF body runs
over the media-store prob maps partition-by-partition with zero
shuffle; the only exchange here is the final presentation orderBy,
which the driver's hash-compare requires. Output columns are all
bigint (coordinates are integral after the reference's round+clip;
score is fixed-point micro units), so the cross-engine hash has no
float surface at all.
"""

from __future__ import annotations

__all__ = ["det_polygons"]


def det_polygons(spark, sf_dir: str):
    import pandas as pd

    from paddleocr_spark.corpus import (
        POLY_SHAPE_LIST,
        poly_map_count,
        poly_map_record,
    )
    from paddleocr_spark.kernels.db_poly import db_postprocess_poly

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_maps = poly_map_count(int(n_docs))
    schema = ("map_id long, poly_idx long, point_idx long, "
              "x long, y long, score_micro long")

    def gen(batches):
        for pdf in batches:
            out = {c: [] for c in ("map_id", "poly_idx", "point_idx",
                                   "x", "y", "score_micro")}
            for mid in pdf["id"]:
                mid = int(mid)
                pm = poly_map_record(mid)
                polys, scores = db_postprocess_poly(pm, POLY_SHAPE_LIST)
                for pi, (poly, sc) in enumerate(zip(polys, scores)):
                    smicro = int(round(sc * 1e6))
                    for ki, (x, y) in enumerate(poly.tolist()):
                        out["map_id"].append(mid)
                        out["poly_idx"].append(pi)
                        out["point_idx"].append(ki)
                        out["x"].append(int(x))
                        out["y"].append(int(y))
                        out["score_micro"].append(smicro)
            yield pd.DataFrame(out)

    ids = spark.range(n_maps).repartition(min(n_maps, 32))
    return (ids.mapInPandas(gen, schema)
            .orderBy("map_id", "poly_idx", "point_idx"))
