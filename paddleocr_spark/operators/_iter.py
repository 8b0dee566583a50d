"""Lineage truncation for iterative DataFrame jobs.

Loop-carried state (PageRank ranks, connected-components labels) must
be checkpointed every few rounds or the logical plan nests and
multiplies (see operators/graph.py). Two modes:

- ``localCheckpoint(eager=True)`` (default): blocks live on EXECUTORS.
  Fast, zero configuration — and exactly right on local[*] where
  "executor loss" cannot happen without losing the whole JVM.
- reliable ``checkpoint(eager=True)`` into a caller-supplied
  ``checkpoint_dir``: blocks go to the (distributed) filesystem, so on
  a real cluster one executor loss after an eager checkpoint leaves a
  recompute path — localCheckpoint there kills the lineage WITHOUT a
  recovery copy, turning one lost executor into a failed job. At
  100-TB scale pass a DFS path (or write every k-th round's state to
  an intermediate table, the pattern the prep tables already use).

The two modes are output-identical (tests/test_iter_checkpoint.py);
reliable checkpoint files are cleaned by Spark only with
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — a bounded
per-job directory either way.
"""

from __future__ import annotations

__all__ = ["checkpointer"]


def checkpointer(spark, checkpoint_dir: str | None):
    """Returns ``ckpt(df) -> df`` for the chosen durability mode. When
    ``checkpoint_dir`` is given it is installed as the context's
    checkpoint dir (idempotent) and reliable ``checkpoint()`` is used;
    otherwise ``localCheckpoint()``."""
    from paddleocr_spark.operators._cache import track_checkpoint

    if checkpoint_dir is None:
        return lambda df: track_checkpoint(
            df.localCheckpoint(eager=True))
    sc = spark.sparkContext
    current = sc.getCheckpointDir()
    if not current or checkpoint_dir not in current:
        sc.setCheckpointDir(checkpoint_dir)
    return lambda df: df.checkpoint(eager=True)
