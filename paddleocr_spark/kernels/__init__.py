"""Pure-NumPy kernels (no Spark imports) — safe to ship to executors."""

from . import cls, ctc, db, geometry, matcher, nms, reading_order, table  # noqa: F401
