"""Sources & sinks: driver testdata loaders and checkpointed stage IO."""

from dedupe_spark.sources.testdata import TABLES, load_table, register_views
from dedupe_spark.sources.checkpoints import StageIO

__all__ = ["TABLES", "load_table", "register_views", "StageIO"]
