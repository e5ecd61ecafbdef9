"""helixdb_spark — a PySpark-native analytics engine with the capabilities of
waynexia/helixdb (time-series KV: put/get/scan, time-driven compaction,
retention, pluggable per-key codecs), re-expressed Spark-first, plus the
analytics layer (joins/aggregations/windows) and large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) that a 100 TB deployment needs.

Design stance (SURVEY.md §7): DataFrame/SQL plans optimized by Catalyst;
time-bucket partition columns replace the reference's hand-rolled time levels
(reference: src/level.rs, src/types/level_info.rs); Parquet footer stats
replace its SSTable/MemIndex (src/file/sstable.rs, src/index.rs); Spark
shuffle + sort replaces its k-way shard merge (src/iterator.rs).
"""

from helixdb_spark.engine import HelixSpark, HelixOptions
from helixdb_spark.index_store import AnnIndexStore
from helixdb_spark.session import get_session

__all__ = ["HelixSpark", "HelixOptions", "AnnIndexStore", "get_session"]
__version__ = "0.1.0"
