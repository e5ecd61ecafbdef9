"""Table sources.

The reference's only storage is its custom rick/SSTable binary format
(reference protos/flatbuffer/helix.fbs, src/file/) with no external
connectors. This engine reads/writes Parquet natively (plus CSV/JSON via
:mod:`helixdb_spark.sources.connectors`) and treats the driver testdata
star schema as its analytics corpus (TESTDATA.md).
"""

from helixdb_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    read_entries,
    register_views,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "read_entries", "register_views"]
