"""tiledb_mariadb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of TileDB-Inc/TileDB-MariaDB ("MyTile").

The reference is a MariaDB storage-engine plugin exposing TileDB arrays as
SQL tables (see SURVEY.md).  This package re-expresses that capability
Spark-first:

- the *storage/table* layer (dimensions vs attributes, DDL, discovery,
  ``@metadata``, time travel, schema evolution) lives in
  :mod:`tiledb_mariadb_spark.catalog`;
- the *SQL surface* (scans, pushdown, aggregates, joins, windows, set ops)
  is declared with the DataFrame/SQL API so Catalyst plans it — the
  conformance suite in :mod:`tiledb_mariadb_spark.suite` pins semantics
  against a DuckDB oracle;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal columns) live in
  :mod:`tiledb_mariadb_spark.functions`.
"""

from tiledb_mariadb_spark.catalog import (  # noqa: F401
    Attr,
    Dim,
    TileSchema,
    TileTable,
    discover_parquet,
    open_uri,
)
from tiledb_mariadb_spark.session import (  # noqa: F401
    get_spark,
    tune_for_oracle,
    tune_for_streaming,
)
from tiledb_mariadb_spark.sources.registry import TABLES, load_table, register_views  # noqa: F401
from tiledb_mariadb_spark.sources.tiledb_array import (  # noqa: F401
    copartitioned_asof_join,
    copartitioned_join_arrays,
    copartitioned_join_many,
    diff_arrays,
    merge_into_array,
    read_array,
    topk_array,
    write_array,
)

__version__ = "0.1.0"
