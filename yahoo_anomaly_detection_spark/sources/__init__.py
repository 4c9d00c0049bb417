from yahoo_anomaly_detection_spark.sources.catalog import ParquetCatalog
from yahoo_anomaly_detection_spark.sources.iceberg import (
    IcebergCatalog,
    iceberg_available,
)
from yahoo_anomaly_detection_spark.sources.ingest import (
    load_table,
    bronze_transcripts,
    text_invariant_table,
)

__all__ = [
    "ParquetCatalog",
    "IcebergCatalog",
    "iceberg_available",
    "load_table",
    "bronze_transcripts",
    "text_invariant_table",
]
