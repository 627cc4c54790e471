"""Relational operators: dedup, resample, merge — the reference's save-path
semantics (crypto_collector.py:523-558) re-expressed as DataFrame algebra."""

from crypto_data_ingestion_module_spark.operators.dedup import (  # noqa: F401
    dedup_keep_last,
    dedup_keep_last_window,
)
from crypto_data_ingestion_module_spark.operators.resample import (  # noqa: F401
    resample_ohlcv,
)
from crypto_data_ingestion_module_spark.operators.merge import (  # noqa: F401
    merge_keep_last,
)
