from crypto_data_ingestion_module_spark.streaming.live import (  # noqa: F401
    live_collection_stream,
    stream_upsert_to_lake,
    watermark_dedup,
)
from crypto_data_ingestion_module_spark.streaming.dedup_stream import (  # noqa: F401
    stream_dedup_ingest,
)
from crypto_data_ingestion_module_spark.streaming.rollup_stream import (  # noqa: F401
    stream_rollup,
)
from crypto_data_ingestion_module_spark.streaming.curate_stream import (  # noqa: F401
    finalize_curated,
    stream_curate_ingest,
)
