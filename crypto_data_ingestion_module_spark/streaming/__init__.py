from crypto_data_ingestion_module_spark.streaming.live import (  # noqa: F401
    live_collection_stream,
    stream_upsert_to_lake,
    watermark_dedup,
)
