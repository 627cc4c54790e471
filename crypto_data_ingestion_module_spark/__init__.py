"""PySpark-native analytics engine with the capabilities of the
``benrey916/crypto-data-ingestion-module`` reference (multi-exchange OHLCV
ingestion → normalize → dedup-upsert Parquet lake, batch backfill + live
streaming), plus large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design: everything is expressed with the DataFrame / SQL API so Catalyst
and Tungsten own the physical plan — predicate pushdown, column pruning,
partial aggregation, broadcast joins, AQE.  Python UDFs appear only where
the built-ins genuinely can't express the semantics, and then always as
Arrow-batched Pandas UDFs.
"""

__version__ = "0.1.0"
