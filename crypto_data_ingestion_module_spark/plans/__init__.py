"""Query plans: the oracle-checked registry lives in
``crypto_data_ingestion_module_spark.plans.queries``.

(Deliberately no re-exports: the submodule name ``queries`` would collide
with its same-named function.)
"""
