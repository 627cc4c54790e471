"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a QuerySpec's Spark side and its oracle SQL on the same parquet
tables and compares row count, column set, and (order-insensitively)
every value — stricter than the driver (exact match, tiny fp tolerance
only as a diagnostic) so driver-side hash mismatches are caught here
first.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from crypto_data_ingestion_module_spark.session import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            s = s.astype("bool")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        else:
            s = s.astype("string")
        out[c] = s
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a, b = _canon(spark_df), _canon(oracle_df)
    for c in a.columns:
        # The driver hashes TYPED values: an int64 Spark column whose
        # oracle twin arrives float64 (DuckDB HUGEINT -> pandas float)
        # would compare 7 == 7.0 here yet hash-mismatch at the driver.
        # Fail hard on any canonical dtype-family divergence.
        assert a[c].dtype == b[c].dtype, (
            f"{name}.{c}: canonical dtype mismatch spark={a[c].dtype} "
            f"oracle={b[c].dtype} — likely a DuckDB HUGEINT/float leak; "
            "CAST the oracle output (e.g. AS BIGINT) to match Spark"
        )
    for c in a.columns:
        if a[c].dtype == "float64":
            aa, bb = a[c].to_numpy(), b[c].to_numpy()
            both_nan = np.isnan(aa) & np.isnan(bb)
            exact = (aa == bb) | both_nan
            if not exact.all():
                close = np.isclose(aa, bb, rtol=1e-12, atol=1e-12, equal_nan=True)
                worst = np.nanmax(np.abs(aa - bb))
                assert close.all(), f"{name}.{c}: max abs diff {worst}"
                raise AssertionError(
                    f"{name}.{c}: values only approx-equal (max diff {worst}) — "
                    "driver hash would fail; make the expression exact"
                )
        else:
            mism = (a[c].fillna("<NULL>") != b[c].fillna("<NULL>"))
            if mism.any():
                i = int(np.argmax(mism.to_numpy()))
                raise AssertionError(
                    f"{name}.{c}: mismatch at sorted row {i}: "
                    f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                )


def check_query(spark, name: str, sf_dir: str) -> int:
    """Run spec's Spark query + oracle and compare. Returns row count."""
    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS

    spec = QUERY_SPECS[name]
    sdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0
        return len(sdf)
    con = duck_connection(sf_dir)
    try:
        odf = con.sql(spec.oracle).df()
    finally:
        con.close()
    compare_frames(sdf, odf, name)
    return len(sdf)
