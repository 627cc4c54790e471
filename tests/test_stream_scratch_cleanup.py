"""The staged streaming-input dirs and the last run's scratch must not
outlive the process (ADVICE r15): plans.extensions registers an atexit
hook that sweeps every registry.  Pure filesystem test — no Spark."""

import atexit

# queries first: extensions is registered from the BOTTOM of queries, so
# importing it directly would re-enter queries half-initialized
from crypto_data_ingestion_module_spark.plans import queries  # noqa: F401
from crypto_data_ingestion_module_spark.plans import extensions as ext


def test_cleanup_hook_removes_staged_and_scratch_dirs(tmp_path):
    stage = tmp_path / "sgraft_stream_curate_x" / "docs_in"
    stage.mkdir(parents=True)
    (stage / "d0.parquet").write_bytes(b"")
    run = tmp_path / "sgraft_stream_dedup_run_x"
    run.mkdir()
    ck = tmp_path / "sgraft_qc_ckpt_x"
    ck.mkdir()
    ext._STREAM_CURATE_FILES["__test__"] = str(stage)
    ext._STREAM_DEDUP_SCRATCH.append(str(run))
    ext._STREAM_QC_CKPTS.append(str(ck))

    ext._cleanup_stream_scratch()

    # the staged dir's mkdtemp PARENT goes, not just the landing dir
    assert not stage.parent.exists()
    assert not run.exists() and not ck.exists()
    assert "__test__" not in ext._STREAM_CURATE_FILES
    assert not ext._STREAM_DEDUP_SCRATCH and not ext._STREAM_QC_CKPTS


def test_cleanup_hook_is_registered_for_exit():
    # atexit keeps no public registry; unregister returns None either
    # way, but a registered callable can be unregistered exactly once —
    # re-register afterwards so the real process exit still sweeps.
    atexit.unregister(ext._cleanup_stream_scratch)
    atexit.register(ext._cleanup_stream_scratch)
    # tolerating a double sweep is part of the contract (ignore_errors)
    ext._cleanup_stream_scratch()
    ext._cleanup_stream_scratch()
