"""stream_qid unit semantics (streaming/identity.py) — pure filesystem,
no Spark session."""

import json
import os

from crypto_data_ingestion_module_spark.streaming.identity import stream_qid


def _mk_checkpoint(path, qid="abc-123"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "metadata"), "w") as fh:
        json.dump({"id": qid}, fh)


def test_file_scheme_reads_the_creation_marker(tmp_path):
    # ADVICE r9: a file: URI checkpoint must NOT silently fall back to
    # path-only identity — the marker must be read through the scheme.
    ck = str(tmp_path / "ck")
    _mk_checkpoint(ck, "query-uuid-1")
    plain = stream_qid(ck)
    # same dir via file: URIs — all read the same marker; ids differ
    # from each other only through the checkpoint STRING (documented),
    # but every one must differ from what a marker-less fallback of the
    # same string would give
    for uri in (f"file:{ck}", f"file://{ck}", f"file:///{ck.lstrip('/')}"):
        with_marker = stream_qid(uri)
        os.rename(os.path.join(ck, "metadata"), os.path.join(ck, "m.bak"))
        fallback = stream_qid(uri)
        os.rename(os.path.join(ck, "m.bak"), os.path.join(ck, "metadata"))
        assert with_marker != fallback, uri
    assert plain == stream_qid(ck)  # deterministic


def test_recreated_checkpoint_changes_identity(tmp_path):
    ck = str(tmp_path / "ck2")
    _mk_checkpoint(ck, "first-incarnation")
    q1 = stream_qid(ck)
    _mk_checkpoint(ck, "second-incarnation")
    q2 = stream_qid(ck)
    assert q1 != q2  # fresh creation marker -> fresh ledger identity


def test_percent_encoded_file_uri_reads_the_marker(tmp_path):
    # ADVICE r10: Spark percent-encodes special chars in file: URIs;
    # the marker must still be found through %20 etc.
    ck = str(tmp_path / "ck with space")
    _mk_checkpoint(ck, "encoded-incarnation")
    uri = "file://" + ck.replace(" ", "%20")
    with_marker = stream_qid(uri)
    os.rename(os.path.join(ck, "metadata"), os.path.join(ck, "m.bak"))
    assert stream_qid(uri) != with_marker  # marker was genuinely read


def test_remote_host_netloc_stays_path_only(tmp_path):
    # file://host/p points at ANOTHER machine's fs: reading /host/p
    # locally would be wrong, so it must take the warned fallback.
    ck = str(tmp_path / "ck3")
    _mk_checkpoint(ck, "local-marker")
    remote = stream_qid(f"file://otherhost{ck}")
    # stable (path-only), and NOT influenced by the local metadata file
    assert remote == stream_qid(f"file://otherhost{ck}")
    os.remove(os.path.join(ck, "metadata"))
    assert remote == stream_qid(f"file://otherhost{ck}")


def test_missing_metadata_falls_back_to_path_only(tmp_path):
    ck = str(tmp_path / "nometa")
    os.makedirs(ck)
    # no metadata file: path-only hash, stable
    assert stream_qid(ck) == stream_qid(ck)
