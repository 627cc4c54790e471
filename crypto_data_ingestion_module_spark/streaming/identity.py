"""Stream-scoped ledger identity shared by every foreachBatch sink.

The snapshot-lake replay ledger dedupes on ``applied_id = f"{qid}-
{batch_id}"`` (Delta's txnAppId discipline).  qid used to be
``md5(checkpoint_path)`` alone, which has a silent-drop footgun
(ADVICE r8): delete and recreate the SAME checkpoint path against an
existing partial lake and the new stream restarts batch ids at 0 under
the old qid — its first micro-batches collide with the previous
incarnation's ledger entries and are dropped as replays.

Fix: fold the checkpoint's own creation marker into the hash.  Spark
writes ``<checkpoint>/metadata`` (a StreamMetadata JSON holding the
query ``id``) when the query starts, BEFORE any batch executes; the id
is minted once per checkpoint-directory creation and persists across
restarts of the same directory.  That is exactly the identity we need:
restart of the same checkpoint -> same qid (replay dedup keeps
working); recreated checkpoint path -> fresh qid (no collision).

``stream_qid`` must be called from INSIDE the foreachBatch sink — at
plan-build time a brand-new checkpoint has no metadata file yet, so
the marker would read empty there and restarts would change identity.

Transition note: lakes written before this change carry path-only ids.
A stream restarted across the upgrade re-scopes its ids, so one
batch replayed exactly across the upgrade boundary can append twice.
Every downstream consumer absorbs that by construction (keep-last
upsert is idempotent by key; MG partials only widen the pass-1
candidate set of the exact two-pass recipe; HLL register-max union is
idempotent), but the window exists and is documented here rather than
hidden.
"""

from __future__ import annotations

import hashlib
import json
import os


def stream_qid(checkpoint: str) -> str:
    """12-hex stream identity: md5(checkpoint path + creation marker).

    Falls back to the path-only hash when the metadata file is
    unreadable (e.g. a non-posix checkpoint URI) — that keeps the old
    behavior, including its recycled-path caveat, instead of failing
    the sink.
    """
    marker = ""
    try:
        with open(os.path.join(checkpoint, "metadata")) as fh:
            marker = json.load(fh).get("id", "")
    except (OSError, ValueError):
        marker = ""
    return hashlib.md5(f"{checkpoint}|{marker}".encode()).hexdigest()[:12]
