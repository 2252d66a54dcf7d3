"""Stream identity for batch-addressed exactly-once sinks.

Structured Streaming batch ids are unique only within one checkpoint
lineage: they restart at 0 when a checkpoint dir is lost or recreated,
and two streams can feed one store. Every sink in this package that
addresses an effect by batch id (ledger run ids, ``batch=<id>`` output
dirs, gram-index partitions) therefore scopes the id with this tag —
a uuid minted on first use and stored INSIDE the checkpoint dir, so it
has exactly the checkpoint's lifetime: restarts of the same stream
reuse it (replays stay idempotent, overwriting their own effect), while
a recreated checkpoint — same path or not — or a second stream mints a
fresh tag and can never silently overwrite or suppress another lineage's
data. On a non-posix checkpoint filesystem the fallback is a digest of
the path, which still separates distinct streams (the common hazard).
"""

from __future__ import annotations

import hashlib
import os
import uuid


def stream_identity(checkpoint_dir: str) -> str:
    """A 12-hex tag with the checkpoint's lifetime (see module doc)."""
    token_path = os.path.join(checkpoint_dir, "_lrdi_stream_id")
    try:
        with open(token_path) as fh:
            tag = fh.read().strip()
            if tag:
                return tag
    except OSError:
        pass
    tag = uuid.uuid4().hex[:12]
    try:
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(token_path, "w") as fh:
            fh.write(tag)
        return tag
    except OSError:
        return hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]
