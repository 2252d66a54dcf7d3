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
data.

The token is written through the CHECKPOINT'S filesystem, not the
driver's: production checkpoints are URIs (``hdfs://``, ``s3a://``) or
shared mounts, and a driver-local token would (a) survive a checkpoint
recreation it must not survive, and (b) vanish on driver failover,
minting a new tag mid-lineage so a replayed in-flight batch lands under
a new address and double-applies. A URI-schemed path goes through the
Hadoop FileSystem resolved FROM that URI (exactly where the checkpoint
state itself lives); a plain local path uses posix I/O. There is no
silent digest fallback for URIs — if the checkpoint FS cannot be
reached the sink must not start, because every exactly-once guarantee
downstream hangs off this token's lifetime being the checkpoint's.
"""

from __future__ import annotations

import os
import re
import uuid

# Real URI scheme per RFC 3986 (≥2 chars, so a windows drive letter
# never matches). file: URIs take the Hadoop path too — same semantics,
# one code path for anything schemed.
_URI_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]+:")

_TOKEN_NAME = "_lrdi_stream_id"


def stream_identity(checkpoint_dir: str) -> str:
    """A 12-hex tag with the checkpoint's lifetime (see module doc)."""
    if _URI_SCHEME.match(checkpoint_dir):
        return _identity_on_checkpoint_fs(checkpoint_dir)
    return _identity_posix(checkpoint_dir)


def _read_or_fail(read_once, token_desc: str) -> str:
    """Re-read a token another driver just minted. A few bounded retries
    cover the winner's create→write window; an empty token after that is
    corrupt state (crash mid-mint, or truncation) and must surface — a
    silent re-mint would fork the stream identity and double-apply any
    replayed in-flight batch."""
    import time

    for _ in range(5):
        tag = read_once()
        if tag:
            return tag
        time.sleep(0.1)
    raise RuntimeError(
        f"stream identity token {token_desc} exists but is empty — "
        f"corrupt checkpoint state; refusing to re-mint over it"
    )


def _identity_posix(checkpoint_dir: str) -> str:
    token_path = os.path.join(checkpoint_dir, _TOKEN_NAME)

    def read_once() -> str | None:
        try:
            with open(token_path) as fh:
                return fh.read().strip() or None
        except OSError:
            return None

    tag = read_once()
    if tag:
        return tag
    os.makedirs(checkpoint_dir, exist_ok=True)
    new_tag = uuid.uuid4().hex[:12]
    try:
        # O_EXCL: exactly one of two concurrently starting drivers mints;
        # the loser re-reads the winner's tag instead of silently
        # overwriting it with a different one.
        fd = os.open(token_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return _read_or_fail(read_once, token_path)
    try:
        os.write(fd, new_tag.encode("utf-8"))
        os.fsync(fd)
    finally:
        os.close(fd)
    return new_tag


def _identity_on_checkpoint_fs(checkpoint_dir: str) -> str:
    """Read-or-mint the token via the Hadoop FileSystem the checkpoint
    URI resolves to (the same FS Structured Streaming writes its offsets
    and commits through), so token lifetime == checkpoint lifetime on
    every deployment shape. Raises if no SparkSession is active or the
    FS is unreachable — starting a batch-addressed sink without a
    durable stream identity would reintroduce the batch-0 clobber this
    module exists to prevent."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"stream_identity({checkpoint_dir!r}): URI checkpoint needs an "
            f"active SparkSession to reach the checkpoint filesystem"
        )
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(checkpoint_dir)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    token = jvm.org.apache.hadoop.fs.Path(hpath, _TOKEN_NAME)

    def read_once() -> str | None:
        if not fs.exists(token):
            return None
        stream = fs.open(token)
        try:
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            tag = reader.readLine()
        finally:
            stream.close()
        return tag.strip() if tag and tag.strip() else None

    if fs.exists(token):
        # An existing token is read, never overwritten; existing-but-empty
        # is corrupt state and surfaces via _read_or_fail.
        return _read_or_fail(read_once, str(token))
    new_tag = uuid.uuid4().hex[:12]
    fs.mkdirs(hpath)
    try:
        # overwrite=False: minting is first-writer-wins, so two drivers in
        # a failover overlap can never hold different tags with one
        # silently clobbered.
        out = fs.create(token, False)
    except Exception as e:  # FileAlreadyExistsException via py4j
        if "AlreadyExists" in type(e).__name__ or "AlreadyExists" in str(e):
            return _read_or_fail(read_once, str(token))
        raise
    try:
        out.write(bytearray(new_tag.encode("utf-8")))
    finally:
        out.close()
    return new_tag
