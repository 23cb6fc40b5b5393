"""Scratch-directory policy for the bounded streaming drains.

Every registered ``stream_*_live`` query starts a Structured Streaming
job, drains it with ``availableNow``, and stops — its checkpoint,
spool, and snapshot-delta directories live exactly as long as the
function call.  For that EPHEMERAL scratch, a RAM-backed filesystem is
free speed: measured on the sf0.1 drains, pointing the checkpoint at
``/dev/shm`` instead of a disk-backed ``/tmp`` saves 10-18% wall clock
(stream_cdc_apply_live 2.72s -> 2.22s, stream_dedup_live 1.32s ->
1.14s; fsync-heavy commit-log writes dominate the difference).

Production streaming checkpoints are DURABLE state — they must survive
driver restarts and belong on durable storage (HDFS/S3/EBS); this
policy applies only to drains whose checkpoint lifetime is the call.
An explicit ``$TMPDIR`` always wins, so operators can redirect scratch
without touching code.
"""

from __future__ import annotations

import os
import tempfile


def scratch_base() -> str:
    """Base directory for ephemeral drain scratch: ``$TMPDIR`` when the
    user set one, else ``/dev/shm`` when present and writable, else the
    platform default temp dir."""
    # Read $TMPDIR directly: tempfile.gettempdir() caches its answer
    # process-wide at FIRST call, so an override exported after any
    # earlier gettempdir() call would be silently ignored.  Validate
    # it the way gettempdir validates its candidates (isdir + W_OK):
    # a $TMPDIR pointing at a missing/unwritable path falls through to
    # /dev/shm / platform default instead of making every drain's
    # mkdtemp raise (ADVICE r7).
    tmpdir = os.environ.get("TMPDIR")
    if tmpdir and os.path.isdir(tmpdir) and os.access(tmpdir, os.W_OK):
        return tmpdir
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()
