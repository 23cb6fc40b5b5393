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


def build_spool(
    name: str,
    src_paths: list[str] | tuple[str, ...],
    version: str,
    build,
) -> str:
    """Concurrency-safe, content-fingerprinted spool builder — the ONE
    protocol every staged stream-source directory uses (r13: the
    hardening was previously copy-pasted per builder and three of five
    copies had drifted).

    Guarantees:

    - **identity**: the spool path encodes a sha256 over every source
      file's absolute path, mtime_ns, and size, plus a writer-format
      ``version`` string — regenerated fixtures, same-basename trees
      from other roots, and format changes all get fresh spools; the
      uid in the dirname keeps shared-tmpfs paths per-user.
    - **atomic appearance**: ``build(staging_dir)`` writes into a
      builder-private staging directory; the ready marker is created
      INSIDE staging and the whole directory is ``os.rename``d into
      place — a reader can never list half-written chunk files.
    - **race-safe**: a builder that loses the rename keeps the
      winner's spool (identical content by fingerprint) and removes
      its own staging dir.
    - **self-healing**: a markerless directory at the final path
      (debris from a crashed pre-staging-era build) is cleared —
      with the marker re-checked immediately before removal, so a
      spool completed by a concurrent winner between the two checks
      is kept, not destroyed.

    ``build`` receives the staging directory path and must write the
    spool's data files into it (e.g. ``df.write.parquet(staging)`` or
    file copies).  Returns the ready spool path.
    """
    import hashlib
    import shutil
    import uuid

    parts = []
    for p in src_paths:
        st = os.stat(p)
        parts.append(f"{os.path.abspath(p)}|{st.st_mtime_ns}|{st.st_size}")
    tag = hashlib.sha256(("||".join(parts) + f"|{version}").encode()).hexdigest()[:16]
    spool = os.path.join(scratch_base(), f"smsp-{name}-{os.getuid()}-{tag}")
    done = os.path.join(spool, "_SPOOL_READY")
    if os.path.exists(done):
        return spool
    # Markerless debris: re-check the marker right before touching the
    # directory, then move it aside atomically and remove the moved
    # copy — never rmtree the live final path directly.
    if os.path.isdir(spool) and not os.path.exists(done):
        debris = f"{spool}.__debris_{uuid.uuid4().hex}__"
        try:
            os.rename(spool, debris)
            shutil.rmtree(debris, ignore_errors=True)
        except OSError:
            pass  # a concurrent builder renamed its spool in first
    if os.path.exists(done):
        return spool
    staging = f"{spool}.__build_{uuid.uuid4().hex}__"
    try:
        build(staging)
        open(os.path.join(staging, "_SPOOL_READY"), "w").close()
        os.rename(staging, spool)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(done):
            raise
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return spool
