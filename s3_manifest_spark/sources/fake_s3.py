"""In-memory stand-in for the S3 ``list_objects_v2`` API.

Dev/test fixture (no S3 or moto in this container): implements exactly
the request/response subset the connector uses — Prefix, Delimiter,
MaxKeys, ContinuationToken, IsTruncated, Contents, CommonPrefixes —
with S3's real semantics (lexicographic key order, token = resume
position).  Lives in the package (not tests/) so Spark executors can
unpickle the client factory by module reference.
"""

from __future__ import annotations

import datetime as dt
from bisect import bisect_left, bisect_right


def _succ(prefix: str) -> str | None:
    """Smallest string strictly greater than EVERY string with this
    prefix — the exclusive upper bound of the prefix's key range.

    Increment the rightmost code point that is below U+10FFFF and
    truncate after it (skipping into the surrogate gap is avoided for
    hygiene, though keys here are only compared, never encoded).  A
    ``prefix + "￿"`` sentinel is NOT a valid bound: keys with
    astral-plane code points (≥ U+10000) after the prefix sort above
    it, which previously made the delimiter group-skip loop forever
    and the ``hi`` bound silently drop astral keys.  Returns None when
    no finite bound exists (all code points are U+10FFFF)."""
    for j in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[j])
        if c < 0x10FFFF:
            nxt = 0xE000 if c == 0xD7FF else c + 1
            return prefix[:j] + chr(nxt)
    return None


class FakeS3Client:
    """Minimal ListObjectsV2 over a static {bucket: {key: (size, mtime)}}."""

    def __init__(self, buckets: dict[str, dict[str, tuple[int, dt.datetime]]]):
        self._buckets = {
            b: dict(sorted(objs.items())) for b, objs in buckets.items()
        }

    def list_objects_v2(self, **kw):
        bucket = kw["Bucket"]
        prefix = kw.get("Prefix", "")
        delimiter = kw.get("Delimiter")
        max_keys = kw.get("MaxKeys", 1000)
        token = kw.get("ContinuationToken", "")
        # Real-S3 semantics: StartAfter begins the listing STRICTLY
        # after the given key and is ignored once a ContinuationToken
        # is present (the token already encodes the position).
        start_after = "" if token else kw.get("StartAfter", "")

        objs = self._buckets[bucket]
        keys = list(objs.keys())
        lo = bisect_left(keys, max(prefix, token))
        if start_after:
            lo = max(lo, bisect_right(keys, start_after))
        if prefix:
            end = _succ(prefix)
            hi = bisect_left(keys, end, lo) if end is not None else len(keys)
        else:
            hi = len(keys)

        contents, common, seen_prefixes = [], [], set()
        i = lo
        emitted = 0
        while i < hi and emitted < max_keys:
            k = keys[i]
            if delimiter:
                rest = k[len(prefix):]
                d = rest.find(delimiter)
                if d >= 0:
                    cp = prefix + rest[: d + len(delimiter)]
                    if cp not in seen_prefixes:
                        seen_prefixes.add(cp)
                        common.append({"Prefix": cp})
                        emitted += 1
                    # Skip the whole group via the successor-prefix
                    # bound; max(·, i + 1) guarantees progress even if
                    # a bound ever degenerates.
                    end = _succ(cp)
                    skip = bisect_left(keys, end, i, hi) if end is not None else hi
                    i = max(skip, i + 1)
                    continue
            size, mtime = objs[k]
            contents.append({"Key": k, "Size": size, "LastModified": mtime})
            emitted += 1
            i += 1

        truncated = i < hi
        resp = {
            "IsTruncated": truncated,
            "Contents": contents,
            "CommonPrefixes": common,
            "KeyCount": emitted,
        }
        if truncated:
            resp["NextContinuationToken"] = keys[i]
        return resp


import functools


@functools.lru_cache(maxsize=4)
def synth_bucket(n: int = 2500) -> dict[str, dict[str, tuple[int, dt.datetime]]]:
    """Deterministic fake bucket: n keys across nested prefixes plus
    root-level objects — exercises sharding, pagination, and delimiter
    grouping.  Cached so reused executor workers (and repeated test
    clients) don't rebuild large buckets per task — clients never
    mutate it (FakeS3Client copies on construction)."""
    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    objs: dict[str, tuple[int, dt.datetime]] = {}
    for i in range(n):
        top = f"dir{i % 7}"
        sub = f"sub{i % 13}"
        objs[f"{top}/{sub}/file-{i:06d}.parquet"] = (
            (i * 37) % 100_000,
            epoch + dt.timedelta(minutes=i),
        )
    for i in range(20):
        objs[f"rootfile-{i:02d}.txt"] = (i, epoch + dt.timedelta(days=i))
    return {"fake-bucket": objs}


def fake_client_factory():
    """Picklable factory for executor-side use (module-level by design)."""
    return FakeS3Client(synth_bucket())


def custom_client_factory(buckets):
    """Picklable factory over an arbitrary bucket dict (tests with
    adversarial keys — e.g. astral-plane code points)."""
    return functools.partial(FakeS3Client, buckets)


class LatentFakeS3Client(FakeS3Client):
    """Fake client with a simulated per-request round trip — for
    benchmarking listing strategies against realistic S3 RTTs."""

    def __init__(self, buckets, rtt_ms: float):
        super().__init__(buckets)
        self._rtt_s = rtt_ms / 1000.0

    def list_objects_v2(self, **kw):
        import time

        time.sleep(self._rtt_s)
        return super().list_objects_v2(**kw)


@functools.lru_cache(maxsize=8)
def shared_latent_client(n: int = 2500, rtt_ms: float = 0.0) -> LatentFakeS3Client:
    """One client per (n, rtt) per PROCESS: reused executor workers get
    a cache hit instead of re-sorting an n-key bucket per task.  Safe
    because clients are read-only after construction."""
    return LatentFakeS3Client(synth_bucket(n), rtt_ms)
