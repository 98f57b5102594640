"""Versioned keyed store with optimistic-concurrency updates — the
retry-on-conflict analog (K6, reference `update_retry_on_conflict`,
asset/src/elasticsearch_sender_api/schema.ts:41-49: ES retries a
scripted update when the doc's version changed between read and write).

This is the one surface where the Dataset API genuinely can't express
the semantics — concurrent read-modify-write against SHARED MUTABLE
state — so it is a named Ray actor (SURVEY.md's 'raw actors as a last
resort' case).  Bulk merges stay deterministic groupbys (stages.bulk);
this store covers the interactive/upsert-loop pattern.
"""

from __future__ import annotations

import ray


@ray.remote
class VersionedStore:
    """key → (version, value); compare-and-swap update API."""

    def __init__(self):
        self._d: dict = {}

    def get(self, key):
        """(version, value) or (0, None) when absent."""
        return self._d.get(key, (0, None))

    def put_if_version(self, key, value, expect_version: int) -> bool:
        """CAS write: succeeds iff the stored version still equals
        ``expect_version`` (0 = expect absent).  Returns success."""
        cur = self._d.get(key, (0, None))[0]
        if cur != expect_version:
            return False
        self._d[key] = (cur + 1, value)
        return True

    def mget(self, keys):
        return [self._d.get(k, (0, None)) for k in keys]

    def count(self) -> int:
        return len(self._d)


def update_with_retry(store, key, fn, retries: int = 3):
    """Optimistic read-modify-write: read (version, value), apply ``fn``,
    CAS-write; on conflict re-read and retry up to ``retries`` times
    (the reference's retry_on_conflict counter).  Returns the final
    value; raises RuntimeError when retries are exhausted."""
    for _ in range(retries + 1):
        version, value = ray.get(store.get.remote(key))
        new = fn(value)
        if ray.get(store.put_if_version.remote(key, new, version)):
            return new
    raise RuntimeError(
        f"update of {key!r} conflicted {retries + 1} times (retry_on_conflict exhausted)"
    )
