"""Index snapshot / restore — the ES `_snapshot` repository analog.

ES snapshots are INCREMENTAL because Lucene segment files are immutable:
a snapshot copies only files the repository has not seen, and a restore
materializes a consistent file set.  This index has the same property
(segments / docstore parts / posting runs / vector sidecars are
write-once; only small manifests change), so:

- :func:`snapshot` copies the index tree into a repository directory,
  skipping files whose (size, content fingerprint) already match, and
  writes a ``snapshot.json`` manifest (file list + sha256) atomically —
  a torn snapshot is detectable and a re-run completes it.
- :func:`restore` validates every fingerprint BEFORE touching the
  target, then materializes the exact file set (removing files the
  snapshot does not contain).

Reference parity: the reference relies on ES for durability
(elasticsearch-store state records, SURVEY §2 T-row); this is the
native analog for the index artifacts themselves.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

SNAP_MANIFEST = "snapshot.json"


def _fingerprint(path: str) -> tuple[int, str]:
    h = hashlib.sha256()
    size = 0
    with open(path, "rb") as f:
        while True:
            b = f.read(1 << 20)
            if not b:
                break
            size += len(b)
            h.update(b)
    return size, h.hexdigest()


def _walk(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".tmp"):
                continue
            out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def snapshot(index_dir: str, repo_dir: str) -> dict:
    """Snapshot ``index_dir`` into ``repo_dir`` (incremental: files whose
    size+sha256 already match in the repo are skipped).  Returns the
    manifest with ``files_copied`` / ``files_skipped`` counters."""
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        raise ValueError(f"{index_dir} is not a built index (no manifest.json)")
    os.makedirs(repo_dir, exist_ok=True)
    entries = {}
    copied = skipped = 0
    for rel in _walk(index_dir):
        src = os.path.join(index_dir, rel)
        dst = os.path.join(repo_dir, rel)
        size, digest = _fingerprint(src)
        entries[rel] = {"size": size, "sha256": digest}
        if os.path.exists(dst):
            dsize, ddig = _fingerprint(dst)
            if (dsize, ddig) == (size, digest):
                skipped += 1
                continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dst), suffix=".tmp")
        os.close(fd)
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
        copied += 1
    man = {
        "version": 1,
        "source": os.path.abspath(index_dir),
        "files": entries,
        "files_copied": copied,
        "files_skipped": skipped,
    }
    fd, tmp = tempfile.mkstemp(dir=repo_dir, suffix=".tmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, os.path.join(repo_dir, SNAP_MANIFEST))
    return man


def verify(repo_dir: str) -> dict:
    """Validate every repository file against the snapshot manifest;
    raises on missing/corrupt files.  Returns the manifest."""
    with open(os.path.join(repo_dir, SNAP_MANIFEST)) as f:
        man = json.load(f)
    for rel, meta in man["files"].items():
        p = os.path.join(repo_dir, rel)
        if not os.path.exists(p):
            raise RuntimeError(f"snapshot missing file: {rel}")
        size, digest = _fingerprint(p)
        if size != meta["size"] or digest != meta["sha256"]:
            raise RuntimeError(f"snapshot file corrupt: {rel}")
    return man


def restore(repo_dir: str, target_dir: str) -> dict:
    """Materialize the snapshot at ``target_dir`` (exact file set: extra
    files are removed, every restored file fingerprint-checked first so
    a corrupt repository never half-overwrites a target)."""
    man = verify(repo_dir)
    os.makedirs(target_dir, exist_ok=True)
    wanted = set(man["files"])
    for rel in _walk(target_dir):
        if rel not in wanted and rel != SNAP_MANIFEST:
            os.remove(os.path.join(target_dir, rel))
    for rel in sorted(wanted):
        src = os.path.join(repo_dir, rel)
        dst = os.path.join(target_dir, rel)
        if os.path.exists(dst):
            dsize, ddig = _fingerprint(dst)
            if (dsize, ddig) == (
                man["files"][rel]["size"],
                man["files"][rel]["sha256"],
            ):
                continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dst), suffix=".tmp")
        os.close(fd)
        shutil.copyfile(src, tmp)
        os.replace(tmp, dst)
    return man
