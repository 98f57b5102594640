"""Snapshot / restore: incremental copies, corruption detection, and a
restored index that answers queries identically."""

import os
import shutil

import numpy as np
import pytest

from elasticsearch_assets_ray.index.snapshot import restore, snapshot, verify
from elasticsearch_assets_ray.query.engine import Searcher


def test_snapshot_restore_roundtrip(built_index, tmp_path):
    idx, _ = built_index
    repo = str(tmp_path / "repo")
    man1 = snapshot(idx, repo)
    assert man1["files_copied"] > 0 and man1["files_skipped"] == 0
    # incremental: a second snapshot of the unchanged index copies nothing
    man2 = snapshot(idx, repo)
    assert man2["files_copied"] == 0
    assert man2["files_skipped"] == len(man2["files"])
    verify(repo)

    before = Searcher(idx).search("def load index", k=8)
    target = str(tmp_path / "restored")
    restore(repo, target)
    after = Searcher(target).search("def load index", k=8)
    assert before["doc_id"].to_pylist() == after["doc_id"].to_pylist()
    np.testing.assert_array_equal(
        before["score"].to_numpy(zero_copy_only=False),
        after["score"].to_numpy(zero_copy_only=False),
    )
    # restore removes stray files so the target is the EXACT snapshot set
    stray = os.path.join(target, "segments", "stray.bin")
    with open(stray, "wb") as f:
        f.write(b"junk")
    restore(repo, target)
    assert not os.path.exists(stray)


def test_snapshot_detects_corruption(built_index, tmp_path):
    idx, _ = built_index
    repo = str(tmp_path / "repo2")
    man = snapshot(idx, repo)
    victim = next(r for r in man["files"] if r.startswith("docstore/"))
    with open(os.path.join(repo, victim), "r+b") as f:
        f.seek(0)
        f.write(b"\x00\x00\x00\x00")
    with pytest.raises(RuntimeError, match="corrupt"):
        verify(repo)
    with pytest.raises(RuntimeError, match="corrupt"):
        restore(repo, str(tmp_path / "never"))
    # a re-snapshot heals the repository
    snapshot(idx, repo)
    verify(repo)


def test_snapshot_requires_an_index(tmp_path):
    with pytest.raises(ValueError, match="not a built index"):
        snapshot(str(tmp_path), str(tmp_path / "repo"))
