"""Snapshot / restore: point-in-time copies of an index directory into
a snapshot repository, with file-level incrementality.

ES snapshots (public semantics: the snapshot/restore API) work because
Lucene segment files are immutable once written — a repository stores
each file once and snapshot manifests reference them. This engine has
the same property: segment/sidecar parquet part-files are written once
per generation and never mutated in place (compaction and upserts add
NEW files and flip stats.json), so the identical design applies:

- ``repo/blobs/<key>`` — one blob per unique (relpath, size, mtime)
  triple. A second snapshot of a grown index copies ONLY the new
  generation's files; unchanged part-files are shared by reference.
- ``repo/snapshots/<name>.json`` — the manifest: every file in the
  index at snapshot time → its blob key. Written atomically LAST, so a
  crashed snapshot leaves unreferenced blobs (collected by ``gc``),
  never a dangling manifest.

Restore materializes the manifest into a fresh directory; the restored
index is loadable with ``SegmentIndex.load`` and byte-identical to the
source at snapshot time (pinned by test).

Scale note: the snapshot itself is driver-side METADATA work plus file
copies — at real scale the copies are object-store server-side copies
(s3 CopyObject) keyed the same way; this implementation uses local
filesystem copies (the sandbox has no object store), with the repo
layout and incrementality contract being the design artifact.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def _walk(index_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            p = os.path.join(root, f)
            out.append(os.path.relpath(p, index_dir))
    return sorted(out)


def _blob_key(relpath: str, size: int, mtime_ns: int) -> str:
    h = hashlib.sha256(f"{relpath}@{size}@{mtime_ns}".encode()).hexdigest()[:32]
    return h


def snapshot(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot ``index_dir`` into ``repo_dir`` as ``name``. Returns the
    manifest dict (files, blobs copied vs reused). Incremental: a blob
    whose (relpath, size, mtime) triple is already in the repo is
    reused, not re-copied."""
    if "/" in name or not name:
        raise ValueError(f"bad snapshot name {name!r}")
    blobs = os.path.join(repo_dir, "blobs")
    snaps = os.path.join(repo_dir, "snapshots")
    os.makedirs(blobs, exist_ok=True)
    os.makedirs(snaps, exist_ok=True)
    mpath = os.path.join(snaps, f"{name}.json")
    if os.path.exists(mpath):
        raise ValueError(f"snapshot {name!r} already exists")
    files = {}
    copied = reused = 0
    for rel in _walk(index_dir):
        src = os.path.join(index_dir, rel)
        st = os.stat(src)
        key = _blob_key(rel, st.st_size, st.st_mtime_ns)
        dst = os.path.join(blobs, key)
        if os.path.exists(dst):
            reused += 1
        else:
            shutil.copyfile(src, dst)
            copied += 1
        files[rel] = {"blob": key, "size": st.st_size}
    manifest = {
        "name": name,
        "source": os.path.abspath(index_dir),
        "ts": time.time(),
        "n_files": len(files),
        "copied": copied,
        "reused": reused,
        "files": files,
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, mpath)  # manifest lands atomically, after all blobs
    return manifest


def list_snapshots(repo_dir: str) -> list[dict]:
    snaps = os.path.join(repo_dir, "snapshots")
    out = []
    if not os.path.isdir(snaps):
        return out
    for f in sorted(os.listdir(snaps)):
        if f.endswith(".json"):
            with open(os.path.join(snaps, f)) as fh:
                m = json.load(fh)
            out.append(
                {k: m[k] for k in ("name", "ts", "n_files", "copied", "reused")}
            )
    return out


def restore(repo_dir: str, name: str, target_dir: str) -> str:
    """Materialize snapshot ``name`` into ``target_dir`` (must not
    exist — ES refuses to restore onto a live index too)."""
    mpath = os.path.join(repo_dir, "snapshots", f"{name}.json")
    if not os.path.exists(mpath):
        raise ValueError(f"no snapshot {name!r} in {repo_dir}")
    if os.path.exists(target_dir):
        raise ValueError(f"restore target {target_dir} already exists")
    with open(mpath) as f:
        manifest = json.load(f)
    for rel, meta in manifest["files"].items():
        src = os.path.join(repo_dir, "blobs", meta["blob"])
        dst = os.path.join(target_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        if os.path.getsize(dst) != meta["size"]:
            raise IOError(f"blob size mismatch restoring {rel}")
    return target_dir


def delete_snapshot(repo_dir: str, name: str) -> None:
    mpath = os.path.join(repo_dir, "snapshots", f"{name}.json")
    if not os.path.exists(mpath):
        raise ValueError(f"no snapshot {name!r}")
    os.remove(mpath)


def gc(repo_dir: str) -> int:
    """Delete blobs referenced by NO manifest (crashed snapshots,
    deleted snapshots). Returns the number removed."""
    blobs = os.path.join(repo_dir, "blobs")
    if not os.path.isdir(blobs):
        return 0
    live: set[str] = set()
    snaps = os.path.join(repo_dir, "snapshots")
    if os.path.isdir(snaps):
        for f in os.listdir(snaps):
            if f.endswith(".json"):
                with open(os.path.join(snaps, f)) as fh:
                    m = json.load(fh)
                live.update(meta["blob"] for meta in m["files"].values())
    removed = 0
    for b in os.listdir(blobs):
        if b not in live:
            os.remove(os.path.join(blobs, b))
            removed += 1
    return removed
