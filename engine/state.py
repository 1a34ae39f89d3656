"""Build state: lineage manifests, atomic publish, checkpoint/resume.

The reference's protocol (our template, not our code):
- ``known.list`` append + ``dirty.list`` in-flight markers
  (DefaultStateRepository.java:40-116),
- commit = write temp bundle then atomic ``Files.move`` swap
  (DefaultInvertedIndex.java:260-264),
- ``RECOVER`` deletes dirty/lingering items (StrucmotifUpdate.java:532-546).

Ours: every index part is published with a *manifest-last* two-step — payload
file written to ``<name>.tmp`` then renamed, manifest JSON written after — so a
part is "committed" iff its manifest exists and matches. Resume = skip parts
with valid manifests; recover = delete payloads without manifests (orphans).
Ray Data gives intra-run task retry for free; THIS is the cross-run story.
"""

from __future__ import annotations

import json
import os
import zlib


def atomic_write_bytes(data: bytes, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def manifest_path(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, f"segment-{part:05d}.manifest.json")


def segment_path(index_dir: str, part: int) -> str:
    return os.path.join(index_dir, f"segment-{part:05d}.parquet")


def write_part_manifest(index_dir: str, part: int, info: dict) -> None:
    payload = segment_path(index_dir, part)
    with open(payload, "rb") as f:
        crc = zlib.crc32(f.read())
    info = dict(info, part=part, checksum=crc, status="committed")
    atomic_write_bytes(json.dumps(info, sort_keys=True).encode(), manifest_path(index_dir, part))


def committed_parts(index_dir: str, verify_checksum: bool = False) -> dict[int, dict]:
    """part -> manifest for every validly committed part."""
    out: dict[int, dict] = {}
    if not os.path.isdir(index_dir):
        return out
    for name in os.listdir(index_dir):
        if not (name.startswith("segment-") and name.endswith(".manifest.json")):
            continue
        try:
            with open(os.path.join(index_dir, name)) as f:
                info = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        part = int(info.get("part", -1))
        payload = segment_path(index_dir, part)
        if info.get("status") != "committed" or not os.path.exists(payload):
            continue
        if verify_checksum:
            with open(payload, "rb") as f:
                if zlib.crc32(f.read()) != info.get("checksum"):
                    continue
        out[part] = info
    return out


def recover(index_dir: str) -> list[str]:
    """Delete orphan payloads (no/invalid manifest) + stale tmp files, and
    roll back a docmap swap that crashed mid-flight (update._recover_docmap_swap).

    Returns the deleted paths (RECOVER analog: purge lingering entries)."""
    deleted: list[str] = []
    if not os.path.isdir(index_dir):
        return deleted
    ddir = os.path.join(index_dir, "docmap")
    if os.path.isdir(ddir + ".old"):
        from .update import _recover_docmap_swap

        _recover_docmap_swap(ddir)
        deleted.append(ddir + ".old")
    good = committed_parts(index_dir)
    for name in sorted(os.listdir(index_dir)):
        path = os.path.join(index_dir, name)
        if name.endswith(".tmp"):
            os.remove(path)
            deleted.append(path)
        elif name.startswith("segment-") and name.endswith(".parquet"):
            part = int(name[len("segment-") : -len(".parquet")])
            if part not in good:
                os.remove(path)
                deleted.append(path)
    return deleted


def write_stats(index_dir: str, stats: dict) -> None:
    atomic_write_bytes(json.dumps(stats, sort_keys=True).encode(), os.path.join(index_dir, "stats.json"))


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)
