"""Index aliases: stable names over swappable index directories.

The Lucene/ES alias surface (zero-downtime reindex: build the new index
under a new path, then atomically repoint the alias — readers never see a
half-state), and the text analog of the reference's atomic temp->prod
bundle swap (strucmotif-search CORE/io/DefaultInvertedIndex.java:260-264:
the new ffindex bundle is fully written, then renamed over production).

A REGISTRY is a directory holding one ``aliases.json`` mapping alias ->
index path. Every mutation rewrites the whole file through
``state.atomic_write_bytes`` (temp + fsync + rename), so a crash at any
point leaves either the old or the new mapping, never a torn one — single
writer assumed, the same discipline as the index's own stats.json.

Alias names must not look like paths (no separators) so ``resolve`` can
accept EITHER an alias or a direct index path without ambiguity.
"""

from __future__ import annotations

import json
import os

from . import state

_FILE = "aliases.json"


def _path(registry: str) -> str:
    return os.path.join(registry, _FILE)


def _load(registry: str) -> dict[str, str]:
    p = _path(registry)
    if not os.path.exists(p):
        return {}
    with open(p, "rb") as f:
        data = json.load(f)
    if not isinstance(data, dict) or not all(
        isinstance(k, str) and isinstance(v, str) for k, v in data.items()
    ):
        raise ValueError(f"{p} is not an alias map")
    return data


def _check_name(alias: str) -> str:
    if not alias or os.sep in alias or "/" in alias or alias in (".", ".."):
        raise ValueError(f"alias name {alias!r} must be a bare name, not a path")
    return alias


def set_alias(registry: str, alias: str, index_dir: str) -> dict[str, str]:
    """Point ``alias`` at ``index_dir`` (creating or atomically swapping).
    The target must be a committed index (stats.json present) — an alias can
    never dangle at creation time. Returns the full mapping."""
    _check_name(alias)
    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        raise FileNotFoundError(
            f"alias target {index_dir} is not a committed index (no stats.json)"
        )
    os.makedirs(registry, exist_ok=True)
    m = _load(registry)
    m[alias] = os.path.abspath(index_dir)
    state.atomic_write_bytes(
        json.dumps(m, indent=1, sort_keys=True).encode(), _path(registry)
    )
    return m


def remove_alias(registry: str, alias: str) -> dict[str, str]:
    m = _load(registry)
    if alias not in m:
        raise KeyError(f"alias {alias!r} not in registry {registry}")
    del m[alias]
    state.atomic_write_bytes(
        json.dumps(m, indent=1, sort_keys=True).encode(), _path(registry)
    )
    return m


def list_aliases(registry: str) -> dict[str, str]:
    return dict(sorted(_load(registry).items()))


def resolve(name: str, registry: str | None = None) -> str:
    """``name`` -> index directory. A bare name resolves through the
    registry FIRST (a same-named directory in the CWD must not shadow a
    registered alias — ADVICE r4); names containing a separator pass
    through as paths. A bare name absent from the registry falls back to
    path semantics only when it IS a directory. A registered alias whose
    target has since lost its stats.json raises — a dangling alias must
    fail loudly, not fall back."""
    looks_path = os.sep in name or "/" in name
    if registry is not None and not looks_path:
        m = _load(registry)
        if name in m:
            target = m[name]
            if not os.path.exists(os.path.join(target, "stats.json")):
                raise FileNotFoundError(
                    f"alias {name!r} -> {target} is dangling (no stats.json)"
                )
            return target
        if not os.path.isdir(name):
            raise KeyError(f"{name!r} is neither an alias in {registry} nor a path")
    return name
