"""ILM-style rollover groups: one WRITE index at a time, capped by a
max-docs policy; reads federate across every sealed member.

The Lucene/ES index-lifecycle-management rollover pattern (an alias whose
write index rolls to a fresh index when a condition trips, while search
spans all generations), and the lifecycle automation over this engine's
existing primitives: ``build_index`` (new member), ``update.add_documents``
(append to the write member), ``federate.Federation`` (cross-member search
with union stats — bit-identical to one monolithic build, pytest-gated).

Group layout::

    GROUP/group.json          {"max_docs": N, "members": ["m-000001", ...]}
    GROUP/m-000001/           a normal index dir (newest member = write index)

``group.json`` mutations go through ``state.atomic_write_bytes`` AFTER the
member build/add commits, so a crash between the two leaves a complete
member on disk and a group file that simply doesn't reference it yet — the
next ``add`` rebuilds it under the next member name; stale unreferenced
dirs are inert (the reference's recover-diff discipline,
UPD/StrucmotifUpdate.java:532-546).

DocID disjointness across members — the federation's hard requirement —
comes from the caller's ``id_col`` contract (globally unique document ids,
the same contract every multi-index surface here uses); Federation re-probes
bounds at query time and refuses on collision rather than mis-scoring.
"""

from __future__ import annotations

import json
import os

from . import state

_FILE = "group.json"


def _gpath(group_dir: str) -> str:
    return os.path.join(group_dir, _FILE)


def _load(group_dir: str) -> dict:
    with open(_gpath(group_dir), "rb") as f:
        g = json.load(f)
    if not isinstance(g.get("members"), list) or "max_docs" not in g:
        raise ValueError(f"{_gpath(group_dir)} is not a rollover group file")
    return g


def _save(group_dir: str, g: dict) -> None:
    state.atomic_write_bytes(
        json.dumps(g, indent=1, sort_keys=True).encode(), _gpath(group_dir)
    )


def init_group(group_dir: str, max_docs: int) -> dict:
    if max_docs < 1:
        raise ValueError("max_docs must be >= 1")
    if os.path.exists(_gpath(group_dir)):
        raise FileExistsError(f"{group_dir} is already a rollover group")
    os.makedirs(group_dir, exist_ok=True)
    g = {"max_docs": int(max_docs), "members": []}
    _save(group_dir, g)
    return g


def member_dirs(group_dir: str) -> list[str]:
    g = _load(group_dir)
    return [os.path.join(group_dir, m) for m in g["members"]]


def status(group_dir: str) -> dict:
    g = _load(group_dir)
    rows = []
    for m in g["members"]:
        st = state.read_stats(os.path.join(group_dir, m))
        rows.append({"member": m, "n_docs": int(st["n_docs"])})
    return {"max_docs": g["max_docs"], "members": rows}


def add(group_dir: str, source, *, id_col: str = "doc_id", **build_kwargs) -> dict:
    """Ingest ``source`` (a Ray Dataset of documents) into the group:
    append to the newest member unless it has already reached ``max_docs``
    (the rollover condition, checked BEFORE the write like ES), in which
    case a fresh member index is built from this delta. Returns
    {"member": name, "rolled": bool, "n_docs": member doc count after}."""
    from .build import build_index
    from .update import add_documents

    g = _load(group_dir)
    rolled = False
    if g["members"]:
        newest = os.path.join(group_dir, g["members"][-1])
        if int(state.read_stats(newest)["n_docs"]) < g["max_docs"]:
            add_documents(newest, source, id_col=id_col)
            return {
                "member": g["members"][-1],
                "rolled": False,
                "n_docs": int(state.read_stats(newest)["n_docs"]),
            }
        rolled = True
    name = f"m-{len(g['members']) + 1:06d}"
    dst = os.path.join(group_dir, name)
    if os.path.exists(dst):
        # a crashed previous add left an UNREFERENCED member dir (the group
        # file is the publish point): it may hold a different delta's
        # half-built state, and build_index would resume into it — wipe it
        # and build fresh (the recover-diff rule: unreferenced = garbage)
        import shutil

        shutil.rmtree(dst)
    build_kwargs.setdefault("n_buckets", 8)
    build_kwargs.setdefault("n_salts", 4)
    build_index(source, dst, id_col=id_col, **build_kwargs)
    g["members"].append(name)
    _save(group_dir, g)  # member committed first; group file is the publish
    return {
        "member": name,
        "rolled": rolled,
        "n_docs": int(state.read_stats(dst)["n_docs"]),
    }


def topk(group_dir: str, query_text: str, k: int, rank_round: int | None = None):
    """Search the whole group: one member queries directly, two or more
    federate with union stats (scores bit-identical to a monolithic build)."""
    from .federate import Federation
    from .query import Bm25Index

    dirs = member_dirs(group_dir)
    if not dirs:
        raise ValueError(f"rollover group {group_dir} has no members")
    if len(dirs) == 1:
        return Bm25Index(dirs[0]).topk(query_text, k, rank_round=rank_round)
    return Federation(dirs).topk(query_text, k, rank_round=rank_round)
