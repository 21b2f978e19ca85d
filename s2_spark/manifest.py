"""Manifest-MVCC visibility log for :class:`s2_spark.store.StreamStore`.

With ``StreamStore(..., manifest=True)`` record visibility is defined
by a monotonically numbered generation log under ``<base>/_manifest``
instead of the data directory's listing. Each generation file
``gen-%012d.json`` holds ``{"gen": N, "add": [relpaths], "remove":
[relpaths]}`` and every :data:`CHECKPOINT_EVERY`-th generation also
embeds ``"files"`` — the complete visible set AFTER this generation —
so a cold reader folds at most ``CHECKPOINT_EVERY`` delta files.

Publishing a generation is ONE atomic file creation (write-temp +
rename here; a conditional/compare-and-set PUT on an object store),
which is the whole point of the layout: an append or compaction
commits by publishing a generation, never by renaming data files out
from under readers. Consequences, relative to the rename-swap
protocol (store._swap_in):

- no swap window exists — a reader's file list is immutable once
  captured, and files a later generation delists stay on disk until
  :meth:`StreamStore.vacuum` removes them past a grace horizon, so an
  in-flight batch plan pinned to an older generation keeps executing
  (no ``FileNotFoundException`` mid-job, no ``compaction_paused()``
  coordination, no listing latch);
- crash atomicity is free — a crash anywhere before the publish
  leaves only orphaned (invisible) data files for vacuum to sweep; a
  crash after it leaves a fully committed generation. There is no
  multi-file rename sequence to recover;
- object-store portability — nothing in the protocol needs an atomic
  rename over existing data, only "create this object if absent".

This is the manifest/MVCC shape SlateDB's LSM gives the reference for
free (lite/src/backend/kv/mod.rs:55-95: state is defined by manifest
+ WAL, never by bucket listings), re-expressed for a parquet layout.

Single writer per store directory is assumed (as for the rename
protocol — the store's driver-side locks do not span processes); on
an object store the final rename becomes a conditional PUT and a
concurrent writer loses the race loudly instead of clobbering.
"""

from __future__ import annotations

import json
import os
import re
import uuid

#: every Nth generation embeds the full visible file set, bounding a
#: cold fold to N delta reads and letting vacuum() drop older log
#: entries. 32 ≈ one checkpoint per compaction cycle at the default
#: append cadence; the value only trades log-fold cost vs checkpoint
#: write size and may change freely (folding handles any spacing).
CHECKPOINT_EVERY = 32

_GEN_RE = re.compile(r"^gen-(\d{12})\.json$")


def manifest_dir(base_dir: str) -> str:
    return os.path.join(base_dir, "_manifest")


def is_manifest_store(base_dir: str) -> bool:
    """True if ``base_dir`` carries a generation log — the on-disk
    marker every reader (including the streaming source's footer
    scanner, which has no store object) keys visibility on."""
    d = manifest_dir(base_dir)
    try:
        return any(_GEN_RE.match(f) for f in os.listdir(d))
    except OSError:
        return False


def _gen_numbers(d: str) -> list[int]:
    try:
        names = os.listdir(d)
    except OSError:
        return []
    return sorted(int(m.group(1)) for f in names if (m := _GEN_RE.match(f)))


def _read_gen(d: str, gen: int) -> dict:
    with open(os.path.join(d, f"gen-{gen:012d}.json")) as f:
        return json.load(f)


def fold(base_dir: str) -> tuple[int, set[str]]:
    """Current ``(generation, visible relpath set)``.

    Reads backward from the head to the nearest checkpoint, then folds
    the deltas forward — at most :data:`CHECKPOINT_EVERY` + 1 small
    JSON reads regardless of log length. Generation files are
    immutable once renamed into place, so no locking is needed; a
    concurrently publishing writer's new generation is either visible
    (and complete) or not yet listed — both are consistent snapshots.

    Vacuum may prune log entries below the newest checkpoint, so the
    fold treats "missing generation below a checkpoint" as normal and
    only a gap ABOVE the newest checkpoint as corruption (loud)."""
    d = manifest_dir(base_dir)
    gens = _gen_numbers(d)
    if not gens:
        return 0, set()
    head = gens[-1]
    # walk back from the head collecting deltas until a checkpoint
    chain: list[dict] = []
    files: set[str] = set()
    for g in range(head, 0, -1):
        try:
            entry = _read_gen(d, g)
        except FileNotFoundError:
            raise RuntimeError(
                f"manifest gap: generation {g} missing below head {head} "
                f"with no checkpoint in between — the log is corrupt"
            ) from None
        chain.append(entry)
        if entry.get("files") is not None:
            files = set(entry["files"])
            # the checkpoint already includes its own add/remove
            chain.pop()
            break
    for entry in reversed(chain):
        files -= set(entry.get("remove", ()))
        files |= set(entry.get("add", ()))
    return head, files


def write_gen(
    base_dir: str,
    gen: int,
    add: list[str],
    remove: list[str],
    files: list[str] | None,
) -> None:
    """Atomically create generation ``gen``. Raises if it already
    exists (two writers raced — the single-writer assumption was
    violated; an object-store port would get this from the
    conditional PUT itself)."""
    d = manifest_dir(base_dir)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"gen-{gen:012d}.json")
    entry: dict = {"gen": gen, "add": sorted(add), "remove": sorted(remove)}
    if files is not None:
        entry["files"] = sorted(files)
    tmp = final + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    if os.path.exists(final):
        os.remove(tmp)
        raise RuntimeError(
            f"manifest generation {gen} already exists — concurrent "
            f"writers on one store directory are not supported"
        )
    os.rename(tmp, final)


def prune_log(base_dir: str) -> int:
    """Drop log entries strictly below the newest checkpoint (the fold
    never reads past one) and sweep stale ``.tmp.`` staging files.
    Returns entries removed. Part of vacuum, split out for testing."""
    d = manifest_dir(base_dir)
    gens = _gen_numbers(d)
    newest_ckpt = None
    for g in reversed(gens):
        try:
            if _read_gen(d, g).get("files") is not None:
                newest_ckpt = g
                break
        except FileNotFoundError:  # pragma: no cover - raced prune
            continue
    n = 0
    if newest_ckpt is not None:
        for g in gens:
            if g < newest_ckpt:
                try:
                    os.remove(os.path.join(d, f"gen-{g:012d}.json"))
                    n += 1
                except FileNotFoundError:  # pragma: no cover
                    pass
    try:
        for f in os.listdir(d):
            if ".tmp." in f:
                os.remove(os.path.join(d, f))
    except OSError:  # pragma: no cover
        pass
    return n
