"""Manifest-MVCC store mode (``StreamStore(manifest=True)``).

The generation log replaces listing-defined visibility: appends and
compactions commit by atomically publishing a generation
(s2_spark/manifest.py), delisted files outlive in-flight readers until
vacuum, and no rename-over-readers swap (hence no swap window, no
``compaction_paused()`` coordination) exists at all. These tests pin
the protocol's core claims: publish atomicity at every crash point,
MVCC reader pinning across compaction, acked-append survival during
churn, the bootstrap migration, vacuum's grace contract, and the
consumed-set normalization (ADVICE r12) on both layouts.

Reference analogue: SlateDB's manifest+WAL visibility
(lite/src/backend/kv/mod.rs:55-95) — state is defined by the
manifest, never by bucket listings.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from s2_spark import manifest as mf
from s2_spark.catalog import BasinConfig, Catalog
from s2_spark.model import Record, trim_record
from s2_spark.store import StreamStore

B = "test-basin"


def _mkstore(spark, tmp_path, clockbox=None, **kw):
    clock = (lambda: clockbox["ms"]) if clockbox else None
    cat = Catalog(spark, clock=clock)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    cat.create_stream(B, "s2")
    return StreamStore(
        spark, str(tmp_path / "records"), catalog=cat, clock=clock,
        manifest=True, **kw,
    )


def _rows(store, stream="s1"):
    return [
        (r.seq_num, bytes(r.body))
        for r in store.read(B, stream).select("seq_num", "body").collect()
    ]


def _data_files(base):
    return [
        p
        for p in glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True)
        if not any(c.startswith(("_", ".")) for c in
                   os.path.relpath(p, base).split(os.sep))
    ]


def test_manifest_append_read_compact_vacuum_roundtrip(spark, tmp_path):
    store = _mkstore(spark, tmp_path)
    for i in range(6):
        store.append(B, "s1" if i % 2 else "s2", [Record(body=f"r{i}".encode())])
    want = [(0, b"r1"), (1, b"r3"), (2, b"r5")]
    assert _rows(store) == want
    n_before = len(_data_files(store.base_dir))
    store.compact()
    assert _rows(store) == want
    # delisted originals coexist with the compacted copy until vacuum —
    # and the manifest keeps reads from double-counting them
    assert len(_data_files(store.base_dir)) > 1
    removed = store.vacuum(grace_ms=0)
    assert removed == n_before  # every pre-compaction file swept
    assert _rows(store) == want
    # cold reopen WITHOUT the flag: the on-disk log is authoritative
    cold = StreamStore(spark, store.base_dir, catalog=store.catalog)
    assert cold.manifest
    assert _rows(cold) == want


def test_manifest_reader_pinned_generation_survives_compact_and_vacuum(
    spark, tmp_path
):
    """The MVCC claim itself: a DataFrame built BEFORE a compaction
    (pinned to that generation's file list) still collects correctly
    after the compaction published — without compaction_paused(),
    localCheckpoint, or retry. Only vacuum may invalidate it, and only
    past the grace window."""
    store = _mkstore(spark, tmp_path)
    for i in range(5):
        store.append(B, "s1", [Record(body=f"v{i}".encode())])
    pinned = store.read(B, "s1").select("seq_num", "body")
    store.compact()
    store.compact()  # churn twice; delisted files must still be on disk
    got = [(r.seq_num, bytes(r.body)) for r in pinned.collect()]
    assert got == [(i, f"v{i}".encode()) for i in range(5)]
    # a generous grace keeps the pinned plan alive
    assert store.vacuum(grace_ms=3_600_000) == 0
    assert [(r.seq_num, bytes(r.body)) for r in pinned.collect()] == got


def test_manifest_append_during_compaction_survives(spark, tmp_path, monkeypatch):
    """An append that lands between the rewrite's input capture and its
    publish must survive: its generation adds files the compaction's
    remove-set does not contain. Forced deterministically by hooking
    the publish."""
    store = _mkstore(spark, tmp_path)
    for i in range(4):
        store.append(B, "s1", [Record(body=f"p{i}".encode())])

    real_publish = store._manifest_publish
    fired = {"n": 0}

    def racing_publish(add=(), remove=(), **kw):
        if fired["n"] == 0 and remove:  # the compaction's publish
            fired["n"] += 1
            store.append(B, "s1", [Record(body=b"racer")])
        return real_publish(add=add, remove=remove, **kw)

    monkeypatch.setattr(store, "_manifest_publish", racing_publish)
    store.compact()
    monkeypatch.undo()
    assert _rows(store) == [(i, f"p{i}".encode()) for i in range(4)] + [(4, b"racer")]
    store.vacuum(grace_ms=0)
    assert _rows(store) == [(i, f"p{i}".encode()) for i in range(4)] + [(4, b"racer")]


@pytest.mark.parametrize("crash_at", ["stage_write", "rename", "publish"])
def test_manifest_compaction_crash_points_leave_store_intact(
    spark, tmp_path, monkeypatch, crash_at
):
    """A crash ANYWHERE before the generation publish leaves only
    orphaned invisible files; the store (hot or cold-reopened) serves
    exactly the pre-compaction rows, and vacuum sweeps the orphans."""
    store = _mkstore(spark, tmp_path)
    for i in range(4):
        store.append(B, "s1", [Record(body=f"c{i}".encode())])
    want = [(i, f"c{i}".encode()) for i in range(4)]

    if crash_at == "stage_write":
        import pyspark.sql.readwriter as rw

        real = rw.DataFrameWriter.parquet

        def boom(self, path, **kw):
            if "_compact-stage-" in path:
                raise RuntimeError("injected stage-write crash")
            return real(self, path, **kw)

        monkeypatch.setattr(rw.DataFrameWriter, "parquet", boom)
    elif crash_at == "rename":
        real_replace = os.replace

        def boom(src, dst):
            if "_compact-stage-" in str(src):
                raise RuntimeError("injected rename crash")
            return real_replace(src, dst)

        monkeypatch.setattr(os, "replace", boom)
    else:  # crash INSIDE publish, before the gen file lands
        def boom(*a, **kw):
            raise RuntimeError("injected publish crash")

        monkeypatch.setattr(mf, "write_gen", boom)

    with pytest.raises(RuntimeError, match="injected"):
        store.compact()
    monkeypatch.undo()
    assert _rows(store) == want
    cold = StreamStore(spark, store.base_dir, catalog=store.catalog)
    assert _rows(cold) == want
    cold.vacuum(grace_ms=0)
    assert _rows(cold) == want
    # post-crash the store keeps working: appends and compaction succeed
    cold.append(B, "s1", [Record(body=b"after")])
    cold.compact()
    assert _rows(cold) == want + [(4, b"after")]


def test_manifest_append_batch_is_atomic_across_crash(spark, tmp_path, monkeypatch):
    """Manifest-mode appends commit at the publish: a crash after the
    parquet write but before the publish makes the whole batch
    invisible (a strictly smaller unknown-outcome envelope than the
    listing layout's durable prefix) — never a torn half-batch."""
    store = _mkstore(spark, tmp_path, bucket_count=8)
    store.append(B, "s1", [Record(body=b"keep")])

    def boom(*a, **kw):
        raise RuntimeError("injected publish crash")

    monkeypatch.setattr(mf, "write_gen", boom)
    with pytest.raises(RuntimeError, match="injected"):
        store.append(B, "s1", [Record(body=b"lost-a"), Record(body=b"lost-b")])
    monkeypatch.undo()
    cold = StreamStore(spark, store.base_dir, catalog=store.catalog, bucket_count=8)
    assert _rows(cold) == [(0, b"keep")]
    tail, _ = cold.check_tail(B, "s1")
    assert tail == 1
    # the next append re-issues seq 1 and all is consistent
    cold.append(B, "s1", [Record(body=b"next")])
    assert _rows(cold) == [(0, b"keep"), (1, b"next")]


def test_manifest_checkpoint_and_prune(spark, tmp_path):
    """Past CHECKPOINT_EVERY generations the log embeds a full file
    set; prune (part of vacuum) drops entries below it and a cold fold
    still reproduces the exact visible set."""
    store = _mkstore(spark, tmp_path)
    n = mf.CHECKPOINT_EVERY + 3
    for i in range(n):
        store.append(B, "s1", [Record(body=f"k{i}".encode())])
    gen, files = mf.fold(store.base_dir)
    assert gen == n
    ckpt = mf._read_gen(mf.manifest_dir(store.base_dir), mf.CHECKPOINT_EVERY)
    assert ckpt.get("files") is not None
    # entry_grace_ms=0: production pruning age-gates entries (the
    # publish resurrection guard); this test targets the prune/fold
    # mechanics themselves
    dropped = mf.prune_log(store.base_dir, entry_grace_ms=0)
    assert dropped == mf.CHECKPOINT_EVERY - 1
    assert mf.fold(store.base_dir) == (gen, files)
    cold = StreamStore(spark, store.base_dir, catalog=store.catalog)
    assert _rows(cold) == [(i, f"k{i}".encode()) for i in range(n)]


def test_manifest_bootstrap_migrates_listing_store(spark, tmp_path):
    """Opening an existing listing-mode directory with manifest=True
    publishes a checkpoint of the current data files — the flag never
    makes existing records invisible."""
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    base = str(tmp_path / "records")
    legacy = StreamStore(spark, base, catalog=cat, manifest=False)
    for i in range(3):
        legacy.append(B, "s1", [Record(body=f"m{i}".encode())])
    assert not legacy.manifest
    upgraded = StreamStore(spark, base, catalog=cat, manifest=True)
    assert upgraded.manifest and mf.is_manifest_store(base)
    assert _rows(upgraded) == [(i, f"m{i}".encode()) for i in range(3)]
    upgraded.append(B, "s1", [Record(body=b"m3")])
    upgraded.compact()
    upgraded.vacuum(grace_ms=0)
    assert _rows(upgraded) == [(i, f"m{i}".encode()) for i in range(4)]


def test_manifest_trim_retention_rewrite(spark, tmp_path):
    """apply_trim_and_retention rides the same publish path: trimmed
    records physically deleted at vacuum, tail preserved, trim
    visibility exact."""
    store = _mkstore(spark, tmp_path)
    for i in range(5):
        store.append(B, "s1", [Record(body=f"t{i}".encode())])
    store.append(B, "s1", [trim_record(3)])
    store.apply_trim_and_retention()
    store.vacuum(grace_ms=0)
    # the in-band trim command rides the log at seq 5 (A5/A6 semantics)
    assert _rows(store) == [(3, b"t3"), (4, b"t4"), (5, (3).to_bytes(8, "big"))]
    cold = StreamStore(spark, store.base_dir, catalog=store.catalog)
    cold.recover_state()
    st = cold._st(B, "s1")
    assert (st.tail_seq, st.trim_point) == (6, 3)


def test_manifest_streaming_source_listing_is_deduplicated(spark, tmp_path):
    """The source's footer scanner lists from the manifest: after a
    compaction (before vacuum) the raw directory holds two copies of
    every record, but _parquet_files must return only the current
    generation's files."""
    from s2_spark.streaming.source import _parquet_files, _tails

    store = _mkstore(spark, tmp_path)
    for i in range(4):
        store.append(B, "s1", [Record(body=f"s{i}".encode())])
    store.compact()
    listed = _parquet_files(store.base_dir)
    assert set(listed) == {
        os.path.join(store.base_dir, rel)
        for rel in store._manifest_current()[1]
    }
    # and the tails derived from it are the true tails, not 2x
    tails = _tails(store.base_dir)
    assert tails == {f"{B}\x00s1": 4}


def test_consumed_files_symlinked_base_dir_no_duplicates(spark, tmp_path):
    """ADVICE r12 (medium): inputFiles() URIs resolved through a
    symlinked base_dir must still land in the consumed set — on the
    LISTING layout a miss leaves the original beside the compacted
    copy and every read serves duplicate seq_nums."""
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    real = tmp_path / "real-store"
    real.mkdir()
    link = tmp_path / "link-store"
    os.symlink(real, link)
    store = StreamStore(spark, str(link), catalog=cat)
    for i in range(4):
        store.append(B, "s1", [Record(body=f"d{i}".encode())])
    store.compact()
    assert _rows(store) == [(i, f"d{i}".encode()) for i in range(4)]
    cold = StreamStore(spark, str(link), catalog=cat)
    assert _rows(cold) == [(i, f"d{i}".encode()) for i in range(4)]


def test_consumed_files_foreign_input_aborts_loudly(spark, tmp_path):
    """A rewrite plan whose input includes files outside the store
    directory aborts instead of silently skipping them."""
    store = _mkstore(spark, tmp_path)
    store.append(B, "s1", [Record(body=b"x")])
    foreign = str(tmp_path / "foreign.parquet")
    spark.range(3).write.parquet(foreign)
    df = store.records_df().unionByName(
        spark.read.parquet(foreign)
        .selectExpr(
            "'b' as basin", "'s' as stream", "id as seq_num",
            "id as timestamp",
            "cast(null as array<struct<name binary, value binary>>) as headers",
            "cast(null as binary) as body",
        )
    )
    with pytest.raises(RuntimeError, match="do not resolve into"):
        store._consumed_files(df)


def test_manifest_write_gen_collision_returns_false_and_publish_retries(
    spark, tmp_path
):
    """The conditional-PUT contract: creating an existing generation
    returns False (atomically — os.link EEXIST locally, If-None-Match
    on an object store) and never clobbers the committed entry; the
    publish CAS loop absorbs the loss by re-folding on top of the
    winner."""
    store = _mkstore(spark, tmp_path)
    store.append(B, "s1", [Record(body=b"x")])
    gen, files = store._manifest_current()
    committed = mf._read_gen(mf.manifest_dir(store.base_dir), gen)
    assert not mf.write_gen(store.base_dir, gen, ["intruder"], [], None)
    # the committed entry is byte-identical — no silent overwrite
    assert mf._read_gen(mf.manifest_dir(store.base_dir), gen) == committed
    # a publish seeded with a STALE known snapshot (gen-1) loses the
    # CAS for gen, re-folds, and commits gen+1 on top of the winner
    new_gen, new_files = mf.publish(
        store.base_dir, add=["extra.parquet"], known=(gen - 1, set())
    )
    assert new_gen == gen + 1
    assert new_files == set(files) | {"extra.parquet"}


def test_manifest_vacuum_requires_manifest_mode(spark, tmp_path):
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    store = StreamStore(
        spark, str(tmp_path / "records"), catalog=cat, manifest=False
    )
    with pytest.raises(RuntimeError, match="manifest mode"):
        store.vacuum()


def test_manifest_fold_gap_above_checkpoint_is_corrupt(tmp_path):
    base = str(tmp_path)
    mf.write_gen(base, 1, ["a"], [], None)
    mf.write_gen(base, 2, ["b"], [], None)
    mf.write_gen(base, 3, ["c"], [], None)
    os.remove(os.path.join(mf.manifest_dir(base), "gen-000000000002.json"))
    with pytest.raises(RuntimeError, match="manifest gap"):
        mf.fold(base)


def test_manifest_fold_ignores_tmp_staging_files(tmp_path):
    base = str(tmp_path)
    mf.write_gen(base, 1, ["a"], [], None)
    # a crashed publish's staging file must be invisible to the fold
    stale = os.path.join(mf.manifest_dir(base), "gen-000000000002.json.tmp.dead")
    with open(stale, "w") as f:
        json.dump({"gen": 2, "add": ["z"], "remove": []}, f)
    assert mf.fold(base) == (1, {"a"})
    # the tmp sweep is AGE-GATED (ADVICE r13): a fresh tmp may belong
    # to a publish in flight on another thread (staged, not yet
    # linked) — sweeping it would fail that publish mid-commit
    mf.prune_log(base)
    assert os.path.exists(stale)
    mf.prune_log(base, tmp_grace_ms=0)
    assert not os.path.exists(stale)


def test_manifest_attach_views_no_double_count_and_live(spark, tmp_path):
    """A raw parquet.`path` view would double-count after a manifest
    compaction (originals + compacted copies coexist until vacuum);
    manifest-mode views snapshot the current generation and the store
    re-attaches them on every write-side invalidation, so they stay
    exactly as live as the listing layout's path views."""
    store = _mkstore(spark, tmp_path)
    for i in range(4):
        store.append(B, "s1", [Record(body=f"v{i}".encode())])
    store.attach_views("mfv_")
    assert spark.sql("SELECT count(*) AS n FROM mfv_records").first()["n"] == 4
    store.compact()  # delisted originals still on disk
    assert spark.sql("SELECT count(*) AS n FROM mfv_records").first()["n"] == 4
    store.append(B, "s1", [Record(body=b"v4")])  # liveness via re-attach
    assert spark.sql("SELECT count(*) AS n FROM mfv_records").first()["n"] == 5
    assert (
        spark.sql("SELECT next_seq_num FROM mfv_tails").first()["next_seq_num"]
        == 5
    )
    store.vacuum(grace_ms=0)
    assert spark.sql("SELECT count(*) AS n FROM mfv_records").first()["n"] == 5


def test_manifest_vacuum_grace_runs_from_delisting_not_write(spark, tmp_path):
    """The grace window is time-since-DELISTING (the reader-pinning
    contract), not time-since-write: a file written long ago but
    delisted a moment ago must survive a generous-grace vacuum — a
    reader may have pinned it seconds before the delist. The publish
    stamps removed files' mtime for exactly this reason."""
    import time as _time

    store = _mkstore(spark, tmp_path)
    for i in range(3):
        store.append(B, "s1", [Record(body=f"g{i}".encode())])
    # backdate every data file: written "an hour ago"
    old = _time.time() - 3600
    for p in _data_files(store.base_dir):
        os.utime(p, (old, old))
    store.compact()  # delists the backdated originals NOW
    # generous grace: nothing may be deleted — the delist just happened
    assert store.vacuum(grace_ms=30 * 60 * 1000) == 0
    # zero grace: the delisted originals (and only they) go
    assert store.vacuum(grace_ms=0) == 3
    assert _rows(store) == [(i, f"g{i}".encode()) for i in range(3)]


# --- round 14: CAS publish protocol (multi-writer / object store) -------


def test_publish_cas_two_threads_local_backend(tmp_path):
    """Two writer threads CAS-publishing disjoint appends onto one log:
    every publish commits (losing a CAS round only costs a retry),
    generations are contiguous, and the final fold is the union."""
    import threading

    base = str(tmp_path)
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def writer(w: int) -> None:
        barrier.wait()
        try:
            for i in range(20):
                mf.publish(base, add=[f"w{w}-{i}.parquet"])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(w,)) for w in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    gen, files = mf.fold(base)
    assert gen == 40
    assert files == {f"w{w}-{i}.parquet" for w in range(2) for i in range(20)}


def test_publish_require_visible_conflict(tmp_path):
    """A delisting publish seeded with a stale snapshot must NOT commit
    once a racing publish consumed its inputs: the CAS loss forces a
    re-fold, the re-validation sees the missing file, and
    PublishConflict aborts the rewrite."""
    base = str(tmp_path)
    mf.publish(base, add=["a", "b"])  # gen 1
    mf.publish(base, add=["c"], remove=["a"])  # gen 2: a racing rewrite
    with pytest.raises(mf.PublishConflict, match="no longer visible"):
        mf.publish(
            base, add=["d"], remove=["a"], require_visible=True,
            known=(1, {"a", "b"}),
        )
    # nothing was committed by the conflicted attempt
    assert mf.fold(base) == (2, {"b", "c"})
    # appends never conflict: the same stale seed without a delist lands
    gen, files = mf.publish(base, add=["d"], known=(1, {"a", "b"}))
    assert (gen, files) == (3, {"b", "c", "d"})


def test_inmemory_cas_backend_full_store_roundtrip(spark, tmp_path):
    """The PublishBackend seam end-to-end: a store whose generation log
    lives in the in-memory conditional-PUT object store (no rename, no
    link, no mtime) runs the full append → compact → vacuum cycle.
    Data parquet stays local; every protocol object goes through
    put-if-absent — exactly the split an S3/GCS port keeps."""
    backend = mf.InMemoryCASBackend()
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    store = StreamStore(
        spark, str(tmp_path / "records"), catalog=cat,
        manifest=True, manifest_backend=backend,
    )
    for i in range(4):
        store.append(B, "s1", [Record(body=f"o{i}".encode())])
    want = [(i, f"o{i}".encode()) for i in range(4)]
    assert _rows(store) == want
    n_before = len(_data_files(store.base_dir))
    store.compact()
    assert _rows(store) == want
    assert store.vacuum(grace_ms=0) == n_before
    assert _rows(store) == want
    assert backend.puts == store._manifest_current()[0]  # 1 put per gen
    # no generation objects leaked onto the local filesystem — only the
    # external-backend breadcrumb that keeps path-only readers and
    # backend-less reopens from silently falling back to listings
    assert not mf.is_manifest_store(store.base_dir, mf.LOCAL)
    assert mf.has_external_backend_marker(store.base_dir)
    # a second store over the same backend CAS-publishes (stale-seed
    # retry) instead of clobbering
    other = StreamStore(
        spark, store.base_dir, catalog=cat,
        manifest=True, manifest_backend=backend,
    )
    other.append(B, "s1", [Record(body=b"o4")])
    assert backend.conflicts == 0  # no contention in this sequence
    gen, files = mf.fold(store.base_dir, backend)
    assert gen == store._manifest_current()[0] + 1


def test_two_streamstore_objects_race_appends(spark, tmp_path):
    """TWO StreamStore objects (simulating two processes / jobs) over
    ONE directory, appending concurrently to different streams: the
    CAS publish loop commits every append — the round-13 single-writer
    hard-fail is gone — and a cold reopen sees all records."""
    import threading

    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    cat.create_stream(B, "s2")
    base = str(tmp_path / "records")
    stores = [
        StreamStore(spark, base, catalog=cat, manifest=True) for _ in range(2)
    ]
    barrier = threading.Barrier(2)
    errs: list[Exception] = []

    def writer(w: int) -> None:
        barrier.wait()
        try:
            for i in range(5):
                stores[w].append(
                    B, f"s{w + 1}", [Record(body=f"w{w}-{i}".encode())]
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=writer, args=(w,)) for w in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    gen, files = mf.fold(base)
    assert gen == 10 and len(files) == 10
    cold = StreamStore(spark, base, catalog=cat)
    assert _rows(cold, "s1") == [(i, f"w0-{i}".encode()) for i in range(5)]
    assert _rows(cold, "s2") == [(i, f"w1-{i}".encode()) for i in range(5)]


def test_compaction_conflict_replans_against_racing_rewrite(spark, tmp_path):
    """A compaction whose consumed set was delisted by a racing rewrite
    (second store object = second process) hits PublishConflict at its
    publish, discards its staged output, and re-plans from the fresh
    generation — converging instead of clobbering or duplicating."""
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    base = str(tmp_path / "records")
    a = StreamStore(spark, base, catalog=cat, manifest=True)
    for i in range(4):
        a.append(B, "s1", [Record(body=f"r{i}".encode())])
    want = [(i, f"r{i}".encode()) for i in range(4)]
    b = StreamStore(spark, base, catalog=cat)  # folds gen 4 now
    assert b._manifest_current()[0] == 4
    a.compact()  # gen 5: delists the four originals
    # b's cache is stale: its rewrite consumes the delisted originals,
    # loses the CAS, re-validates, conflicts, and re-plans
    b.compact()
    gen, files = mf.fold(base)
    assert gen == 6  # a's compact + b's re-planned compact (no orphan gen)
    cold = StreamStore(spark, base, catalog=cat)
    assert _rows(cold) == want
    cold.vacuum(grace_ms=0)
    assert _rows(cold) == want
    # the conflicted attempt's staged-in output was deleted, not left
    # as orphans: every remaining data file is visible
    remaining = {
        os.path.relpath(p, base) for p in _data_files(base)
    }
    assert remaining == set(files)


def test_vacuum_pending_delist_record_survives_log_prune(spark, tmp_path):
    """Vacuum runs from the LOG: a delist record whose file is still
    inside the grace window must survive the log prune (it is the only
    copy of the delist time), then go — file and record — once aged.
    Driven by a fake clock: no mtimes involved (ADVICE r13 / VERDICT
    task 1b: object stores cannot set mtimes)."""
    clockbox = {"ms": 1_000_000}
    store = _mkstore(spark, tmp_path, clockbox=clockbox)
    for i in range(3):
        store.append(B, "s1", [Record(body=f"g{i}".encode())])
    store.compact()  # gen 4 delists the three originals at t=1_000_000
    delist_gen = store._manifest_current()[0]
    # push a checkpoint PAST the delist generation so prune_log would
    # normally drop it
    for i in range(mf.CHECKPOINT_EVERY):
        store.append(B, "s1", [Record(body=f"h{i}".encode())])
    assert store._manifest_current()[0] > mf.CHECKPOINT_EVERY
    grace = 60_000
    clockbox["ms"] += grace // 2  # half the grace window elapses
    assert store.vacuum(grace_ms=grace) == 0
    d = mf.manifest_dir(store.base_dir)
    assert os.path.exists(os.path.join(d, f"gen-{delist_gen:012d}.json"))
    # past the file grace AND the log's entry-age gate (r15: a fresh
    # entry's generation number must not recycle while a concurrent
    # publish could still race it — see prune_log entry_grace_ms)
    clockbox["ms"] += 3_600_000 + grace
    assert store.vacuum(grace_ms=grace) == 3
    assert not os.path.exists(os.path.join(d, f"gen-{delist_gen:012d}.json"))
    rows = _rows(store)
    assert [r for r in rows if r[1].startswith(b"g")] == [
        (i, f"g{i}".encode()) for i in range(3)
    ]


def test_fold_retries_stale_head_across_prune_race(tmp_path):
    """ADVICE r13 (medium): a lock-free fold that listed a stale head,
    then raced a checkpoint + prune, must re-list and retry instead of
    declaring a healthy log corrupt."""
    base = str(tmp_path)
    for i in range(mf.CHECKPOINT_EVERY + 2):
        mf.publish(base, add=[f"f{i}"])
    d = mf.manifest_dir(base)
    stale_listing = [
        f for f in os.listdir(d)
        if mf._GEN_RE.match(f) and int(f[4:16]) < mf.CHECKPOINT_EVERY
    ]
    mf.prune_log(base, entry_grace_ms=0)  # drops everything below the checkpoint

    class StaleOnceBackend(mf.LocalBackend):
        def __init__(self):
            self.fired = False

        def list_dir(self, path):
            if not self.fired and path == d:
                self.fired = True
                return stale_listing  # head below the (pruned-to) ckpt
            return super().list_dir(path)

    backend = StaleOnceBackend()
    gen, files = mf.fold(base, backend)
    assert backend.fired
    assert gen == mf.CHECKPOINT_EVERY + 2
    assert files == {f"f{i}" for i in range(mf.CHECKPOINT_EVERY + 2)}


# --- round 14: reader leases (generation pinning vs vacuum) --------------


def test_reader_lease_pins_delisted_files_against_zero_grace_vacuum(
    spark, tmp_path
):
    """A lease pinning generation G keeps every file delisted by a
    LATER generation alive through vacuum — even at grace 0 — so an
    arbitrarily long plan pinned under the lease never loses a file;
    release + re-vacuum then reclaims everything."""
    store = _mkstore(spark, tmp_path)
    for i in range(4):
        store.append(B, "s1", [Record(body=f"L{i}".encode())])
    want = [(i, f"L{i}".encode()) for i in range(4)]
    with store.reader_lease(ttl_ms=3_600_000) as gen:
        pinned = store.read(B, "s1").select("seq_num", "body")
        store.compact()
        store.compact()  # churn twice past the pinned generation
        assert store.vacuum(grace_ms=0) == 0  # lease floor holds
        got = [(r.seq_num, bytes(r.body)) for r in pinned.collect()]
        assert got == want
        assert gen == 4
    # lease released: zero-grace vacuum reclaims all delisted files
    assert store.vacuum(grace_ms=0) > 0
    assert _rows(store) == want


def test_expired_lease_is_gced_and_files_reclaimed(spark, tmp_path):
    """A crashed reader's lease delays GC by at most its TTL: once the
    store clock passes expires_at_ms, vacuum garbage-collects the lease
    object itself and reclaims the files it pinned."""
    clockbox = {"ms": 5_000_000}
    store = _mkstore(spark, tmp_path, clockbox=clockbox)
    for i in range(3):
        store.append(B, "s1", [Record(body=f"E{i}".encode())])
    gen, _ = store._manifest_current()
    # acquire WITHOUT the context manager: the reader "crashes"
    mf.acquire_lease(store.base_dir, gen, ttl_ms=60_000,
                     now_ms=clockbox["ms"])
    store.compact()
    assert store.vacuum(grace_ms=0) == 0  # active lease pins
    d = mf.manifest_dir(store.base_dir)
    assert any(f.startswith("lease-") for f in os.listdir(d))
    clockbox["ms"] += 60_001  # past the TTL
    assert store.vacuum(grace_ms=0) == 3  # reclaimed
    assert not any(f.startswith("lease-") for f in os.listdir(d))
    assert _rows(store) == [(i, f"E{i}".encode()) for i in range(3)]


def test_reader_lease_requires_manifest_mode(spark, tmp_path):
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    store = StreamStore(
        spark, str(tmp_path / "records"), catalog=cat, manifest=False
    )
    with pytest.raises(RuntimeError, match="manifest mode"):
        store.reader_lease()


def test_lease_does_not_pin_files_delisted_before_it(spark, tmp_path):
    """Correct floor semantics: a lease acquired at generation G pins
    only what was visible AT G — files delisted by generations <= G
    were already invisible to the leaseholder and age out normally."""
    store = _mkstore(spark, tmp_path)
    for i in range(3):
        store.append(B, "s1", [Record(body=f"P{i}".encode())])
    store.compact()  # delists the 3 originals BEFORE the lease
    with store.reader_lease(ttl_ms=3_600_000):
        # the pre-lease delists are not pinned: zero grace reclaims them
        assert store.vacuum(grace_ms=0) == 3
        assert _rows(store) == [(i, f"P{i}".encode()) for i in range(3)]


def test_manifest_refresh_sees_other_writers_generations(spark, tmp_path):
    """A store's manifest cache is write-through for its OWN publishes;
    generations committed by another writer become visible to its
    reads after manifest_refresh() (cross-writer read visibility is
    pull-based, like any snapshot client)."""
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    cat.create_stream(B, "s2")
    base = str(tmp_path / "records")
    a = StreamStore(spark, base, catalog=cat, manifest=True)
    b = StreamStore(spark, base, catalog=cat)
    a.append(B, "s1", [Record(body=b"from-a")])
    assert b._manifest_current()[0] == 0  # b folded the empty log at open
    assert _rows(b, "s1") == []  # snapshot semantics: not yet visible
    gen = b.manifest_refresh()
    assert gen == 1
    assert _rows(b, "s1") == [(0, b"from-a")]


def test_publish_commit_point_is_os_link(tmp_path, monkeypatch):
    """The sim crash injectors aim their bombs at the publish COMMIT
    operation. When that op changed from os.rename to os.link (r14
    create-if-absent), the crash-at-publish arm of two scenarios went
    silently unreachable until review caught it — pin the commit op so
    a future change fails HERE instead of degrading coverage."""
    fired = {"n": 0}
    real = os.link

    def spy(src, dst):
        if f"_manifest{os.sep}" in str(dst):
            fired["n"] += 1
        return real(src, dst)

    monkeypatch.setattr(os, "link", spy)
    mf.publish(str(tmp_path), add=["a.parquet"])
    assert fired["n"] == 1, (
        "manifest publish no longer commits via os.link into _manifest/ — "
        "update the crash injectors in tests/test_sim.py and "
        "tests/test_crash_recovery.py to target the new commit op"
    )


def test_fold_and_prune_race_live_publisher(tmp_path):
    """Live three-way race on one log: a writer CAS-publishes across
    several checkpoint boundaries (with occasional delists), a pruner
    loops prune_log, and a reader folds continuously with no lock —
    the ADVICE-r13 stale-head scenario as a real race instead of the
    deterministic StaleOnceBackend replay. No fold may ever error or
    return a state inconsistent with some prefix of the publish
    history; the final fold equals the replay of every publish."""
    import threading

    base = str(tmp_path)
    n_gens = mf.CHECKPOINT_EVERY * 2 + 10
    committed: list[tuple[int, str, str | None]] = []
    live = set()
    errs: list = []
    done = threading.Event()

    def publisher():
        try:
            import random as _r

            rng = _r.Random(42)
            for i in range(n_gens):
                fname = f"f{i}"
                rm = None
                if live and rng.random() < 0.3:
                    rm = sorted(live)[0]
                    live.discard(rm)
                gen, _files = mf.publish(
                    base, add=[fname], remove=[rm] if rm else []
                )
                live.add(fname)
                committed.append((gen, fname, rm))
        except Exception as e:  # pragma: no cover
            errs.append(("pub", repr(e)))
        finally:
            done.set()

    def pruner():
        while not done.is_set():
            try:
                mf.prune_log(base, entry_grace_ms=0)
            except Exception as e:  # pragma: no cover
                errs.append(("prune", repr(e)))
                return

    def reader():
        seen_gen = 0
        while not done.is_set():
            try:
                gen, files = mf.fold(base)
                assert gen >= seen_gen, "fold went backwards"
                seen_gen = gen
                # every fold must equal the replay of the first `gen`
                # committed publishes (single publisher => gen order
                # == commit order)
                replay: set = set()
                for g, add, rm in committed[:gen]:
                    if rm:
                        replay.discard(rm)
                    replay.add(add)
                if len(committed) >= gen:
                    assert files == replay, (gen, files ^ replay)
            except Exception as e:  # pragma: no cover
                errs.append(("read", repr(e)))
                return

    ts = [
        threading.Thread(target=f) for f in (publisher, pruner, reader)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    gen, files = mf.fold(base)
    assert gen == n_gens
    replay: set = set()
    for _g, add, rm in committed:
        if rm:
            replay.discard(rm)
        replay.add(add)
    assert files == replay


# --- round 14 code-review regressions (multi-writer staleness class) -----


def test_publish_detects_and_retries_pruned_number_resurrection(tmp_path):
    """Code-review r14 / ADVICE r14 (acked-data-loss): a writer with a
    VERY stale `known` snapshot could win the create for a generation
    number the log already passed and pruned — the entry would be
    unreachable from every fold and its acked data silently lost.
    Since r15 the guard is PREVENTIVE: publish head-verifies the
    caller snapshot with one LIST (max listed generation is monotone,
    so head==known.gen proves the next number was never used) and
    discards a stale one, so the zombie is never created at all —
    there is no detect-and-delete branch left to false-positive on a
    committed generation."""
    base = str(tmp_path)
    n = mf.CHECKPOINT_EVERY + 3  # head 35, checkpoint at 32
    for i in range(n):
        mf.publish(base, add=[f"f{i}"])
    assert (
        mf.prune_log(base, entry_grace_ms=0) == mf.CHECKPOINT_EVERY - 1
    )  # gens 1..31 gone
    head, files = mf.fold(base)
    assert head == n
    # stale writer thinks the head is 5 → attempts gen 6 (now free)
    gen, files2 = mf.publish(base, add=["late.parquet"], known=(5, {"f0"}))
    assert gen == head + 1  # committed on the REAL head, not a zombie
    assert "late.parquet" in files2 and files < files2
    d = mf.manifest_dir(base)
    assert 6 not in mf._gen_numbers(d)  # zombie cleaned up
    assert mf.fold(base) == (head + 1, files2)


def test_vacuum_folds_fresh_never_deletes_other_writers_live_files(
    spark, tmp_path
):
    """Code-review r14 (acked-data-loss): vacuum must compute the
    visible set from a FRESH fold — a stale write-through cache would
    classify another writer's live head-visible files as orphans and
    the mtime-aged sweep would delete acked records."""
    import time as _time

    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    cat.create_stream(B, "s2")
    base = str(tmp_path / "records")
    a = StreamStore(spark, base, catalog=cat, manifest=True)
    a.append(B, "s1", [Record(body=b"a0")])  # a's cache: gen 1
    b = StreamStore(spark, base, catalog=cat)
    for i in range(2):
        b.append(B, "s2", [Record(body=f"b{i}".encode())])  # gens 2-3
    # make b's files LOOK old (the orphan sweep ages by mtime)
    old = _time.time() - 7200
    for p in _data_files(base):
        os.utime(p, (old, old))
    assert a.vacuum(grace_ms=0) == 0  # fresh fold: everything is live
    cold = StreamStore(spark, base, catalog=cat)
    assert _rows(cold, "s1") == [(0, b"a0")]
    assert _rows(cold, "s2") == [(0, b"b0"), (1, b"b1")]


def test_reader_lease_pins_fresh_generation_not_stale_cache(spark, tmp_path):
    """Code-review r14: a lease must pin a FRESH generation — pinning
    the stale cached one would promise protection for files that may
    already be delisted-and-vacuumed. The lease generation equals the
    real head at acquire time, and files delisted AFTER it survive a
    zero-grace vacuum while the lease is active."""
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    base = str(tmp_path / "records")
    a = StreamStore(spark, base, catalog=cat, manifest=True)
    a.append(B, "s1", [Record(body=b"x0")])  # a's cache: gen 1
    b = StreamStore(spark, base, catalog=cat)
    b.append(B, "s1", [Record(body=b"x1")])  # gen 2 — a's cache stale
    head = mf.fold(base)[0]
    with a.reader_lease(ttl_ms=3_600_000) as gen:
        assert gen == head  # fresh, not a's cached gen 1
        b.compact()  # delists at gen head+1 > lease floor
        assert b.vacuum(grace_ms=0) == 0  # pinned by a's lease
        pinned_rows = _rows(b)
        assert pinned_rows == [(0, b"x0"), (1, b"x1")]
    assert b.vacuum(grace_ms=0) > 0  # released → reclaimable
    assert _rows(b) == [(0, b"x0"), (1, b"x1")]


def test_external_backend_marker_guards_path_readers_and_reopen(
    spark, tmp_path
):
    """Code-review r14: a store whose manifest log lives in a
    non-local backend leaves a local breadcrumb; the streaming
    source's path-only footer scanner and a backend-less reopen both
    fail loudly instead of silently falling back to a directory
    listing that double-counts delisted originals."""
    from s2_spark.streaming.source import _parquet_files

    backend = mf.InMemoryCASBackend()
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    cat.create_stream(B, "s1")
    base = str(tmp_path / "records")
    store = StreamStore(
        spark, base, catalog=cat, manifest=True, manifest_backend=backend
    )
    store.append(B, "s1", [Record(body=b"m0")])
    with pytest.raises(RuntimeError, match="external manifest backend"):
        _parquet_files(base)
    with pytest.raises(RuntimeError, match="external manifest backend"):
        StreamStore(spark, base, catalog=cat)
    # reopening WITH the backend works and reads through the log
    again = StreamStore(
        spark, base, catalog=cat, manifest=True, manifest_backend=backend
    )
    assert _rows(again) == [(0, b"m0")]


# --- round 15: structural resurrection guard (ADVICE r14 medium) ---------


def test_descheduled_writer_committed_gen_survives_racing_rewrite(tmp_path):
    """ADVICE r14 (medium): writer creates generation N (genuinely
    committed — N was head+1), is descheduled, and a racing rewrite
    folds AT N, consumes (delists) its just-added file, and publishes
    N+1 — all before the writer's post-create re-list. The r14
    content-based zombie check false-positived here (adds absent from
    the fresh fold → "zombie" → delete committed N, breaking the fold
    chain, then retry duplicating acked records). The r15 guard has no
    delete branch: the writer must observe its publish as committed,
    leave N in place, and NOT re-publish."""
    base = str(tmp_path)
    mf.publish(base, add=["seed.parquet"])  # gen 1

    class RacingBackend(mf.LocalBackend):
        """After the writer's successful create of gen N, runs the
        racing rewrite through a plain backend BEFORE the writer's
        validation re-list executes."""

        def __init__(self):
            self.raced = False

        def put_if_absent(self, path, data):
            ok = super().put_if_absent(path, data)
            if ok and not self.raced and path.endswith("gen-000000000002.json"):
                self.raced = True
                # racing compactor: folds at N=2 (sees new.parquet),
                # consumes it, publishes N+1
                head, files = mf.fold(base)
                assert head == 2 and "new.parquet" in files
                mf.publish(
                    base,
                    add=["compacted.parquet"],
                    remove=sorted(files),
                    require_visible=True,
                    known=(head, files),
                )
            return ok

    bk = RacingBackend()
    gen, files = mf.publish(base, add=["new.parquet"], known=(1, {"seed.parquet"}), backend=bk)
    assert bk.raced
    # publish reports THE GENERATION THIS CALL CREATED — never the
    # racing winner's (misattributing the commit made two writers ack
    # one number: the 'gens not contiguous' soak failure). N=2 is
    # committed, never deleted, never retried; the racing rewrite
    # built on top of it.
    assert (gen, files) == (2, {"seed.parquet", "new.parquet"})
    d = mf.manifest_dir(base)
    assert mf._gen_numbers(d) == [1, 2, 3]  # N=2 intact: no chain gap
    entry2 = mf._read_gen(d, 2)
    assert entry2["add"] == ["new.parquet"]  # exactly one publish of it
    assert mf.fold(base) == (3, {"compacted.parquet"})


def test_publish_head_verifies_stale_known_without_prune(tmp_path):
    """The stale-known path with NO prune involved: a cached snapshot
    one generation behind must be discarded by the head-verification
    LIST (not trusted into a create that would lose the CAS anyway) —
    publish lands on the real head first try."""
    base = str(tmp_path)
    mf.publish(base, add=["a"])  # gen 1
    mf.publish(base, add=["b"])  # gen 2

    class CountingBackend(mf.LocalBackend):
        def __init__(self):
            self.creates = 0

        def put_if_absent(self, path, data):
            self.creates += 1
            return super().put_if_absent(path, data)

    bk = CountingBackend()
    gen, files = mf.publish(base, add=["c"], known=(1, {"a"}), backend=bk)
    assert (gen, files) == (3, {"a", "b", "c"})
    assert bk.creates == 1  # no lost-CAS retry: stale known never used


def test_prune_entry_age_gate_blocks_fresh_number_recycling(tmp_path):
    """The residual list→create race window is closed by prune_log's
    entry-age gate: entries younger than entry_grace_ms are never
    pruned (their numbers must not recycle while a live publish could
    still race them), while aged entries prune normally."""
    base = str(tmp_path)
    n = mf.CHECKPOINT_EVERY + 2
    for i in range(n):
        mf.publish(base, add=[f"f{i}"], ts_ms=1_000_000 + i)
    d = mf.manifest_dir(base)
    # young entries (now barely after publish): nothing pruned
    assert mf.prune_log(base, now_ms=1_000_000 + n + 1) == 0
    assert len(mf._gen_numbers(d)) == n
    # aged an hour: everything below the checkpoint goes
    assert (
        mf.prune_log(base, now_ms=1_000_000 + 3_600_000 + n)
        == mf.CHECKPOINT_EVERY - 1
    )


def test_vacuum_stage_sweep_pid_liveness_and_dedicated_grace(
    spark, tmp_path
):
    """ADVICE r14 (low): vacuum's stage sweep must not rmtree another
    LIVE process's in-flight staging dir — a compaction Spark write
    can legitimately run longer than the file grace. Stage dirs whose
    embedded pid is alive are skipped regardless of age; dead-pid dirs
    sweep only past a DEDICATED horizon (≥1h by default, not the file
    grace_ms)."""
    import time as _time

    store = _mkstore(spark, tmp_path)
    store.append(B, "s1", [Record(body=b"x")])
    base = store.base_dir
    old = _time.time() - 7200  # 2h: past even the dedicated horizon
    # BOTH stage name shapes must be pid-guarded: code-review r15
    # found the guard regex demanded a hyphen before "stage", so plain
    # `_stage-{pid}-` append stages (underscore prefix) never matched
    # and a live process's bulk-append stage could be swept
    live = os.path.join(base, f"_compact-stage-{os.getpid()}-deadbeef")
    live_append = os.path.join(base, f"_stage-{os.getpid()}-0badc0de")
    dead = os.path.join(base, "_compact-stage-999999999-cafebabe")
    young_dead = os.path.join(base, "_stage-999999998-feedface")
    for d in (live, live_append, dead, young_dead):
        os.makedirs(d)
    for d in (live, live_append, dead):
        os.utime(d, (old, old))
    # young_dead keeps its fresh mtime → survives grace_ms=0 because
    # the stage horizon is dedicated (max(grace, 1h)), not grace_ms
    store.vacuum(grace_ms=0)
    assert os.path.isdir(live), "live-pid compact stage dir was swept"
    assert os.path.isdir(live_append), "live-pid append stage dir was swept"
    assert not os.path.isdir(dead), "dead-pid aged stage dir survived"
    assert os.path.isdir(young_dead), "fresh stage dir swept on file grace"
    # explicit stage_grace_ms=0 reclaims dead-pid dirs immediately
    store.vacuum(grace_ms=0, stage_grace_ms=0)
    assert not os.path.isdir(young_dead)
    assert os.path.isdir(live), "live-pid guard must hold at any grace"
    assert os.path.isdir(live_append), "live-pid guard must hold at any grace"
