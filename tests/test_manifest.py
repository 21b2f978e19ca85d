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

    def racing_publish(add=(), remove=()):
        if fired["n"] == 0 and remove:  # the compaction's publish
            fired["n"] += 1
            store.append(B, "s1", [Record(body=b"racer")])
        return real_publish(add=add, remove=remove)

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
    dropped = mf.prune_log(store.base_dir)
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
    legacy = StreamStore(spark, base, catalog=cat)
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


def test_manifest_publish_gen_collision_is_loud(spark, tmp_path):
    """Two writers racing one generation number fail loudly (the
    single-writer contract; an object-store port gets this from the
    conditional PUT)."""
    store = _mkstore(spark, tmp_path)
    store.append(B, "s1", [Record(body=b"x")])
    gen, _ = store._manifest_current()
    with pytest.raises(RuntimeError, match="already exists"):
        mf.write_gen(store.base_dir, gen, ["a"], [], None)


def test_manifest_vacuum_requires_manifest_mode(spark, tmp_path):
    cat = Catalog(spark)
    cat.create_basin(B, BasinConfig(create_stream_on_append=True))
    store = StreamStore(spark, str(tmp_path / "records"), catalog=cat)
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
    mf.prune_log(base)
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
