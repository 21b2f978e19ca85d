"""Crash consistency of the append commit sequence.

The reference's durability boundary is one atomic SlateDB WriteBatch
followed by a durability watermark before acks
(lite/src/backend/streamer.rs:1010-1070, ordered-ack bookkeeping
lite/src/backend/append.rs:96-220). The engine's equivalent is:

    (1) records-parquet write  — the durable commit
    (2) driver hot-state advance (tail / last_ts / token / trim)

Invariant under a crash BETWEEN (1) and (2): the parquet write alone
defines the log. Driver state is a cache, rebuilt from storage on
recovery (store.recover_state / lazy per-stream recovery), so

- every record the write landed is visible to readers after recovery
  and counted in the recovered tail — no phantom or lost seq_nums;
- a fresh append after recovery continues at the recovered tail —
  seq_nums stay contiguous and unique, never reassigned;
- a client retry guarded by match_seq_num (the CAS the reference
  offers for exactly this ack-lost case) is rejected instead of
  double-appending.

The crash is injected by monkeypatching ``_invalidate_records``, which
both append paths call immediately after the parquet write and before
any state mutation reaches a committed ack. Spark's parquet commit
protocol (task temp files + rename) makes step (1) itself all-or-
nothing per batch, which is why the injection point between the steps
is the only window that needs evidence.
"""

from __future__ import annotations

import pytest

from s2_spark.catalog import BasinConfig
from s2_spark.model import Record, SeqNumMismatch
from s2_spark.store import StreamStore

BASIN = "crash-basin"


def _fresh(spark, base):
    """A store over ``base`` whose basin auto-creates streams on append
    (the catalog persists to ``base/_meta``, so a recovery store reads
    the same basin config back)."""
    s = StreamStore(spark, base)
    s.catalog.create_basin(
        BASIN, BasinConfig(create_stream_on_append=True, create_stream_on_read=True)
    )
    return s


class _Boom(RuntimeError):
    pass


def _crashing(store):
    """Make the store 'crash' right after the durable parquet write,
    before hot state advances."""

    def boom():
        raise _Boom("simulated crash between parquet write and state advance")

    store._invalidate_records = boom
    return store


def _all_seqs(store, stream):
    return [
        r["seq_num"]
        for r in store.read(BASIN, stream).select("seq_num").collect()
    ]


def test_unary_crash_between_write_and_state_then_recover(spark, tmp_path):
    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=b"a"), Record(body=b"b"), Record(body=b"c")])

    _crashing(s1)
    with pytest.raises(_Boom):
        s1.append(BASIN, "s", [Record(body=b"d"), Record(body=b"e")])
    # the crashed process's memory is gone; a new store recovers from
    # storage alone
    s2 = StreamStore(spark, base)
    s2.recover_state()
    tail, _ = s2.check_tail(BASIN, "s")
    # the batch was durably written before the crash: it IS in the log
    assert tail == 5
    assert _all_seqs(s2, "s") == [0, 1, 2, 3, 4]

    # a retry guarded by match_seq_num=3 (the tail the client saw
    # before the crashed call) is rejected — the CAS surfaces that the
    # earlier write committed, so nothing is double-appended
    with pytest.raises(SeqNumMismatch):
        s2.append(BASIN, "s", [Record(body=b"d"), Record(body=b"e")], match_seq_num=3)
    assert s2.check_tail(BASIN, "s")[0] == 5

    # an unconditional append continues at the recovered tail: seq_nums
    # stay contiguous and unique (no reassignment over the orphan batch)
    ack = s2.append(BASIN, "s", [Record(body=b"f")])
    assert ack.start_seq == 5
    assert _all_seqs(s2, "s") == [0, 1, 2, 3, 4, 5]


def test_unary_recovery_is_lazy_without_explicit_recover(spark, tmp_path):
    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=b"a")])
    _crashing(s1)
    with pytest.raises(_Boom):
        s1.append(BASIN, "s", [Record(body=b"b")])
    # no recover_state() call: the first touch of the stream on a fresh
    # store probes storage (store._st lazy recovery) and still lands on
    # the post-write tail
    s2 = StreamStore(spark, base)
    assert s2.check_tail(BASIN, "s")[0] == 2
    ack = s2.append(BASIN, "s", [Record(body=b"c")])
    assert ack.start_seq == 2
    assert _all_seqs(s2, "s") == [0, 1, 2]


def test_bulk_append_crash_between_write_and_state_then_recover(spark, tmp_path):
    from pyspark.sql import functions as F

    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)

    def batch(tag, n):
        return spark.range(n).select(
            F.lit(BASIN).alias("basin"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("stream"),
            F.lit(None).cast("long").alias("timestamp"),
            F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
            F.encode(F.concat(F.lit(tag), F.col("id").cast("string")), "utf-8").alias(
                "body"
            ),
            F.col("id").alias("ingest_order"),
        )

    s1.bulk_append(batch("x", 90))  # 30 records per stream
    _crashing(s1)
    with pytest.raises(_Boom):
        s1.bulk_append(batch("y", 30))

    s2 = StreamStore(spark, base)
    s2.recover_state()
    # the crashed bulk batch was durably written: every stream's
    # recovered tail covers it, readers see contiguous seq_nums
    for i in range(3):
        assert s2.check_tail(BASIN, f"s{i}")[0] == 40
        assert _all_seqs(s2, f"s{i}") == list(range(40))

    # a follow-up bulk append sequences strictly after the recovered
    # tails — contiguous, no duplicate assignment anywhere
    s2.bulk_append(batch("z", 30))
    for i in range(3):
        assert _all_seqs(s2, f"s{i}") == list(range(50))


def test_compaction_preserves_durable_catalog_and_audit(spark, tmp_path):
    """compact()/apply_trim_and_retention rewrite the DATA only: the
    durable catalog (_meta) and flushed audit history under base_dir
    must survive the swap — a compaction must never un-create every
    basin and stream."""
    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=b"a"), Record(body=b"b")])
    s1.read(BASIN, "s")
    s1.audit.flush()
    s1.compact()
    s1.apply_trim_and_retention()

    s2 = StreamStore(spark, base)
    # catalog survived: the basin config (auto-create flag) is intact
    assert s2.catalog.get_basin(BASIN).config.create_stream_on_append
    # flushed audit history survived too (checked before this test's
    # own reads add fresh ops to s2's buffer)
    from pyspark.sql import functions as F

    assert s2.audit.df().filter(F.col("op") == "read").count() == 1
    assert s2.check_tail(BASIN, "s")[0] == 2
    assert _all_seqs(s2, "s") == [0, 1]


def test_full_trim_then_physical_delete_preserves_tail(spark, tmp_path):
    """Trimming a stream to its tail and physically applying the trim
    must NOT reset the recovered tail to 0: the highest-seq record (the
    trim command itself) survives the rewrite as the tail keeper, reads
    see nothing, and new appends continue past the old tail — seq_nums
    are never reused."""
    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=b"a"), Record(body=b"b"), Record(body=b"c")])
    s1.trim(BASIN, "s", 1 << 62)  # clamps to its own position + 1 = 4
    s1.apply_trim_and_retention()

    s2 = StreamStore(spark, base)
    s2.recover_state()
    tail, _ = s2.check_tail(BASIN, "s")
    assert tail == 4  # 3 records + the trim command — nothing forgotten
    assert _all_seqs(s2, "s") == []  # fully trimmed: readers see nothing
    ack = s2.append(BASIN, "s", [Record(body=b"d")])
    assert ack.start_seq == 4  # no seq reuse
    assert _all_seqs(s2, "s") == [4]


def test_compaction_keeps_the_defining_trim_command(spark, tmp_path):
    """A later trim with a LOWER payload is dominated by the monotone
    max and must not displace the DEFINING trim command from the
    compaction keep-set: keeping only the latest-by-seq trim and
    deleting the defining one regresses the recovered trim point and
    resurrects every record in between (round-11 fresh-seed sim soak,
    seed 930413 — now also pinned in the sim matrix)."""
    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=bytes([i])) for i in range(8)])
    s1.trim(BASIN, "s", 8)  # seq 8, effective trim 8
    s1.apply_trim_and_retention()  # physically drops seqs 0-7
    s1.trim(BASIN, "s", 1)  # seq 9: DOMINATED (monotone max keeps 8)
    assert _all_seqs(s1, "s") == [8, 9]  # hot state still hides 0-7
    s1.apply_trim_and_retention()

    s2 = StreamStore(spark, base)
    s2.recover_state()
    st = s2._st(BASIN, "s")
    assert st.trim_point == 8, "recovered trim point regressed"
    # nothing resurrected, tail intact, appends continue past it
    assert _all_seqs(s2, "s") == [8, 9]
    assert s2.check_tail(BASIN, "s")[0] == 10
    ack = s2.append(BASIN, "s", [Record(body=b"d")])
    assert ack.start_seq == 10


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(1, 3)),
        st.tuples(st.just("trim"), st.integers(0, 15)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_st)
def test_any_trim_sequence_recovers_exactly_after_compaction(spark, ops):
    """Property form of the trim-keeper rule: for ANY interleaving of
    appends and trims — including dominated trims, self-trimming trims,
    and past-tail clamps — physical compaction followed by cold
    recovery reproduces exactly the monotone-max trim point, the tail,
    and the visible suffix. Generalizes the seed-930413 regression."""
    import tempfile

    base = tempfile.mkdtemp(prefix="trimprop_")
    s1 = _fresh(spark, base)
    tail, trim = 0, 0
    for kind, v in ops:
        if kind == "append":
            s1.append(BASIN, "s", [Record(body=bytes([i])) for i in range(v)])
            tail += v
        else:
            s1.trim(BASIN, "s", v)  # the trim record itself takes seq `tail`
            trim = max(trim, min(v, tail + 1))
            tail += 1
    s1.apply_trim_and_retention()

    s2 = StreamStore(spark, base)
    s2.recover_state()
    st_ = s2._st(BASIN, "s")
    assert (st_.tail_seq, st_.trim_point) == (tail, trim)
    assert _all_seqs(s2, "s") == [s for s in range(tail) if s >= trim]
    ack = s2.append(BASIN, "s", [Record(body=b"next")])
    assert ack.start_seq == tail


def test_purged_stream_name_recreates_fresh(spark, tmp_path):
    """delete_stream → purge → create the same name: the new stream
    must start empty at seq 0, never resurrecting the dead stream's
    records or tail."""
    from s2_spark.operators.maintenance import deletion_purge_sweep

    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "dead", [Record(body=b"ghost1"), Record(body=b"ghost2")])
    s1.catalog.delete_stream(BASIN, "dead")
    deletion_purge_sweep(s1)

    s1.catalog.create_stream(BASIN, "dead")
    assert s1.check_tail(BASIN, "dead")[0] == 0
    assert _all_seqs(s1, "dead") == []
    ack = s1.append(BASIN, "dead", [Record(body=b"fresh")])
    assert ack.start_seq == 0
    assert [
        bytes(r["body"]) for r in s1.read(BASIN, "dead").collect()
    ] == [b"fresh"]


def test_read_unary_zero_limits_mean_exhausted_budget(spark, tmp_path):
    from s2_spark.store import ReadLimit

    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    s1.append(BASIN, "s", [Record(body=b"a")])
    assert s1.read_unary(BASIN, "s", limit=ReadLimit(count=0)).count() == 0
    assert s1.read_unary(BASIN, "s", limit=ReadLimit(bytes=0)).count() == 0


def test_bulk_append_admission_failure_writes_nothing(spark, tmp_path):
    """The other half of validate-then-commit: a batch rejected at
    admission (invalid record) must leave storage untouched — the
    failure is BEFORE the durability boundary, so recovery sees the old
    tail, not a half-committed batch."""
    from pyspark.sql import functions as F

    from s2_spark.model import InvalidRecord

    base = str(tmp_path / "records")
    s1 = _fresh(spark, base)
    good = spark.range(5).select(
        F.lit(BASIN).alias("basin"),
        F.lit("s").alias("stream"),
        F.lit(None).cast("long").alias("timestamp"),
        F.array().cast("array<struct<name binary, value binary>>").alias("headers"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("body"),
        F.col("id").alias("ingest_order"),
    )
    s1.bulk_append(good)
    bad = good.withColumn(
        "headers",
        F.array(
            F.struct(
                F.lit(b"").alias("name"), F.lit(b"not-a-command").alias("value")
            )
        ),
    )
    with pytest.raises(InvalidRecord):
        s1.bulk_append(bad)
    s2 = StreamStore(spark, base)
    s2.recover_state()
    assert s2.check_tail(BASIN, "s")[0] == 5
    assert _all_seqs(s2, "s") == list(range(5))


# --- compaction swap crash atomicity ---------------------------------


def _swap_rename_bomb(monkeypatch, trigger):
    """Crash (raise _Boom) on the first os.rename whose (src, dst)
    matches ``trigger`` — injected into the driver-side swap only;
    Spark's own parquet commit renames happen JVM-side and are
    untouched."""
    import os as _os

    real = _os.rename
    armed = {"on": True}

    def fake(src, dst):
        if armed["on"] and trigger(str(src), str(dst)):
            armed["on"] = False
            raise _Boom("injected crash mid-swap")
        return real(src, dst)

    monkeypatch.setattr(_os, "rename", fake)


def _seed(spark, base):
    # the swap-protocol tests below target the LISTING layout's
    # rename-swap machinery (legacy since the r14 manifest default
    # flip, still fully supported as the migration source) — pin it
    s = StreamStore(spark, base, manifest=False)
    s.catalog.create_basin(
        BASIN, BasinConfig(create_stream_on_append=True, create_stream_on_read=True)
    )
    s.append(BASIN, "s1", [Record(body=f"r{i}".encode()) for i in range(5)])
    s.append(BASIN, "s2", [Record(body=b"x"), Record(body=b"y")])
    return s


def _assert_intact(spark, base):
    r = StreamStore(spark, base, manifest=False)
    r.recover_state()
    assert r.check_tail(BASIN, "s1")[0] == 5
    assert r.check_tail(BASIN, "s2")[0] == 2
    assert _all_seqs(r, "s1") == [0, 1, 2, 3, 4]
    bodies = sorted(
        bytes(x["body"]) for x in r.read(BASIN, "s1").collect()
    )
    assert bodies == sorted(f"r{i}".encode() for i in range(5))
    return r


def test_compaction_crash_during_trash_phase_recovers(spark, tmp_path, monkeypatch):
    """Crash while old entries move to .trash (phase 2): base_dir holds
    partial old data, .compact holds the complete rewrite — reopening
    the store completes the swap and loses nothing."""
    base = str(tmp_path / "records")
    s = _seed(spark, base)
    trash = base + ".trash"
    _swap_rename_bomb(monkeypatch, lambda src, dst: dst.startswith(trash))
    with pytest.raises(_Boom):
        s.compact()
    monkeypatch.undo()
    _assert_intact(spark, base)


def test_compaction_crash_during_swap_in_phase_recovers(spark, tmp_path, monkeypatch):
    """Crash on the FIRST rename out of .compact (phase 3): base_dir
    holds ZERO data entries — the exact window the old delete-then-
    rename order left unrecoverable. Reopen must see every record and
    tail, and a fresh append must continue at the recovered tail."""
    base = str(tmp_path / "records")
    s = _seed(spark, base)
    tmp = base + ".compact"
    _swap_rename_bomb(monkeypatch, lambda src, dst: src.startswith(tmp))
    with pytest.raises(_Boom):
        s.compact()
    monkeypatch.undo()
    # worst case on disk: no data files in base_dir at all
    data_entries = [
        e for e in __import__("os").listdir(base) if not e.startswith(("_", "."))
    ]
    assert data_entries == []
    r = _assert_intact(spark, base)
    ack = r.append(BASIN, "s1", [Record(body=b"after")])
    assert ack.start_seq == 5


def test_compaction_crash_retry_on_same_store_recovers(spark, tmp_path, monkeypatch):
    """The caller catches the crash and retries compact() on the SAME
    store object: _rewrite's leading _swap_recover must finish the
    interrupted swap (and refresh the cached file listing) before the
    retry captures its input df."""
    base = str(tmp_path / "records")
    s = _seed(spark, base)
    tmp = base + ".compact"
    _swap_rename_bomb(monkeypatch, lambda src, dst: src.startswith(tmp))
    with pytest.raises(_Boom):
        s.compact()
    monkeypatch.undo()
    s.compact()  # retry completes cleanly
    assert s.check_tail(BASIN, "s1")[0] == 5
    assert _all_seqs(s, "s1") == [0, 1, 2, 3, 4]


def test_incomplete_compact_write_discarded_and_trash_restored(spark, tmp_path):
    """A .compact dir WITHOUT _SUCCESS is a mid-write casualty: reopen
    discards it; an orphaned .trash (belt-and-braces — unreachable
    under the current ordering) restores rather than deletes."""
    import os
    import shutil

    base = str(tmp_path / "records")
    s = _seed(spark, base)
    del s
    tmp = base + ".compact"
    trash = base + ".trash"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")  # no _SUCCESS: incomplete write
    os.makedirs(trash)
    for e in list(os.listdir(base)):
        if not e.startswith(("_", ".")):
            os.rename(os.path.join(base, e), os.path.join(trash, e))
    _assert_intact(spark, base)
    assert not os.path.exists(tmp) and not os.path.exists(trash)


def test_swap_recovery_does_not_key_on_sparks_success_marker(
    spark, tmp_path, monkeypatch
):
    """Clusters commonly set mapreduce.fileoutputcommitter.
    marksuccessfuljobs=false, which suppresses _SUCCESS. Recovery keyed
    on _SUCCESS would misread a COMPLETE rewrite crashed during phase 3
    as died-mid-write: discard the remaining .compact entries, keep the
    already-renamed new ones, and restore the trash beside them —
    mixed old+new data with duplicate seqs. The store's own _COMPLETE
    marker (written after the write returns, committer-independent)
    must carry the recovery alone."""
    import os

    base = str(tmp_path / "records")
    s = _seed(spark, base)
    tmp = base + ".compact"
    # crash on the SECOND rename out of .compact: some new entries are
    # already in base_dir, some still in .compact — the mixed window
    seen = {"n": 0}

    def second_out(src, dst):
        if str(src).startswith(tmp):
            seen["n"] += 1
            return seen["n"] == 2
        return False

    _swap_rename_bomb(monkeypatch, second_out)
    with pytest.raises(_Boom):
        s.compact()
    monkeypatch.undo()
    # simulate the committer tuning: no _SUCCESS was ever written
    success = os.path.join(tmp, "_SUCCESS")
    if os.path.exists(success):
        os.remove(success)
    assert os.path.exists(os.path.join(tmp, "_COMPLETE"))
    r = _assert_intact(spark, base)  # recovery completes the swap
    # exactly one copy of every record: no old+new duplicates
    assert not os.path.exists(tmp) and not os.path.exists(base + ".trash")
    ack = r.append(BASIN, "s1", [Record(body=b"after")])
    assert ack.start_seq == 5


def test_compaction_crash_bucketed_layout_recovers(spark, tmp_path, monkeypatch):
    """Same zero-data-files crash window, bucketed layout: the swap
    moves whole bucket=N directories (names COLLIDE between old and new
    data, unlike part files) — the trash-first ordering is what makes
    the swap safe, and recovery must restore every bucket."""
    base = str(tmp_path / "records")
    s = StreamStore(spark, base, bucket_count=4, manifest=False)
    s.catalog.create_basin(
        BASIN, BasinConfig(create_stream_on_append=True, create_stream_on_read=True)
    )
    s.append(BASIN, "s1", [Record(body=f"r{i}".encode()) for i in range(5)])
    s.append(BASIN, "s2", [Record(body=b"x"), Record(body=b"y")])
    tmp = base + ".compact"
    _swap_rename_bomb(monkeypatch, lambda src, dst: src.startswith(tmp))
    with pytest.raises(_Boom):
        s.compact()
    monkeypatch.undo()
    r = StreamStore(spark, base, bucket_count=4, manifest=False)
    r.recover_state()
    assert r.check_tail(BASIN, "s1")[0] == 5
    assert r.check_tail(BASIN, "s2")[0] == 2
    assert _all_seqs(r, "s1") == [0, 1, 2, 3, 4]


def test_compaction_preserves_append_landed_after_listing(spark, tmp_path):
    """Round-12 live find (REAL acked-data loss): appends commit
    concurrently with a rewrite — they do not wait on the rewrite
    latch — so a batch landing between the rewrite's listing snapshot
    and the swap holds acked records the compacted output lacks. The
    old phase 2 renamed EVERY data entry to the trash and deleted it
    with the trash (reproduced: 12 acked appends racing 3 compactions
    lost 11 records). The consumed-set swap (`_CONSUMED` manifest =
    the rewrite's inputFiles snapshot) must leave such files alone.

    Deterministic, not raced: the append is injected at the exact
    window — after the rewrite's listing/inputFiles capture, before
    phase 2 — by wrapping `_swap_in`."""
    base = str(tmp_path / "records")
    s = _seed(spark, base)

    real_swap_in = s._swap_in
    injected = []

    def swap_in_with_midflight_append(tmp, resume=False):
        if not injected:
            injected.append(True)
            ack = s.append(BASIN, "s1", [Record(body=b"landed-late")])
            injected.append(ack.start_seq)
        return real_swap_in(tmp, resume=resume)

    s._swap_in = swap_in_with_midflight_append
    try:
        s.compact()
    finally:
        s._swap_in = real_swap_in
    assert injected, "injection did not run"

    # the acked late append must survive the swap — same store AND a
    # cold recovery store must both see it at its acked position
    assert _all_seqs(s, "s1") == [0, 1, 2, 3, 4, 5]
    assert bytes(
        s.read(BASIN, "s1").filter("seq_num = 5").collect()[0]["body"]
    ) == b"landed-late"
    r = StreamStore(spark, base, manifest=False)
    r.recover_state()
    assert r.check_tail(BASIN, "s1")[0] == 6
    assert _all_seqs(r, "s1") == [0, 1, 2, 3, 4, 5]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_st, crash_at=st.integers(0, 5))
def test_any_trim_sequence_recovers_exactly_manifest_publish_crash(
    spark, ops, crash_at
):
    """Manifest-mode property form of the trim-keeper rule, with the
    compaction rewrite crashing at the ``crash_at``-th protocol step —
    a staged-output rename or the generation PUBLISH itself (the
    single commit point; VERDICT r13 task 1). Whether the publish
    landed (rewrite committed) or not (rewrite discarded, orphans
    invisible), cold recovery plus a zero-grace vacuum must reproduce
    exactly the monotone-max trim point, the tail, and the visible
    suffix, and the next append must take the recovered tail. When
    ``crash_at`` exceeds the protocol's step count the rewrite simply
    completes — both outcomes are inside the property."""
    import os as _os
    import tempfile

    base = tempfile.mkdtemp(prefix="mftrimprop_")
    s1 = StreamStore(spark, base, manifest=True)
    s1.catalog.create_basin(
        BASIN,
        BasinConfig(create_stream_on_append=True, create_stream_on_read=True),
    )
    tail, trim = 0, 0
    for kind, v in ops:
        if kind == "append":
            s1.append(BASIN, "s", [Record(body=bytes([i])) for i in range(v)])
            tail += v
        else:
            s1.trim(BASIN, "s", v)
            trim = max(trim, min(v, tail + 1))
            tail += 1

    # the publish commit point is os.link since r14 (create-if-absent);
    # intercepting only rename/replace would silently stop covering
    # the "crash at the publish itself" arm of the property
    real_replace, real_rename, real_link = _os.replace, _os.rename, _os.link
    calls = {"n": 0}

    def _step(src, dst, real):
        if "_compact-stage-" in str(src) or f"_manifest{_os.sep}" in str(dst):
            calls["n"] += 1
            if calls["n"] > crash_at:
                raise _Boom("injected manifest protocol crash")
        return real(src, dst)

    _os.replace = lambda src, dst: _step(src, dst, real_replace)
    _os.rename = lambda src, dst: _step(src, dst, real_rename)
    _os.link = lambda src, dst: _step(src, dst, real_link)
    try:
        s1.apply_trim_and_retention()
    except _Boom:
        pass
    finally:
        _os.replace, _os.rename, _os.link = (
            real_replace, real_rename, real_link,
        )

    s2 = StreamStore(spark, base)
    assert s2.manifest
    s2.vacuum(grace_ms=0)
    s2.recover_state()
    st_ = s2._st(BASIN, "s")
    assert (st_.tail_seq, st_.trim_point) == (tail, trim)
    assert _all_seqs(s2, "s") == [s for s in range(tail) if s >= trim]
    ack = s2.append(BASIN, "s", [Record(body=b"next")])
    assert ack.start_seq == tail
