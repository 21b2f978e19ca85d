"""S2 streaming source — a Spark 4 Python Data Source.

Re-expresses the reference's read-session / live-tail machinery
(``lite/src/backend/read.rs:183-240``) in Structured Streaming terms:

- **offsets** = ``{ "basin\\0stream": next_seq_num }`` — exactly the
  per-stream positions the reference encodes in SSE ``Last-Event-Id``
  (``api/src/v1/stream/sse.rs:10-73``); Spark checkpoints them, so a
  restarted query resumes where it left off (A14/A28).
- **latestOffset** = the tails scan (``check_tail``, A15).
- **partitions** = one input split per stream per micro-batch — the
  per-stream single-reader discipline; N streams read in parallel
  across executors.
- **read()** runs executor-side over pyarrow with filter pushdown on
  ``(basin, stream, seq_num)`` — the catch-up scan with key-range
  pruning (``read.rs:111-131``).

Caught-up live tailing = successive micro-batches where ``partitions``
returns only streams whose tail advanced (heartbeat ≡ empty progress).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from s2_spark.model import RECORD_SCHEMA

SEP = "\x00"


class _StreamSlice(InputPartition):
    def __init__(self, path: str, basin: str, stream: str, start: int, end: int):
        self.path = path
        self.basin = basin
        self.stream = stream
        self.start = start
        self.end = end


def _parquet_files(path: str) -> list[str]:
    """Data files only — hidden/metadata entries (underscore or dot
    prefixed, e.g. the store's ``_meta`` catalog) are skipped, matching
    Spark's and pyarrow's hidden-path filters."""
    out = []
    for d, dirs, fs in os.walk(path):
        dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
        out.extend(
            os.path.join(d, f)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def _file_tails(file_path: str, stats: dict | None = None) -> dict[str, int]:
    """Per-stream next_seq for one parquet file, from footer metadata.

    Row groups whose (basin, stream) min==max statistics show a single
    stream contribute their seq_num max without touching data pages —
    the Spark analogue of the reference's tail rows in the KV store
    (lite/src/backend/kv/mod.rs:55-95). Only mixed row groups fall back
    to a 3-column vectorized read of just those groups."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    idx = {name: i for i, name in enumerate(pf.schema_arrow.names)}
    tails: dict[str, int] = {}
    mixed: list[int] = []
    for g in range(pf.metadata.num_row_groups):
        rg = pf.metadata.row_group(g)
        if rg.num_rows == 0:
            continue
        sb = rg.column(idx["basin"]).statistics
        ss = rg.column(idx["stream"]).statistics
        sq = rg.column(idx["seq_num"]).statistics
        if (
            sb is not None and ss is not None and sq is not None
            and sb.has_min_max and ss.has_min_max and sq.has_min_max
            and sb.min == sb.max and ss.min == ss.max
        ):
            k = f"{sb.min}{SEP}{ss.min}"
            tails[k] = max(tails.get(k, 0), sq.max + 1)
        else:
            mixed.append(g)
    if mixed:
        tbl = pf.read_row_groups(mixed, columns=["basin", "stream", "seq_num"])
        agg = tbl.group_by(["basin", "stream"]).aggregate([("seq_num", "max")])
        for b, s, q in zip(
            agg.column("basin").to_pylist(),
            agg.column("stream").to_pylist(),
            agg.column("seq_num_max").to_pylist(),
        ):
            k = f"{b}{SEP}{s}"
            tails[k] = max(tails.get(k, 0), q + 1)
    if stats is not None:
        stats["files"] = stats.get("files", 0) + 1
        stats["mixed_row_groups"] = stats.get("mixed_row_groups", 0) + len(mixed)
    return tails


def _tails(
    path: str,
    cache: dict[str, tuple[tuple, dict[str, int]]] | None = None,
    stats: dict | None = None,
) -> dict[str, int]:
    """Per-stream next_seq for the whole store — footer statistics only
    (no data pages for single-stream row groups), incremental via
    ``cache``: parquet files are immutable once written, so each trigger
    pays only for files that appeared since the last one. Per-trigger
    cost is O(new files), independent of total store size."""
    if not os.path.isdir(path):
        return {}
    tails: dict[str, int] = {}
    listed = _parquet_files(path)
    if cache is not None:
        # evict entries for files removed by compaction/trim rewrites —
        # a long-running query over a periodically-compacted store must
        # not leak cache entries for files that no longer exist
        live = set(listed)
        for gone in [fp for fp in cache if fp not in live]:
            del cache[gone]
    for fp in listed:
        try:
            st = os.stat(fp)
        except OSError:
            continue
        key = (st.st_mtime_ns, st.st_size)
        if cache is not None and fp in cache and cache[fp][0] == key:
            file_tails = cache[fp][1]
        else:
            try:
                file_tails = _file_tails(fp, stats)
            except (OSError, ValueError):
                continue
            if cache is not None:
                cache[fp] = (key, file_tails)
        for k, v in file_tails.items():
            if v > tails.get(k, 0):
                tails[k] = v
    return tails


def _purges_dir(path: str) -> str:
    return os.path.join(path, "_purges")


def _purge_gens(
    path: str, cache: dict | None = None
) -> dict[str, int]:
    """Per-stream purge-generation tombstones written by
    ``StreamStore._record_purges`` after a deleted stream's records are
    physically dropped. A generation bump tells a running reader that
    everything it knew about the stream (tail guard, high-water mark,
    byte budget) described a DEAD stream: a recreated stream of the
    same name is a new stream starting at seq 0.

    ``cache`` (a one-entry dict the caller owns) keys the parse on the
    directory's mtime, so the per-trigger hot path costs one stat —
    not N file opens — once the store has ever purged anything."""
    d = _purges_dir(path)
    try:
        key = os.stat(d).st_mtime_ns
    except OSError:
        return {}
    if cache is not None and cache.get("key") == key:
        return cache["gens"]
    out: dict[str, int] = {}
    for f in os.listdir(d):
        if not f.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
            out[f"{m['basin']}{SEP}{m['stream']}"] = int(m["gen"])
        except (OSError, ValueError, KeyError):
            continue  # torn/foreign file: ignore, next trigger retries
    if cache is not None:
        cache["key"] = key
        cache["gens"] = out
    return out


def _rebase_marker_path(path: str, k: str) -> str:
    import hashlib

    return os.path.join(
        _purges_dir(path), hashlib.sha1(k.encode()).hexdigest()[:24] + ".rebase"
    )


def _read_rebase_markers(path: str) -> dict[str, int]:
    """Planned-rebase markers: partitions() wrote one when it planned a
    dead-generation batch from the new stream's head, commit() removes
    it. A fresh reader replaying that exact batch after a crash uses it
    to reproduce the rebase instead of silently planning nothing."""
    d = _purges_dir(path)
    out: dict[str, int] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if not f.endswith(".rebase"):
            continue
        try:
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
            out[m["key"]] = int(m["end"])
        except (OSError, ValueError, KeyError):
            continue
    return out


class S2StreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.basin = options.get("basin")
        self.stream = options.get("stream")
        self.start_seq = int(options.get("startseq", 0))
        # admission control / backpressure (the reference's in-flight
        # bytes semaphore, streamer.rs:815-838): cap how far each
        # stream's offset advances per micro-batch
        self.max_per_trigger = int(options.get("maxrecordspertrigger", 0))
        # total per-stream records budget (SSE Last-Event-Id count
        # decrement, records.rs:49-65): the cap start_seq+maxrecords is
        # deterministic, so a checkpoint-restarted query still stops at
        # the original combined limit — the remaining budget is exactly
        # cap minus the checkpointed offset.
        self.max_records = int(options.get("maxrecords", 0))
        # total per-stream metered-bytes budget (the SSE Last-Event-Id
        # bytes decrement, api/src/v1/stream/sse.rs:10-73 applied in
        # lite/src/handlers/v1/records.rs:49-65). Cumulative metered
        # bytes from start_seq are a pure function of the immutable log,
        # so the byte-capped end seq replans identically across
        # checkpoint restarts — no offset-format change needed. Planning
        # reads ≤ maxbytes of record data driver-side over the session's
        # lifetime (incremental, cached); the unbudgeted hot path never
        # touches data pages on the driver.
        self.max_bytes = int(options.get("maxbytes", 0))
        self._bytes_scan: dict[str, tuple[int, int]] = {}  # key -> (next_seq, cum)
        self._bytes_cap: dict[str, int] = {}  # key -> resolved final cap
        # driver-side per-file tails cache: each trigger's latestOffset
        # only inspects files that appeared since the previous trigger
        self._tails_cache: dict[str, tuple[tuple, dict[str, int]]] = {}
        self.tails_stats: dict = {}
        # purge-generation tracking: tombstones existing when the
        # reader starts are history (a restarted query resumes at its
        # checkpoint — a purge that happened while the query was DOWN
        # is not replayed); only a bump observed while running rebases
        self._max_seen: dict[str, int] = {}
        self._rebased: set[str] = set()
        # per rebased key: end offsets partitions() actually PLANNED
        # with the rebase — the only commits allowed to end that key's
        # rebase window (a dead-generation commit can carry any value,
        # including one numerically equal to a reported new-gen tail,
        # so value membership of reported ends is not attribution)
        self._planned_ends: dict[str, set[int]] = {}
        self._purge_cache: dict = {}
        self._purge_gens_seen: dict[str, int] = _purge_gens(
            self.path, self._purge_cache
        )
        # a crash between the offset-log write and the batch commit of
        # a REBASED batch leaves its marker on disk: the replay of that
        # exact (key, end) must rebase again or the new generation's
        # head is silently skipped
        self._pending_rebase: dict[str, int] = _read_rebase_markers(self.path)

    def _filtered(self, tails: dict[str, int]) -> dict[str, int]:
        out = {}
        for k, v in tails.items():
            b, s = k.split(SEP, 1)
            if self.basin and b != self.basin:
                continue
            if self.stream and s != self.stream:
                continue
            out[k] = v
        return out

    def initialOffset(self) -> dict:
        # start of the log (or a requested seq) for every known stream;
        # streams discovered later start at 0 via partitions()
        tails = _tails(self.path, self._tails_cache, self.tails_stats)
        return {k: self.start_seq for k in self._filtered(tails)}

    def latestOffset(self) -> dict:
        # Note: with rate limiting we still report true tails here and
        # clamp in latestOffset-vs-start at partition planning; Spark's
        # DataSourceStreamReader contract applies offsets as reported,
        # so clamping must happen where the end offset is produced.
        tails = self._filtered(_tails(self.path, self._tails_cache, self.tails_stats))
        # a purge-generation bump means the stream was deleted and its
        # records physically dropped: the old tail/HWM/budget state
        # describes a dead generation — forget it, and rebase delivery
        # at the (possibly recreated) stream's own head
        for k, g in _purge_gens(self.path, self._purge_cache).items():
            if g > self._purge_gens_seen.get(k, 0):
                self._purge_gens_seen[k] = g
                self._max_seen.pop(k, None)
                self._rebased.add(k)
                if getattr(self, "_baseline", None):
                    self._baseline.pop(k, None)
                self._bytes_scan.pop(k, None)
                self._bytes_cap.pop(k, None)
        # monotone guard: a concurrent compaction rewrite can leave the
        # directory momentarily empty/partial; tails only ever grow
        # WITHIN a stream generation, so serve the max ever observed
        # per stream instead of regressing the offset log
        for k, v in self._max_seen.items():
            if tails.get(k, 0) < v:
                tails[k] = v
        self._max_seen = dict(tails)
        if self.max_records > 0:
            cap = self.start_seq + self.max_records
            tails = {k: min(v, cap) for k, v in tails.items()}
        if self.max_bytes > 0:
            tails = {k: min(v, self._byte_capped(k, v)) for k, v in tails.items()}
        if self.max_per_trigger > 0:
            base = getattr(self, "_baseline", {})
            tails = {
                k: min(v, base.get(k, self.start_seq) + self.max_per_trigger)
                for k, v in tails.items()
            }
            # After a checkpoint restart this reader is cold (_baseline
            # empty, and initialOffset is not re-invoked), so the end
            # reported here can fall BELOW the checkpointed start. That
            # is repaired at partitions(): the high-water clamp never
            # re-delivers below any start/end ever seen, and the next
            # trigger's baseline is the true checkpointed position.
        return tails

    _BYTES_SCAN_WINDOW = 4096  # records per driver-side planning read

    def _byte_capped(self, key: str, tail: int) -> int:
        """Largest seq e ≤ tail with metered(start_seq..e) ≤ max_bytes —
        the deterministic byte-budget cutoff (records.rs:49-65 combined
        limit). Scans forward incrementally in seq windows and stops at
        the first record that would exceed the budget, so the driver
        reads at most ~max_bytes of data over the whole session."""
        if key in self._bytes_cap:
            return min(self._bytes_cap[key], tail)
        nxt, cum = self._bytes_scan.get(key, (self.start_seq, 0))
        if tail <= nxt:
            return tail
        import pyarrow.dataset as ds

        b, s = key.split(SEP, 1)
        dataset = ds.dataset(self.path, format="parquet")
        while nxt < tail:
            hi = min(nxt + self._BYTES_SCAN_WINDOW, tail)
            flt = (
                (ds.field("basin") == b)
                & (ds.field("stream") == s)
                & (ds.field("seq_num") >= nxt)
                & (ds.field("seq_num") < hi)
            )
            table = dataset.to_table(
                filter=flt, columns=["seq_num", "headers", "body"]
            ).sort_by("seq_num")
            from s2_spark.model import metered_size_bytes

            for seq, headers, body in zip(
                table.column("seq_num").to_pylist(),
                table.column("headers").to_pylist(),
                table.column("body").to_pylist(),
            ):
                m = metered_size_bytes(headers, body)
                if cum + m > self.max_bytes:
                    self._bytes_cap[key] = seq  # budget exhausted — final
                    return seq
                cum += m
            nxt = hi
        self._bytes_scan[key] = (tail, cum)
        return tail

    def partitions(self, start: dict, end: dict):
        """Plan one slice per advanced stream, clamped by the high-water
        mark: no slice ever re-reads below ANY start/end offset this
        reader has seen. That makes restart rate-limiting safe — on a
        cold reader latestOffset can report an end below the
        checkpointed start (it has no baseline yet); the engine records
        that regressed end in its offset log and uses it as the next
        start, and without the clamp the batch after would re-deliver
        everything between the regressed end and the true checkpointed
        position. The clamp also hardens against any transient
        tails-scan regression. The baseline is advanced here (not just
        in commit) because partitions() sees every PLANNED batch."""
        prior = dict(getattr(self, "_baseline", None) or {})
        rebased = getattr(self, "_rebased", set())
        pending = getattr(self, "_pending_rebase", {})
        parts = []
        for k, e in end.items():
            s = start.get(k, self.start_seq)
            # a fresh reader replaying a crashed REBASED batch: the
            # marker records exactly (key, end); the start!=end guard
            # keeps a coincidentally-equal later end from re-triggering
            if (
                k not in rebased
                and pending.get(k) == e
                and start.get(k) != e
            ):
                rebased.add(k)
                self._max_seen.pop(k, None)
                prior.pop(k, None)
            s = max(s, prior.get(k, s))  # never re-deliver below the HWM
            if k in rebased:
                # dead generation: the checkpointed start describes the
                # purged stream — deliver the new stream from its head,
                # and record the exact planned end: the ONLY commit that
                # may end the rebase window, durably (marker survives a
                # crash until that commit arrives)
                s = self.start_seq
                self._planned_ends.setdefault(k, set()).add(e)
                self._write_rebase_marker(k, e)
            if e > s:
                b, st = k.split(SEP, 1)
                parts.append(_StreamSlice(self.path, b, st, s, e))
        for src in (start, end):
            for k, v in src.items():
                if src is start and k in rebased:
                    continue  # a dead generation's start must not re-pin
                if v > prior.get(k, -1):
                    prior[k] = v
        self._baseline = prior
        # Spark requires ≥1 partition per batch; emit an empty slice as
        # the heartbeat (read.rs:383-391) when no stream advanced.
        if not parts:
            parts.append(_StreamSlice(self.path, "", "", 0, 0))
        return parts

    def commit(self, end: dict) -> None:
        # offsets live in the checkpoint; the baseline (high-water mark)
        # only ever advances — rate limiting moves window-by-window
        base = dict(getattr(self, "_baseline", None) or {})
        rebased = getattr(self, "_rebased", set())
        pending = getattr(self, "_pending_rebase", {})
        for k, v in end.items():
            # any commit for k consumes a leftover replay marker: the
            # batch sequence has moved past it either way
            if k in pending:
                pending.pop(k, None)
                self._remove_rebase_marker(k)
            if k in rebased:
                # Spark commits batch N only when batch N+1 starts, so
                # the commit arriving right after a rebase usually
                # belongs to the DEAD generation (its end is the purged
                # stream's old tail — and can even NUMERICALLY equal the
                # new generation's tail). Only an end partitions()
                # actually PLANNED with the rebase ends the window; a
                # dead-generation end must neither clear the flag nor
                # re-pin the HWM.
                if v in self._planned_ends.get(k, ()):
                    rebased.discard(k)
                    self._planned_ends.pop(k, None)
                    self._remove_rebase_marker(k)
                else:
                    continue
            if v > base.get(k, -1):
                base[k] = v
        self._baseline = base

    def _write_rebase_marker(self, k: str, e: int) -> None:
        try:
            d = _purges_dir(self.path)
            os.makedirs(d, exist_ok=True)
            p = _rebase_marker_path(self.path, k)
            with open(p + ".tmp", "w") as f:
                json.dump({"key": k, "end": e}, f)
            os.replace(p + ".tmp", p)
        except OSError:
            pass  # best-effort: without it only the crash-replay edge widens

    def _remove_rebase_marker(self, k: str) -> None:
        try:
            os.remove(_rebase_marker_path(self.path, k))
        except OSError:
            pass

    def read(self, partition: _StreamSlice):
        if partition.end <= partition.start:
            return
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.path, format="parquet")
        flt = (
            (ds.field("basin") == partition.basin)
            & (ds.field("stream") == partition.stream)
            & (ds.field("seq_num") >= partition.start)
            & (ds.field("seq_num") < partition.end)
        )
        cols = [f.name for f in RECORD_SCHEMA.fields]
        table = dataset.to_table(filter=flt, columns=cols)
        # deliver in seq order (total order per stream); yield Arrow
        # batches so the hot path stays vectorized end-to-end — record
        # bodies never pass through Python objects
        yield from table.sort_by("seq_num").to_batches()


class S2StreamDataSource(DataSource):
    """spark.readStream.format("s2").option("path", dir).load()"""

    @classmethod
    def name(cls) -> str:
        return "s2"

    def schema(self):
        return RECORD_SCHEMA

    def streamReader(self, schema):
        return S2StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(S2StreamDataSource)
