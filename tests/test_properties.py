"""Property-based tests (hypothesis) mirroring the reference's proptest
layer (SURVEY.md §5.2): metering arithmetic, command-record roundtrips,
read-limit math, name validation, header fidelity, and the timestamping
fold invariants. Pure-Python model properties — no Spark session needed,
so they run in milliseconds like the reference's codec proptests."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from s2_spark.catalog import validate_basin_name, validate_stream_name
from s2_spark.model import (
    InvalidRecord,
    Record,
    S2Error,
    fence_record,
    trim_record,
)

headers_st = st.lists(
    st.tuples(
        st.binary(min_size=1, max_size=16), st.binary(min_size=0, max_size=32)
    ),
    max_size=8,
)


@given(headers=headers_st, body=st.binary(max_size=256))
def test_metered_size_formula(headers, body):
    """8 + 2·H + Σ(name+value) + body (common/src/record/mod.rs:204-212)."""
    r = Record(body=body, headers=headers)
    expected = 8 + 2 * len(headers) + sum(len(n) + len(v) for n, v in headers) + len(body)
    assert r.metered_size() == expected


@given(seq=st.integers(min_value=0, max_value=2**63 - 1))
def test_trim_payload_roundtrip(seq):
    """u64 BE payload roundtrip (command.rs:186-194 proptest)."""
    r = trim_record(seq)
    assert r.command() == "trim"
    assert int.from_bytes(r.body, "big") == seq
    r.validate()


@given(tok=st.text(max_size=12))
def test_fence_token_roundtrip(tok):
    r = fence_record(tok)
    assert r.command() == "fence"
    assert r.body.decode("utf-8") == tok
    if len(r.body) <= 36:
        r.validate()


@given(tok_len=st.integers(min_value=37, max_value=100))
def test_fence_token_over_36_bytes_rejected(tok_len):
    with pytest.raises(InvalidRecord):
        fence_record("x" * tok_len).validate()


@given(headers=headers_st, body=st.binary(max_size=64))
def test_envelope_never_misdetected_as_command(headers, body):
    """Envelopes have non-empty header names → command() is None; the
    discriminator is exactly 'one header with empty name'
    (record/mod.rs:74-103)."""
    r = Record(body=body, headers=headers)
    assert r.command() is None  # names are ≥1 byte by construction
    r.validate()


@given(name=st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=8, max_size=48))
def test_basin_name_validation_accepts_valid_shapes(name):
    if name[0] in "-" or name[-1] in "-":
        with pytest.raises(S2Error):
            validate_basin_name(name)
    else:
        validate_basin_name(name)


@given(name=st.text(min_size=0, max_size=600))
def test_stream_name_validation(name):
    nbytes = len(name.encode())
    if 1 <= nbytes <= 512 and name not in (".", ".."):
        validate_stream_name(name)
    else:
        with pytest.raises(S2Error):
            validate_stream_name(name)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=50),
    budget=st.integers(min_value=0, max_value=2000),
)
def test_bytes_limit_prefix_math(sizes, budget):
    """The read bytes-limit keeps the longest prefix with cumulative
    metered size ≤ budget; empty when the first record exceeds it
    (read_extent.rs:18-137, tests read.rs:490-626). Model-checks the
    cumulative-sum-filter formulation used in store.read."""
    cum, keep = 0, 0
    for s in sizes:
        if cum + s > budget:
            break
        cum += s
        keep += 1
    # the window-filter formulation: rows where running total ≤ budget
    running, kept_by_filter = 0, 0
    for s in sizes:
        running += s
        if running <= budget:
            kept_by_filter += 1
    assert keep == kept_by_filter  # prefix property: both agree


@given(
    client_ts=st.lists(
        st.one_of(st.none(), st.integers(min_value=0, max_value=10_000)), min_size=1, max_size=30
    ),
    arrival=st.integers(min_value=0, max_value=10_000),
    start_last=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200)
def test_timestamping_fold_monotone_and_capped(client_ts, arrival, start_last):
    """client-prefer + capped: the assigned sequence is non-decreasing,
    ≥ prior last_ts, and each ts ≤ max(arrival, prior running max)
    (streamer.rs:986-1008)."""
    last = start_last
    out = []
    for c in client_ts:
        ts = arrival if c is None else min(c, arrival)
        ts = max(ts, last)
        last = ts
        out.append(ts)
    assert all(a <= b for a, b in zip(out, out[1:]))
    assert all(t >= start_last for t in out)
    assert all(t <= max(arrival, start_last) for t in out)
