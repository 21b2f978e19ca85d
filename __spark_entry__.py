"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared-query registry from
``s2_spark.suite`` (SURVEY.md §2.B) — each entry is one implemented
operator, with the DuckDB oracle SQL the driver co-executes.
"""

from __future__ import annotations

import glob
import json
import re
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from s2_spark.registry import all_queries  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

_REPO = Path(__file__).resolve().parent


def _latest_driver_status() -> tuple[dict[str, int], dict[str, int]]:
    """Latest per-query driver outcome from CORRECTNESS_r*.json files.

    Returns ``(status, proof_round)``: status is 0 = never scored,
    1 = scored but not proven (crash, mismatch, or rows-only
    ``no_oracle``), 2 = proven (hash_match true); proof_round is the
    round number of the LATEST scoring (for aging — the oldest proofs
    rotate back into the scored prefix first, so no proof goes stale
    while newer entries hog the budget).
    """
    status: dict[str, int] = {}
    proof_round: dict[str, int] = {}
    for path in sorted(glob.glob(str(_REPO / "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            status[name] = 2 if row.get("hash_match") is True else 1
            proof_round[name] = rnd
    return status, proof_round


def _family(name: str) -> str:
    m = re.match(r"^([a-z]+)", name)
    return m.group(1) if m else name


# Queries that entered round 3 without driver evidence. Entries
# registered AFTER this snapshot must not displace them in the scoring
# prefix — the round-2 verdict's top priority is clearing this backlog,
# so newly added queries queue behind it (and get scored with any
# leftover budget this round, or next round).
_R03_BACKLOG = frozenset({
    "f5_map_struct", "f18_array_advanced", "j11_asof_generalized",
    "sc3_range_scan_seq", "pf3_in_case", "set1_union_all",
    "sl3_multi_col_sort", "st3_tail_offset", "str3_session_window",
    "tpch6_revenue_delta", "w1_row_number", "f19_math_extra",
    "sc4_range_scan_ts", "set2_intersect", "st4_clamp",
    "str4_watermark_survivors", "tpch10_returned_items", "w2_rank",
    "set3_except", "st5_trim_visibility", "str5_stateful_dedup",
    "tpch4_order_priority", "w3_lag_regress", "st6_retention_cutoff",
    "str6_command_fold", "tpch12_shipmode_classes", "w4_running_max",
    "st7_append_ack", "str7_stream_static_join", "tpch14_promo_ratio",
    "w5_cumulative_bytes", "tpch18_large_orders", "w6_ntile",
    "tpch7_volume_shipping", "w7_max_by", "tpch8_market_share",
    "tpch13_customer_distribution", "tpch15_top_supplier",
    "tpch17_small_quantity", "tpch19_discounted_revenue",
    "tpch22_global_sales_opportunity",
})


# Queries whose implementation changed AFTER their latest driver proof,
# so their prior hash-matches predate the current code and they re-enter
# the scoring prefix ahead of untouched proven entries until a fresh
# proof lands.
#
# Round 15: empty — every change that round was store-protocol
# (structural resurrection guard, data-plane backend seam, sandbox
# object store, cross-process soak) or bench-harness (interleaved
# s2bench legs, per-section loadavg gates); no registry query plan or
# oracle changed, so nothing's proof predates its code. The scoring
# prefix therefore falls straight through to the aged tail, which
# fronts the 15 remaining r10 proofs (ag10, ag16-ag21, x51-x53,
# x55-x59) then the r11 cohort — exactly the VERDICT r14 task-5
# rotation (done = nothing older than r11 after this round).
#
# (Round 14 rescored x68/x79/x82 — contamination window re-plan — and
# f3/f19 — total-order oracle fix; all five re-proved in r14.)
#
# Round 16 re-planned eight queries (all proven oracle-identical at
# sf0.001/0.01/0.1 in-session, but their latest DRIVER proofs predate
# the new plans): f13's two-pass rank percentiles, the x62/x66/x71/
# x74/x75 single-evaluation barriers, and the x9/x16 pair-keyed
# distinct in lsh_candidate_pairs. The session-level durability knob
# (checkpoint.barrier) is plan-identical in default local mode —
# pinned by tests/test_checkpoint.py — so its other callers keep
# their proofs.
_R16_RESCORE: frozenset[str] = frozenset({
    "f13_percentiles",
    "x9_minhash_neardup",
    "x16_ngram_jaccard_neardup",
    "x62_heaps_vocab_growth",
    "x66_pmi_collocations",
    "x71_source_drift_matrix",
    "x74_conversion_funnel",
    "x75_retention_cohorts",
})


def _prioritized(names: list[str]) -> list[str]:
    """Order queries so the driver's per-round scoring budget lands on
    the entries that need evidence.

    The driver scores a fixed prefix of ``queries()`` each round (~50
    entries in round 1). Put queries whose latest result was a failure
    or rows-only check first, then never-scored queries round-robined
    across operator families (so every family earns at least one scored
    row per round), then already-proven queries last — their proofs are
    in prior CORRECTNESS_r*.json files. The proven tail is ordered by
    proof AGE (oldest round first, family-round-robined within a
    round), so leftover prefix budget continuously refreshes the
    stalest proofs — a query proven in round 2 whose proof never aged
    out would otherwise sit unverified behind nine rounds of code
    churn.
    """
    status, proof_round = _latest_driver_status()
    failed = [n for n in names if status.get(n, 0) == 1]
    fresh = [n for n in names if status.get(n, 0) == 0]
    proven = [n for n in names if status.get(n, 0) == 2]

    def _round_robin(group: list[str]) -> list[str]:
        # spread never-scored entries across operator families so every
        # family earns at least one scored row per round
        by_family: dict[str, list[str]] = {}
        for n in group:
            by_family.setdefault(_family(n), []).append(n)
        rr: list[str] = []
        buckets = list(by_family.values())
        while buckets:
            buckets = [b for b in buckets if b]
            for b in buckets:
                if b:
                    rr.append(b.pop(0))
        return rr

    backlog = [n for n in fresh if n in _R03_BACKLOG]
    newer = [n for n in fresh if n not in _R03_BACKLOG]
    rescore = [n for n in proven if n in _R16_RESCORE]
    stable = [n for n in proven if n not in _R16_RESCORE]
    # age the stable tail: oldest proof round first, families
    # round-robined within each round so one big old family can't
    # monopolize the refresh budget
    by_round: dict[int, list[str]] = {}
    for n in stable:
        by_round.setdefault(proof_round.get(n, 0), []).append(n)
    aged = [n for rnd in sorted(by_round) for n in _round_robin(by_round[rnd])]
    return (
        failed
        + _round_robin(backlog)
        + _round_robin(newer)
        + rescore
        + aged
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-way join revenue rollup (Q-J2 shape) at sf0.001."""
    return all_queries()["j2_multiway_join"].spark(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's per-round scoring budget reaches queries
    that still need driver evidence (see :func:`_prioritized`).
    """
    reg = all_queries()
    return {name: reg[name].spark for name in _prioritized(list(reg))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    reg = all_queries()
    return {
        name: reg[name].oracle
        for name in _prioritized(list(reg))
        if reg[name].oracle is not None
    }
