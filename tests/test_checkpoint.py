"""The session-level checkpoint-durability knob (s2spark.checkpoint.mode).

The dedup/similarity barriers truncate lineage with localCheckpoint —
fast but unrecoverable on executor loss. The knob trades speed for
durability WITHOUT changing plans or values: local (default) must be
plan-identical to a direct localCheckpoint, replicated must carry 2x
block replication, reliable must write real checkpoint files.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from s2_spark.checkpoint import DIR_KEY, MODE_KEY, barrier


@pytest.fixture()
def knob(spark):
    """Restore the session knob after each test (session is shared)."""
    yield spark.conf
    spark.conf.unset(MODE_KEY)
    spark.conf.unset(DIR_KEY)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _demo(spark):
    return spark.range(100).select(
        "id", F.xxhash64("id").alias("h")
    )


def test_local_mode_plan_identical_to_localcheckpoint(spark, knob):
    """Default mode is byte-for-byte the old behavior: the physical
    plan downstream of barrier() matches a direct localCheckpoint
    (same operator tree; RDD/expr ids differ run to run, so compare
    the operator skeleton)."""
    import re

    def skeleton(p: str) -> str:
        return re.sub(r"#\d+L?|\[plan_id=\d+\]|, \d+\)|\[\d+\]", "", p)

    via_helper = barrier(_demo(spark)).groupBy().agg(F.sum("h"))
    direct = _demo(spark).localCheckpoint(eager=True).groupBy().agg(F.sum("h"))
    assert skeleton(_plan(via_helper)) == skeleton(_plan(direct))
    assert "ExistingRDD" in _plan(via_helper)


def test_replicated_mode_uses_2x_storage(spark, knob):
    knob.set(MODE_KEY, "replicated")
    out = barrier(_demo(spark))
    # df.rdd wraps the checkpointed RDD in a fresh conversion RDD, so
    # read the storage level off the LogicalRDD node itself
    lvl = out._jdf.queryExecution().analyzed().rdd().getStorageLevel()
    assert lvl.replication() == 2
    # values unchanged by the mode
    assert out.agg(F.sum("id")).first()[0] == 4950


def test_reliable_mode_writes_checkpoint_files(spark, knob, tmp_path):
    knob.set(MODE_KEY, "reliable")
    knob.set(DIR_KEY, str(tmp_path / "ckpt"))
    out = barrier(_demo(spark))
    assert out.agg(F.sum("id")).first()[0] == 4950
    ckpt_files = list((tmp_path / "ckpt").rglob("*"))
    assert ckpt_files, "reliable mode must persist checkpoint files"


def test_reliable_mode_without_dir_raises(spark, knob):
    if spark.sparkContext.getCheckpointDir() is not None:
        pytest.skip("a checkpoint dir is already set session-wide")
    knob.set(MODE_KEY, "reliable")
    with pytest.raises(RuntimeError, match="checkpoint dir"):
        barrier(_demo(spark))


def test_unknown_mode_raises(spark, knob):
    knob.set(MODE_KEY, "bogus")
    with pytest.raises(ValueError, match="must be local"):
        barrier(_demo(spark))


def test_dedup_pipeline_value_identical_across_modes(spark, knob, sf_dir, tmp_path):
    """The knob changes durability, never results: the minhash keep
    pipeline (which barriers the banded relation) returns the same
    rows in every mode."""
    from s2_spark.functions.dedup import minhash_dedup_keep
    from s2_spark.tables import t

    d = t(spark, sf_dir, "documents").limit(300)
    want = None
    for mode in ("local", "replicated", "reliable"):
        knob.set(MODE_KEY, mode)
        knob.set(DIR_KEY, str(tmp_path / f"ck_{mode}"))
        got = sorted(
            r.doc_id for r in minhash_dedup_keep(d, k=16, bands=4).collect()
        )
        if want is None:
            want = got
        assert got == want, f"mode {mode} changed the keep set"
