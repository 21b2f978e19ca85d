"""Plan-hygiene regression guard over the WHOLE query registry.

The scale audit that previous rounds did by hand (grep the bench tail
for `WindowExec: No Partition Defined`, eyeball `.explain` output) is
automated here: every registry query's physical plan is walked and the
build FAILS if a scale-killer re-appears —

- **unpartitioned window**: a `windowspecdefinition` whose first
  argument is an order column (` ASC`/` DESC`) has an empty partition
  spec, i.e. the whole input collapses onto one task. The chunked
  two-phase prefix (`operators/prefix.py`) exists precisely so no
  query needs one.
- **row-at-a-time Python UDF**: `BatchEvalPython` in a plan means a
  per-row Python round-trip in the hot path. The only sanctioned
  Python execution is Arrow-batched (`MapInPandas` /
  `FlatMapGroupsInPandas` — multimodal decode, AEGIS kernel).
- **cartesian product**: `CartesianProduct` means a non-broadcast
  cross join; 1-row broadcast query vectors plan as
  `BroadcastNestedLoopJoin`, which is fine. Only the explicit
  cross-join query (j8) may produce one, and even it broadcasts.
- **gram-array quadratic** (the round-9 defect class, fixed in 9
  queries): an expensive derived-array expression — a chain of
  split/filter/zip_with/transform/aggregate calls — appearing more
  than once in the per-row code of a plan that explodes. Catalyst
  re-evaluates such an expression once per EXPLODED row (the
  null-check filter and each projection that references it), turning
  a per-document tokenize into O(tokens²) per document. The rule:
  alias the array as a column BELOW the explode so CollapseProject
  (which refuses to inline non-cheap multiply-referenced aliases)
  keeps it one evaluation per row.

Plans are built at sf0.001 (analysis + optimization only — the checks
read the initial physical plan, no job runs for the plan itself; a few
queries execute bounded control-plane jobs while CONSTRUCTING their
DataFrame, which is their documented behavior).
"""

from __future__ import annotations

import re

import pytest

from s2_spark.registry import all_queries

SF = "/root/testdata/sf0.001"

# queries allowed to contain a CartesianProduct node (explicit
# cross-join semantics). Currently none — even j8 broadcasts its tiny
# side — but the allowlist documents where an exemption would go.
CARTESIAN_OK: frozenset = frozenset()

_QUERIES = sorted(all_queries())


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _unpartitioned_window_specs(plan: str) -> list[str]:
    """windowspecdefinition(...) occurrences whose first argument is an
    ORDER column (` ASC`/` DESC` marker) — meaning no partition columns
    precede it, so the window would run on a single task."""
    bad = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)", plan):
        first_arg = m.group(1).split(",", 1)[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            bad.append(m.group(1)[:120])
    return bad


# array-building / array-walking calls whose re-evaluation per row is
# what the gram-quadratic rule forbids (lowercase = expression syntax;
# the `Filter (`/`Generate` NODE names are capitalized and never match)
_COSTLY_CALLS = re.compile(r"(?<![A-Za-z_])(split|zip_with|transform|aggregate|filter|array_repeat|sequence)\(")


def _balanced(s: str, start: int) -> str | None:
    """The full call expression beginning at ``start`` (which must
    point at the function name whose '(' opens the span)."""
    i = s.index("(", start)
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return s[start : j + 1]
    return None  # line truncated mid-expression — skip


def _expensive_exprs(line: str) -> list[str]:
    """Raw costly-call expressions in one plan line. Expensive = the
    chain nests at least two costly calls (e.g. filter(split(…)),
    transform(filter(…)) — but not zip_with(slice(…)): slice is
    cheap) or is a long single call. Nested matches are returned
    individually; the caller only cares whether ANY qualifies."""
    out = []
    for m in _COSTLY_CALLS.finditer(line):
        expr = _balanced(line, m.start())
        if expr is None:
            continue
        inner = len(_COSTLY_CALLS.findall(expr))
        if inner >= 2 or len(expr) >= 150:
            out.append(expr)
    return out


_LAMBDA_ID = re.compile(r"lambda [A-Za-z0-9_]+#(\d+)")
_ATTR_ID = re.compile(r"#(\d+)")


def _expr_refs(expr: str) -> set[str]:
    """Attribute ids an expression references, excluding its own
    lambda-bound variables."""
    return set(_ATTR_ID.findall(expr)) - set(_LAMBDA_ID.findall(expr))


def _gram_quadratic_exprs(plan: str) -> list[str]:
    """Expensive derived-array expressions that run once per EXPLODED
    row although they only depend on pre-explode columns — the
    round-9 quadratic (a per-document tokenize inside per-gram code).

    Mechanics: parse the printed operator tree (marker column =
    depth), and flag an expensive chain appearing in an operator that
    is an ANCESTOR of a Generate when every attribute it references is
    produced below that Generate and none is a generator output — i.e.
    Catalyst could have evaluated it once per input row below the
    explode, but will instead evaluate it per generated row. Exprs ON
    the Generate line itself (generator arguments) run once per input
    row and are fine; same-operator textual duplication in a normal-
    sized operator is left to codegen subexpression elimination —
    except in an OVERSIZED operator (see below), where codegen gives
    up and interpreted evaluation has no CSE."""
    lines = plan.splitlines()
    nodes = []  # (depth, line)
    for line in lines:
        m = re.search(r"[+:]- ", line)
        nodes.append((m.start() if m else -1, line))

    def subtree(i: int) -> range:
        d = nodes[i][0]
        j = i + 1
        while j < len(nodes) and nodes[j][0] > d:
            j += 1
        return range(i + 1, j)

    bad = []
    # second class (round-10, found live in x52): the same expensive
    # fold duplicated within ONE oversized operator. Normally codegen
    # subexpression elimination makes same-operator duplication a
    # non-issue, but a projection too large for whole-stage codegen
    # falls back to interpreted evaluation where no CSE applies — x52's
    # inlined 8x2 projection folds ran 50 s warm at sf0.1 (0.5 s once
    # materialized as an array column). Line length is the codegen-
    # fallout proxy.
    for _, line in nodes:
        if len(line) < 20_000:
            continue
        seen: dict[str, int] = {}
        for expr in _expensive_exprs(line):
            norm = re.sub(r"#\d+", "#", expr)
            seen[norm] = seen.get(norm, 0) + 1
        bad += [
            f"(dup in oversized operator) {n[:130]}"
            for n, c in seen.items()
            if c >= 2
        ]
    gens = [i for i, (_, l) in enumerate(nodes) if "Generate " in l]
    if not gens:
        return sorted(set(bad))
    # per Generate: ids visible below it, and its generator outputs
    # (the last bracket group on the Generate line)
    below_ids: dict[int, set[str]] = {}
    out_ids: dict[int, set[str]] = {}
    for g in gens:
        below_ids[g] = set()
        for j in subtree(g):
            below_ids[g] |= set(_ATTR_ID.findall(nodes[j][1]))
        last_bracket = re.findall(r"\[([^\[\]]*)\]", nodes[g][1])
        out_ids[g] = (
            set(_ATTR_ID.findall(last_bracket[-1])) if last_bracket else set()
        )
    for i, (_, line) in enumerate(nodes):
        if "Generate " in line:
            continue
        descendant_gens = [g for g in gens if g in subtree(i)]
        if not descendant_gens:
            continue
        for expr in _expensive_exprs(line):
            refs = _expr_refs(expr)
            if not refs:
                continue
            for g in descendant_gens:
                if refs <= below_ids[g] and not (refs & out_ids[g]):
                    bad.append(re.sub(r"#\d+", "#", expr)[:160])
                    break
    return sorted(set(bad))


def test_detectors_fire_on_known_bad_plans(spark):
    """Negative control: the guard must actually catch the patterns it
    claims to (a vacuously-green detector is worse than none)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf

    bad = spark.range(10).withColumn("rn", F.row_number().over(W.orderBy("id")))
    assert _unpartitioned_window_specs(_physical_plan(bad))
    good = spark.range(10).withColumn(
        "rn", F.row_number().over(W.partitionBy(F.col("id") % 2).orderBy("id"))
    )
    assert not _unpartitioned_window_specs(_physical_plan(good))
    rowudf = udf(lambda x: x + 1, "long")
    assert "BatchEvalPython" in _physical_plan(spark.range(10).select(rowudf("id")))


def test_gram_quadratic_detector_fires_on_prefix_x42_shape(spark):
    """Fixture of the round-9 defect exactly as it shipped pre-fix:
    grams built by element_at on an expression-aliased token array,
    referenced from per-exploded-row code — Catalyst inlines the
    tokenize chain into the Generate's sequence AND each element_at,
    re-tokenizing the document once per exploded row."""
    from pyspark.sql import functions as F

    base = spark.range(20).select(
        "id",
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != F.lit("")
    )
    exploded = base.select(
        "id",
        "text",
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1)))
        ).alias("p", "junk"),
    )
    bad = exploded.select(
        "id",
        F.concat(
            F.element_at(toks, F.col("p")),
            F.lit(" "),
            F.element_at(toks, F.col("p") + 1),
        ).alias("gram"),
    )
    assert _gram_quadratic_exprs(_physical_plan(bad))

    # the fixed shape — the array aliased as a column below the
    # explode — must NOT fire
    hs = base.select("id", toks.alias("toks"))
    good = hs.select(
        "id", F.posexplode("toks").alias("p", "tok")
    ).select("id", "p", F.md5("tok").alias("h"))
    assert not _gram_quadratic_exprs(_physical_plan(good))

    # benign 2x-per-SCAN-row duplication with no explode anywhere
    # (x48's guard filter) must not fire either: the detector targets
    # per-exploded-row re-evaluation, not a linear 2x
    flat = base.filter(F.size(toks) >= 4).select(
        "id", F.transform(toks, F.md5).alias("hs")
    )
    assert not _gram_quadratic_exprs(_physical_plan(flat))


def test_detector_fires_on_oversized_duplicated_folds(spark):
    """The round-10 x52 defect: many large fold expressions inlined
    twice each into ONE projection push it past whole-stage codegen,
    and interpreted evaluation has no subexpression elimination —
    measured 50 s warm for 2k rows. The detector flags duplicated
    expensive exprs inside an oversized operator; the fixed shape
    (folds materialized as an array column, elements referenced above)
    stays clean."""
    from functools import reduce

    from pyspark.sql import functions as F

    from s2_spark.functions.similarity import _hyperplanes, dot

    emb = spark.range(10).select(
        "id",
        F.array(*[(F.col("id") + i).cast("double") for i in range(64)]).alias(
            "v"
        ),
    )
    planes = _hyperplanes(dim=64, m=8, seed=11)
    folds = [
        dot(F.col("v"), F.array(*[F.lit(float(x)) for x in p]))
        for p in planes
    ]
    num = reduce(lambda a, b: a + b, [f * f for f in folds])
    den = reduce(lambda a, b: a + b, [f * F.lit(2.0) for f in folds])
    bad = emb.select("id", (num / den).alias("s"))
    assert any(
        "dup in oversized operator" in b
        for b in _gram_quadratic_exprs(_physical_plan(bad))
    )
    good = emb.select(
        "id", F.array(*folds).alias("pv")
    ).select(
        "id",
        (
            reduce(
                lambda a, b: a + b,
                [
                    F.element_at("pv", i + 1) * F.element_at("pv", i + 1)
                    for i in range(8)
                ],
            )
            / reduce(
                lambda a, b: a + b,
                [F.element_at("pv", i + 1) * F.lit(2.0) for i in range(8)],
            )
        ).alias("s"),
    )
    assert not _gram_quadratic_exprs(_physical_plan(good))


@pytest.mark.parametrize("name", _QUERIES)
def test_plan_hygiene(name, spark):
    df = all_queries()[name].spark(spark, SF)
    plan = _physical_plan(df)

    bad_windows = _unpartitioned_window_specs(plan)
    assert not bad_windows, (
        f"{name}: unpartitioned window(s) — whole input on one task: "
        f"{bad_windows}"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan"
    )
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, (
            f"{name}: non-broadcast cartesian product"
        )
    quad = _gram_quadratic_exprs(plan)
    assert not quad, (
        f"{name}: expensive derived-array expression evaluated more "
        f"than once per row (gram-quadratic rule, SCALE.md round 9) — "
        f"alias it as a column below the explode: {quad}"
    )
