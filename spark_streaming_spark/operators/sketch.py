"""Count-Min sketch as a distributed DataFrame aggregation — the "novel
sketch" custom-operator tier (SURVEY.md §4.3(4)); the reference has no
sketches at all (its only aggregate is the integer sum,
``/root/reference/src/main/java/com/soto/WordCount.java:48-53``).

A CM sketch is a (depth × width) counter grid; item x increments cell
(d, hash_d(x) mod width) for each row d; the frequency estimate is the
MIN over the d cells — always ≥ the true count, with overestimate bounded
by ~2N/width at 1-(1/2)^depth confidence.

Why it matters at 100 TB: the full per-key frequency table of a
high-cardinality column (users, URLs) can be too large to materialize or
broadcast, but the sketch is a FIXED-SIZE (depth×width rows) summary
built in one pass — a groupBy over derived hash columns, mergeable
across partitions/streams by cell-wise addition (partial aggregation IS
the merge). Estimation joins a small key set against the sketch.

Hashes are md5-derived (like operators/dedup.simhash) so the DuckDB
oracle reproduces the grid bit-for-bit — the sketch is deterministic,
only its error is probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 256


def _bucket(col: F.Column, d: int, width: int) -> F.Column:
    """Row-d bucket: md5(value ⊕ seed_d) → 60-bit int → mod width.
    Deterministic and engine-portable (DuckDB spells the same)."""
    h = F.conv(F.substring(F.md5(F.concat(col, F.lit(f"#{d}"))), 1, 15), 16, 10)
    return (h.cast("long") % width).cast("int")


def _cells(col: F.Column, depth: int, width: int) -> F.Column:
    """The depth (d, bucket) cells of a value — the ONE definition both
    build and estimate must share (a drift between them silently breaks
    the upper-bound guarantee)."""
    return F.array(*[
        F.struct(F.lit(d).alias("d"), _bucket(col, d, width).alias("bucket"))
        for d in range(depth)
    ])


def countmin_build(df: DataFrame, col: str, depth: int = DEPTH,
                   width: int = WIDTH) -> DataFrame:
    """Build the sketch grid: one row per non-empty cell.
    Columns: d, bucket, cnt. Exactly ``depth`` shuffled groupBy keys per
    input row (explode), partial aggregation merges partition-local grids
    map-side — the distributed CM merge for free."""
    v = F.col(col).cast("string")
    return (
        df.select(F.explode(_cells(v, depth, width)).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                      depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a sketch grid: min
    over the key's depth cells, where an EMPTY cell counts as 0 — a key
    with any empty cell therefore estimates 0 (never inserted / no
    collision mass), and never-seen keys stay in the output instead of
    being dropped. Left join from the probes; the grid is fixed-size
    (≤ depth×width rows) so it broadcasts.
    Columns: <key_col>, est (upper bound on the true count)."""
    v = F.col(key_col).cast("string")
    probes = keys.select(
        key_col, F.explode(_cells(v, depth, width)).alias("c")
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cm_join_size(a: DataFrame, col_a: str, b: DataFrame, col_b: str,
                 depth: int = DEPTH, width: int = WIDTH) -> DataFrame:
    """Equi-join SIZE estimation from two Count-Min grids — the sketch
    inner product (Alon-Matias-Szegedy F2 / Cormode & Muthukrishnan
    2005, "An improved data stream summary"; public method): for each
    grid row d, Σ_bucket cntA(d,b)·cntB(d,b) upper-bounds the true join
    size Σ_key fA(k)·fB(k); the estimate is the MIN over the depth rows.
    This is what a planner consults before launching a 100 TB shuffle —
    "will orders ⋈ lineitem explode?" — from two fixed-size one-pass
    summaries, never materializing a per-key frequency table. With
    a = b it estimates the SELF-join size (F2), the standard skew
    signal.

    Deterministic end to end (md5 grids, integer products accumulated in
    DECIMAL(38,0) — cnt·cnt wraps int64 once per-cell counts pass ~3e9),
    so the estimate itself hash-checks. Per-d inner products are emitted
    alongside the min so the oracle pins all depth rows.
    Columns: d, ip (row-d inner product), est_pairs (min over d).

    Output ceiling (ADVICE r8): ip/est_pairs are emitted as BIGINT for
    oracle parity (DuckDB ``.df()`` turns HUGEINT/DECIMAL into float64,
    so a decimal output would false-mismatch the driver comparator). The
    accumulator is exact to 1e38, but the OUTPUT caps at int64 ≈ 9.2e18
    estimated pairs; past that the boundary cast fails LOUDLY — this
    engine runs with Spark 4.x default ANSI mode on, where an
    out-of-range decimal→long cast raises rather than wrapping/nulling.
    A deployment estimating >9.2e18-pair joins should read ``ip_dec``
    before this projection."""
    from pyspark.sql import Window

    ga = countmin_build(a, col_a, depth, width)
    gb = countmin_build(b, col_b, depth, width)
    per_d = (
        ga.alias("x")
        .join(gb.alias("y"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("x.cnt").cast("decimal(38,0)") * F.col("y.cnt"))
             .alias("ip_dec"))
    )
    return per_d.select(
        "d",
        F.col("ip_dec").cast("long").alias("ip"),
        F.min(F.col("ip_dec").cast("long"))
        .over(Window.partitionBy()).alias("est_pairs"),
    )


# --- HyperLogLog with an ENGINE-EXACT contract ------------------------------
#
# Spark's approx_count_distinct and DuckDB's approx sketches use private
# hash seeds, so their estimates can never hash-compare (the r1
# `approx_distinct_users` entry is rows-only for exactly that reason).
# This HLL (Flajolet et al. 2007, public algorithm) pins EVERY degree of
# freedom instead: md5 is the shared hash, the register math is integer,
# and the estimator is one IEEE divide of a precomputed literal — so the
# estimate itself is bitwise identical on any engine and the oracle can
# hash-check an APPROXIMATE aggregate exactly.

HLL_M = 64           # registers (b = 6 index bits)
HLL_RMAX = 50        # rho clamp: keeps 2^(RMAX - rho) an exact BIGINT
# alpha_64 bias constant (the paper's alpha_64 ≈ 0.709; the closed form
# 0.7213/(1+1.079/64) gives 0.7093410…). This LITERAL is the frozen
# source of truth shared verbatim by both dialects — cross-engine
# exactness depends on the shared literal, not on matching any formula,
# and its ~0.01% offset from the closed form is noise against the 13%
# standard error at m=64. Do not recompute. numerator = alpha * m^2 *
# 2^RMAX precomputed driver-side so each group's estimate is ONE
# division of two exact values.
HLL_ALPHA = 0.709435968411
_HLL_NUMERATOR = HLL_ALPHA * (HLL_M ** 2) * float(2 ** HLL_RMAX)
# Small-range correction (linear counting, part of the published
# algorithm): when the raw estimate < 2.5m and some register is empty,
# est = m * ln(m / V) with V = empty registers. ln is NOT bitwise
# portable across engines — but V has only m possible values, so the
# whole correction is this PRECOMPUTED literal table (Python libm,
# frozen here; both dialects embed the same literals and the lookup is
# exact). Index: V in 1..m. SQL spelling: the literals are emitted in
# E-NOTATION ('...e0') — DuckDB types a bare decimal literal as DECIMAL
# and the decimal->double hop rounds differently than a direct double
# parse (1-ulp drift found at V=24); e-notation parses as DOUBLE.
import math as _math

_HLL_LC = [HLL_M * _math.log(HLL_M / v) for v in range(1, HLL_M + 1)]
_HLL_SMALL = 2.5 * HLL_M


def hll_distinct(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Approximate count-distinct of ``key_col`` per ``group_col`` with
    the engine-exact HLL contract (~13% standard error at m=64).

    Plan: hash → (bucket, rho) is map-side column algebra; ONE groupBy
    (group, bucket) with partial aggregation — the max() merge IS the
    distributed (and streaming/update-mode) HLL merge — then a ≤ m-row
    per-group rollup. The shuffle carries at most m rows per group at
    any input size: the whole point of a sketch.

    Register math: h = 60-bit md5 prefix; bucket = h mod m; rho = rank
    of the first set bit of the remaining 54 bits (55 - bitlength, 55 if
    zero), clamped to RMAX. Σ 2^(-rho) is computed as the exact BIGINT
    Σ 2^(RMAX - rho) (empty registers contribute 2^RMAX), so the only
    float op is the final literal/denominator divide.
    Columns: <group_col>, est_distinct (double)."""
    return hll_estimate(hll_registers(df, group_col, key_col), group_col)


def _group_list(group_col) -> list:
    return list(group_col) if isinstance(group_col, (list, tuple)) \
        else [group_col]


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """The register table (group, bucket, rho) — the sketch STATE. One
    keyed groupBy whose max() partial aggregation is the distributed
    merge; the same max is the streaming update-mode merge, so a stream
    maintains exactly this table in its state store.
    Columns: <group_col>, bucket, rho."""
    g = _group_list(group_col)
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("long")
    staged = df.select(*[F.col(c) for c in g], h.alias("h")).select(
        *g,
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rem"),
    )
    rho = F.when(F.col("rem") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.expr("bin(rem)"))
    )
    return (
        staged.select(*g, "bucket",
                      F.least(rho, F.lit(HLL_RMAX)).alias("rho"))
        .groupBy(*g, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, group_col: str) -> DataFrame:
    """Estimator over a register table (from :func:`hll_registers`, a
    persisted sketch, or a streaming state recovery) — the serve half.
    Columns: <group_col>, est_distinct."""
    g = _group_list(group_col)
    term = F.expr(f"shiftleft(cast(1 as bigint), {HLL_RMAX} - rho)")
    raw = (
        F.lit(_HLL_NUMERATOR)
        / (F.col("s_present")
           + (F.lit(HLL_M) - F.col("nb"))
           * F.lit(2 ** HLL_RMAX)).cast("double")
    )
    v_empty = F.lit(HLL_M) - F.col("nb")
    lc = F.element_at(F.array(*[F.lit(x) for x in _HLL_LC]),
                      v_empty.cast("int"))
    est = F.when((v_empty > 0) & (raw < F.lit(_HLL_SMALL)), lc) \
        .otherwise(raw)
    return (
        regs.groupBy(*g)
        .agg(F.sum(term).alias("s_present"),
             F.count("*").alias("nb"))
        .select(*g, est.alias("est_distinct"))
    )


def hll_sql(group_col: str, key_col: str, table: str) -> str:
    """The DuckDB twin of :func:`hll_distinct` — same hash, same integer
    register math, same single divide (shared literal numerator)."""
    return f"""
        WITH staged AS (
          SELECT {group_col},
                 ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
          FROM {table}
        ),
        br AS (
          SELECT {group_col}, h % {HLL_M} AS bucket,
                 CASE WHEN h // {HLL_M} = 0 THEN 55
                      ELSE 55 - length(bin(h // {HLL_M})) END AS rho
          FROM staged
        ),
        regs AS (
          SELECT {group_col}, bucket,
                 max(least(rho, {HLL_RMAX})) AS rho
          FROM br GROUP BY 1, 2
        ),
        agg AS (
          SELECT {group_col},
                 SUM((1::BIGINT << ({HLL_RMAX} - rho))) AS s_present,
                 COUNT(*) AS nb
          FROM regs GROUP BY 1
        ),
        scored AS (
          SELECT {group_col}, {HLL_M} - nb AS v_empty,
                 {_HLL_NUMERATOR!r}
                   / CAST(s_present + ({HLL_M} - nb) * {2 ** HLL_RMAX}
                          AS DOUBLE) AS raw
          FROM agg
        )
        SELECT {group_col},
               CASE WHEN v_empty > 0 AND raw < {_HLL_SMALL!r}
                    THEN ([{', '.join(f'{x!r}e0' for x in _HLL_LC)}])[v_empty]
                    ELSE raw END AS est_distinct
        FROM scored
    """


def hll_overlap(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Sketch SET ALGEBRA over the engine-exact HLL: for every pair of
    groups, |A∪B| by register max-merge (the mergeability that makes
    sketches composable at 100 TB — union costs one ≤ m-row aggregate,
    never a rescan) and |A∩B| by inclusion-exclusion
    (est_a + est_b − est_union, the published HLL intersection
    estimator; error grows with the Jaccard distance, which is the
    known trade of the method).

    The pair table comes from a collect-and-explode over the distinct
    group list (tiny, map-only — no cross join in the plan); register
    membership attaches by broadcast equi joins. Deterministic
    end-to-end: same md5 registers, same literal tables, one fixed IEEE
    sequence for the final subtraction.

    Columns: type_a < type_b, est_a, est_b, est_union, est_overlap."""
    regs = hll_registers(df, group_col, key_col)
    regs = regs.localCheckpoint(eager=True)  # 3 consumers below
    ests = hll_estimate(regs, group_col)
    tl = regs.select(F.col(group_col).alias("t")).distinct() \
        .agg(F.collect_list("t").alias("ts"))
    tp = tl.select(F.explode(F.expr(
        "filter(flatten(transform(ts,"
        " x -> transform(ts, y -> struct(x AS type_a, y AS type_b)))),"
        " p -> p.type_a < p.type_b)")).alias("p")).select("p.*")
    m1 = tp.join(regs, F.col("type_a") == F.col(group_col)) \
        .select("type_a", "type_b", "bucket", "rho")
    m2 = tp.join(regs, F.col("type_b") == F.col(group_col)) \
        .select("type_a", "type_b", "bucket", "rho")
    union_regs = (m1.unionByName(m2)
                  .groupBy("type_a", "type_b", "bucket")
                  .agg(F.max("rho").alias("rho")))
    est_u = hll_estimate(union_regs, ["type_a", "type_b"]) \
        .withColumnRenamed("est_distinct", "est_union")
    ea = ests.select(F.col(group_col).alias("type_a"),
                     F.col("est_distinct").alias("est_a"))
    eb = ests.select(F.col(group_col).alias("type_b"),
                     F.col("est_distinct").alias("est_b"))
    return (
        est_u.join(F.broadcast(ea), "type_a").join(F.broadcast(eb), "type_b")
        .select("type_a", "type_b", "est_a", "est_b", "est_union",
                (F.col("est_a") + F.col("est_b") - F.col("est_union"))
                .alias("est_overlap"))
    )


def hll_overlap_sql(group_col: str, key_col: str, table: str) -> str:
    """DuckDB twin of :func:`hll_overlap` — same registers, same merge,
    same literal estimator, same IEEE sequence."""
    lc = ", ".join(f"{x!r}e0" for x in _HLL_LC)

    def est(rel: str, keys: str, out: str) -> str:
        return f"""
          SELECT {keys},
                 CASE WHEN {HLL_M} - nb > 0
                           AND {_HLL_NUMERATOR!r}
                               / CAST(s_present + ({HLL_M} - nb)
                                      * {2 ** HLL_RMAX} AS DOUBLE)
                               < {_HLL_SMALL!r}
                      THEN ([{lc}])[{HLL_M} - nb]
                      ELSE {_HLL_NUMERATOR!r}
                           / CAST(s_present + ({HLL_M} - nb)
                                  * {2 ** HLL_RMAX} AS DOUBLE)
                      END AS {out}
          FROM (SELECT {keys},
                       SUM((1::BIGINT << ({HLL_RMAX} - rho))) AS s_present,
                       COUNT(*) AS nb
                FROM {rel} GROUP BY {keys})"""

    return f"""
        WITH staged AS (
          SELECT {group_col},
                 ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
          FROM {table}
        ),
        br AS (
          SELECT {group_col}, h % {HLL_M} AS bucket,
                 CASE WHEN h // {HLL_M} = 0 THEN 55
                      ELSE 55 - length(bin(h // {HLL_M})) END AS rho
          FROM staged
        ),
        regs AS (
          SELECT {group_col}, bucket, max(least(rho, {HLL_RMAX})) AS rho
          FROM br GROUP BY 1, 2
        ),
        types AS (SELECT DISTINCT {group_col} AS t FROM regs),
        tp AS (
          SELECT a.t AS type_a, b.t AS type_b
          FROM types a JOIN types b ON a.t < b.t
        ),
        union_regs AS (
          SELECT type_a, type_b, bucket, max(rho) AS rho FROM (
            SELECT tp.type_a, tp.type_b, r.bucket, r.rho
            FROM tp JOIN regs r ON r.{group_col} = tp.type_a
            UNION ALL
            SELECT tp.type_a, tp.type_b, r.bucket, r.rho
            FROM tp JOIN regs r ON r.{group_col} = tp.type_b
          ) GROUP BY 1, 2, 3
        ),
        eg AS ({est("regs", group_col, "est_distinct")}),
        eu AS ({est("union_regs", "type_a, type_b", "est_union")})
        SELECT eu.type_a, eu.type_b,
               ea.est_distinct AS est_a, eb.est_distinct AS est_b,
               eu.est_union,
               ea.est_distinct + eb.est_distinct - eu.est_union
                 AS est_overlap
        FROM eu JOIN eg ea ON ea.{group_col} = eu.type_a
                JOIN eg eb ON eb.{group_col} = eu.type_b
    """


# --- Bounded-state quantile sketch with an ENGINE-EXACT contract -----------
#
# KLL-class rank sketch (Karnin/Lang/Liberty 2016: O(k) state per group,
# mergeable, rank error O(1/k)) with the one substitution that makes it
# engine-exact: KLL's RANDOMIZED compactor (keep odd/even survivors by a
# coin flip) is replaced by DETERMINISTIC bottom-k selection on an md5
# hash of the row identity — the KMV trick operators/dedup.py already
# uses for distinct sketches. The kept set is a uniform row sample whose
# membership is a pure function of the data, so:
#
#   * merge(sketch(A), sketch(B)) == sketch(A ∪ B) EXACTLY (bottom-k of
#     a union is the bottom-k of the merged bottom-ks) — the associative
#     /commutative merge KLL only has up to randomness;
#   * a DuckDB oracle reproduces every kept value and therefore every
#     quantile estimate bit-for-bit (the values returned are raw input
#     doubles — no float arithmetic ever runs on them);
#   * state per group is exactly min(k, n) rows at ANY input size, so a
#     100 TB column costs one shuffle of rank-limited rows (Spark 3.5+
#     plans the rn<=k filter as WindowGroupLimit: the top-k is taken
#     map-side BEFORE the exchange, then again after — partitions ship
#     at most k rows per group).
#
# Rank estimate: with n_kept = min(k, n) kept values sorted ascending,
# quantile q is the value at 1-based rank (q_ppm * (n_kept-1)) // 1e6 + 1
# — the "lower" interpolation, integer-exact on both engines. Standard
# error of the rank is O(1/sqrt(k)) (uniform-sample bound; KLL proper
# gets O(1/k) — the price of determinism is a wider but still bounded
# error, pinned against exact quantiles in tests).

# --- Theta/KMV distinct sketch with set operations --------------------------
#
# Bottom-k (KMV) distinct-value sketch with Theta-style set algebra
# (Bar-Yossef et al. 2002 counting-distinct; Dasgupta et al. 2016 "A
# Framework for Estimating Stream Expression Cardinalities" — the
# Apache DataSketches Theta family; public methods). Complements the
# engine-exact HLL above: HLL intersects by inclusion-exclusion (error
# grows with Jaccard distance), a Theta sketch intersects DIRECTLY —
# retained hashes below the pairwise θ are a uniform sample of the
# intersection, so small overlaps estimate far better.
#
# Engine-exact contract (the hll_distinct treatment): md5 60-bit prefix
# is the shared hash; θ and all retained sets are pure functions of the
# data; every estimate is ret · 2^60 / θ — ONE IEEE multiply + divide
# with the shared literal 2^60, bitwise identical on any engine. When a
# set has fewer than k distinct values the sketch is exact (θ = 2^60).

THETA_K = 256
_THETA_SPACE = float(2 ** 60)        # hash space size as an exact double


def theta_registers(df: DataFrame, group_col: str, key_col: str,
                    k: int = THETA_K) -> DataFrame:
    """Bottom-k DISTINCT md5 hashes of ``key_col`` per group — the
    sketch state. One distinct + one rank-limited window, both on the
    group key; the rn<=k filter plans as WindowGroupLimit so partitions
    ship at most k rows per group (the kmv_quantile_registers shape).
    Columns: grp, h."""
    from pyspark.sql import Window

    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("long")
    w = Window.partitionBy("grp").orderBy("h")
    return (
        df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def theta_overlap(df: DataFrame, group_col: str, key_col: str,
                  k: int = THETA_K) -> DataFrame:
    """Distinct-set algebra for every group pair from the bottom-k
    sketches alone: per-group θ (k-th smallest hash, or full space when
    exact), pairwise θ = min(θ_a, θ_b), and DIRECT estimates —
    |A∩B| from retained hashes present in both sketches below θ,
    |A∪B| from the re-thresholded merged sketch. Never rescans the
    input: everything after the register build runs on ≤ k rows per
    group (the mergeability that matters at 100 TB — union of two
    shards' sketches costs a k-row merge, not a rescan).
    Columns: type_a < type_b, est_a, est_b, est_inter, est_union."""
    return theta_overlap_from_registers(
        theta_registers(df, group_col, key_col, k), k)


def theta_merge(a: DataFrame, b: DataFrame, k: int = THETA_K) -> DataFrame:
    """EXACT sketch merge: the bottom-k of the distinct union of two
    register sets equals the bottom-k of the union of the underlying
    sets (hashes are distinct values — anything the merged sketch keeps
    was necessarily in one side's bottom-k). So folding per-shard (or
    per-micro-batch) sketches reproduces the one-shot sketch bit for
    bit — the mergeability that makes the sketch a streaming state.
    Inputs/output: (grp, h) register frames."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("h")
    return (
        a.unionByName(b).distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def theta_overlap_from_registers(regs: DataFrame,
                                 k: int = THETA_K) -> DataFrame:
    """The set-algebra half of :func:`theta_overlap`, over prebuilt
    (grp, h) registers — the entry point for merged/streamed sketch
    state, which never rescans the input."""
    regs = regs.localCheckpoint(eager=True)   # 4 consumers below
    # per-group θ and retained count: θ = kth smallest (max of the kept
    # set) when the sketch is full, else the full hash space; retained
    # hashes are those strictly below θ.
    stats = (
        regs.groupBy("grp")
        .agg(F.count("*").alias("cnt"), F.max("h").alias("maxh"))
        .select(
            "grp",
            F.when(F.col("cnt") >= k, F.col("maxh").cast("double"))
            .otherwise(F.lit(_THETA_SPACE)).alias("theta"),
            F.when(F.col("cnt") >= k, F.col("cnt") - 1)
            .otherwise(F.col("cnt")).alias("ret"),
        )
    )
    est = (F.col("ret").cast("double") * F.lit(_THETA_SPACE)
           / F.col("theta"))
    ests = stats.select("grp", "theta", est.alias("est"))
    pairs = (
        ests.select(F.col("grp").alias("type_a"),
                    F.col("theta").alias("theta_a"),
                    F.col("est").alias("est_a"))
        .join(ests.select(F.col("grp").alias("type_b"),
                          F.col("theta").alias("theta_b"),
                          F.col("est").alias("est_b")),
              F.col("type_a") < F.col("type_b"))
        .withColumn("theta_ab", F.least("theta_a", "theta_b"))
    )
    # intersection: hashes retained by BOTH sketches below θ_ab
    a = regs.select(F.col("grp").alias("type_a"), "h")
    b = regs.select(F.col("grp").alias("type_b"), "h")
    common = (
        a.join(b, "h")
        .join(F.broadcast(pairs.select("type_a", "type_b", "theta_ab")),
              ["type_a", "type_b"])
        .filter(F.col("h").cast("double") < F.col("theta_ab"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("ret_i"))
    )
    # union: merge the two kept sets, re-threshold at min(θ_ab, new kth)
    from pyspark.sql import Window

    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    merged = (
        a.join(F.broadcast(pairs.select("type_a", "type_b")), "type_a")
        .select("type_a", "type_b", "h")
        .unionByName(
            b.join(F.broadcast(pairs.select("type_a", "type_b")), "type_b")
            .select("type_a", "type_b", "h"))
        .distinct()
        .withColumn("__rn", F.row_number().over(wu))
        .filter(F.col("__rn") <= k)
    )
    union_stats = (
        merged.groupBy("type_a", "type_b")
        .agg(F.count("*").alias("cnt"), F.max("h").alias("maxh"))
        .join(F.broadcast(pairs.select("type_a", "type_b", "theta_ab")),
              ["type_a", "type_b"])
        .select(
            "type_a", "type_b",
            F.least(
                F.when(F.col("cnt") >= k, F.col("maxh").cast("double"))
                .otherwise(F.lit(_THETA_SPACE)),
                F.col("theta_ab")).alias("theta_u"),
        )
    )
    ret_u = (
        merged.join(F.broadcast(union_stats), ["type_a", "type_b"])
        .filter(F.col("h").cast("double") < F.col("theta_u"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("ret_u"))
    )
    est_of = lambda ret, theta: (
        F.coalesce(F.col(ret), F.lit(0)).cast("double")
        * F.lit(_THETA_SPACE) / F.col(theta))
    return (
        pairs.join(common, ["type_a", "type_b"], "left")
        .join(union_stats, ["type_a", "type_b"])
        .join(ret_u, ["type_a", "type_b"], "left")
        .select(
            "type_a", "type_b", "est_a", "est_b",
            est_of("ret_i", "theta_ab").alias("est_inter"),
            est_of("ret_u", "theta_u").alias("est_union"),
        )
    )


def theta_overlap_sql(group_col: str, key_col: str, table: str,
                      k: int = THETA_K) -> str:
    """DuckDB twin of :func:`theta_overlap` — same md5 registers, same
    θ rules, same retained counts, same single multiply+divide with the
    shared 2^60 literal."""
    S = repr(_THETA_SPACE)
    return f"""
        WITH hashes AS (
          SELECT DISTINCT {group_col} AS grp,
                 ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))
                   ::BIGINT AS h
          FROM {table}
        ),
        regs AS (
          SELECT grp, h FROM (
            SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM hashes) WHERE rn <= {k}
        ),
        stats AS (
          SELECT grp,
                 CASE WHEN count(*) >= {k} THEN CAST(max(h) AS DOUBLE)
                      ELSE {S} END AS theta,
                 CASE WHEN count(*) >= {k} THEN count(*) - 1
                      ELSE count(*) END AS ret
          FROM regs GROUP BY grp
        ),
        ests AS (
          SELECT grp, theta, CAST(ret AS DOUBLE) * {S} / theta AS est
          FROM stats
        ),
        pairs AS (
          SELECT a.grp AS type_a, b.grp AS type_b, a.est AS est_a,
                 b.est AS est_b, least(a.theta, b.theta) AS theta_ab
          FROM ests a JOIN ests b ON a.grp < b.grp
        ),
        common AS (
          SELECT p.type_a, p.type_b, count(*) AS ret_i
          FROM pairs p
          JOIN regs ra ON ra.grp = p.type_a
          JOIN regs rb ON rb.grp = p.type_b AND rb.h = ra.h
          WHERE CAST(ra.h AS DOUBLE) < p.theta_ab
          GROUP BY 1, 2
        ),
        mergedall AS (
          SELECT DISTINCT p.type_a, p.type_b, r.h
          FROM pairs p
          JOIN regs r ON r.grp = p.type_a OR r.grp = p.type_b
        ),
        merged AS (
          SELECT type_a, type_b, h FROM (
            SELECT type_a, type_b, h,
                   row_number() OVER (PARTITION BY type_a, type_b
                                      ORDER BY h) AS rn
            FROM mergedall) WHERE rn <= {k}
        ),
        ustats AS (
          SELECT m.type_a, m.type_b,
                 least(CASE WHEN count(*) >= {k}
                            THEN CAST(max(m.h) AS DOUBLE) ELSE {S} END,
                       any_value(p.theta_ab)) AS theta_u
          FROM merged m
          JOIN pairs p ON p.type_a = m.type_a AND p.type_b = m.type_b
          GROUP BY 1, 2
        ),
        retu AS (
          SELECT m.type_a, m.type_b, count(*) AS ret_u
          FROM merged m JOIN ustats u USING (type_a, type_b)
          WHERE CAST(m.h AS DOUBLE) < u.theta_u GROUP BY 1, 2
        )
        SELECT p.type_a, p.type_b, p.est_a, p.est_b,
               CAST(coalesce(c.ret_i, 0) AS DOUBLE) * {S} / p.theta_ab
                 AS est_inter,
               CAST(coalesce(r.ret_u, 0) AS DOUBLE) * {S} / u.theta_u
                 AS est_union
        FROM pairs p
        LEFT JOIN common c USING (type_a, type_b)
        JOIN ustats u USING (type_a, type_b)
        LEFT JOIN retu r USING (type_a, type_b)
    """


KMV_K = 200


def kmv_quantile_registers(df: DataFrame, group_col: str, value_col: str,
                           uid_cols: list[str], k: int = KMV_K,
                           salt: str = "kll1") -> DataFrame:
    """Build the per-group register set: the k rows whose
    md5(salt#uid…) sorts smallest. Columns: grp, v, hh. ONE shuffle on
    the group key, rank-limited map-side (WindowGroupLimit)."""
    from pyspark.sql import Window

    hh = F.md5(F.concat_ws(
        "#", F.lit(salt), *[F.col(c).cast("string") for c in uid_cols]))
    w = Window.partitionBy("grp").orderBy("hh")
    return (
        df.select(F.col(group_col).alias("grp"),
                  F.col(value_col).alias("v"), hh.alias("hh"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Merge two register sets: union, keep the k smallest hashes per
    group. Exact: equals building the sketch over the unioned input."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("hh")
    return (
        a.unionByName(b)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_quantiles(regs: DataFrame, qs_ppm: dict[str, int]) -> DataFrame:
    """Estimate quantiles from a register set: per group, sort the kept
    values (hash tie-break → total order) and pick the integer-exact
    rank for each requested quantile. ``qs_ppm`` maps output column name
    -> quantile in ppm. All windows run over ≤ k rows per group."""
    from pyspark.sql import Window

    wv = Window.partitionBy("grp").orderBy("v", "hh")
    wc = Window.partitionBy("grp")
    ranked = (
        regs.withColumn("vr", F.row_number().over(wv))
        .withColumn("n", F.count("*").over(wc))
    )
    aggs = [
        F.max(F.when(
            F.col("vr") == F.expr(
                f"CAST({ppm} AS BIGINT) * (n - 1) DIV 1000000 + 1"),
            F.col("v"))).alias(name)
        for name, ppm in qs_ppm.items()
    ]
    return ranked.groupBy("grp").agg(*aggs)


def column_value_registers(sides: list, k: int = THETA_K) -> DataFrame:
    """Theta registers over COLUMN VALUE SETS: ``sides`` is a list of
    (name, df, column); each column's distinct values hash into one
    bottom-k sketch keyed by the name. The data-catalog primitive:
    profile every column once, answer "which columns join" from the
    k-row sketches forever after. Values stringify first so sketches
    compare across physical types (BIGINT custkey vs VARCHAR id)."""
    stacked = None
    for name, df, col in sides:
        part = df.select(
            F.lit(name).alias("colname"),
            F.col(col).cast("string").alias("val"),
        ).filter(F.col("val").isNotNull())
        stacked = part if stacked is None else stacked.unionByName(part)
    return theta_registers(stacked, "colname", "val", k)


def join_key_discovery(sides: list, k: int = THETA_K) -> DataFrame:
    """Joinable-column discovery from Theta sketches (the
    LSH-Ensemble/joinability-search problem family; estimation method =
    the DataSketches Theta set algebra): every column PAIR gets distinct
    estimates, a DIRECT intersection estimate, and both directional
    CONTAINMENTS est(A∩B)/est(A) — the score that finds foreign keys
    (orders.o_custkey ⊆ customer.c_custkey ⇒ containment ≈ 1) without
    ever joining the tables. Input cost: one scan + one k-row sketch per
    column; all pairwise algebra runs on ≤ k rows per column.

    Deterministic (md5 registers, shared 2^60 literal, one extra IEEE
    divide rounded to 7 dp), so the discovery report hash-checks.
    Columns: col_a < col_b, est_a, est_b, est_inter, cont_a_in_b,
    cont_b_in_a."""
    regs = column_value_registers(sides, k)
    ov = theta_overlap_from_registers(regs, k)
    return ov.select(
        F.col("type_a").alias("col_a"), F.col("type_b").alias("col_b"),
        "est_a", "est_b", "est_inter",
        F.round(F.col("est_inter") / F.col("est_a"), 7)
        .alias("cont_a_in_b"),
        F.round(F.col("est_inter") / F.col("est_b"), 7)
        .alias("cont_b_in_a"),
    )


def join_key_discovery_sql(sides_sql: list, k: int = THETA_K) -> str:
    """DuckDB twin: ``sides_sql`` = [(name, table, column)]; stacks the
    same stringified value sets and wraps theta_overlap_sql with the
    same containment divides."""
    stacked = " UNION ALL ".join(
        f"SELECT '{name}' AS colname, CAST({col} AS VARCHAR) AS val"
        f" FROM {table} WHERE {col} IS NOT NULL"
        for name, table, col in sides_sql
    )
    inner = theta_overlap_sql("colname", "val", f"({stacked})", k)
    return f"""
        WITH ov AS ({inner})
        SELECT type_a AS col_a, type_b AS col_b, est_a, est_b, est_inter,
               round(est_inter / est_a, 7) AS cont_a_in_b,
               round(est_inter / est_b, 7) AS cont_b_in_a
        FROM ov
    """


# --- Misra-Gries / SpaceSaving heavy hitters with an ENGINE-EXACT contract --
#
# Misra & Gries 1982 ("Finding repeated elements") / Metwally et al.
# 2005 SpaceSaving, in the MERGEABLE-summaries formulation of Agarwal
# et al. 2013 ("Mergeable summaries", PODS): a summary is a counter
# table of at most k entries; PRUNE of an oversized table subtracts the
# (k+1)-st largest counter value t from every counter and drops the
# non-positive ones; MERGE is pointwise counter addition followed by a
# re-prune. Every kept counter is a LOWER bound on the true frequency,
# off by at most the accumulated ``err`` — and any key whose true count
# exceeds ``err`` is guaranteed to survive (the classic N/(k+1) heavy-
# hitter guarantee when built from exact counts).
#
# Engine-exact contract (the hll_distinct treatment): counters are
# BIGINT, the (k+1)-st-largest selection orders by (cnt DESC, md5(key)
# ASC) so boundary ties resolve identically on any engine, and the
# whole prune is integer arithmetic — the summary itself hash-checks
# against a DuckDB twin. Shard-and-merge ≡ one-shot holds EXACTLY for
# the additive path Spark actually executes (per-shard exact counts are
# summed by the partial agg / the streamed counts_fold_sink, and the
# prune runs once at the end); merging ALREADY-PRUNED shard summaries
# trades that equality for the MG error bound — both contracts are
# test-pinned in tests/test_sketch.py.
#
# Reference parity: this gives the hot-words surface
# (/root/reference/src/main/java/com/soto/WindowHotWord.java:52-87,
# swap -> sortByKey(false) -> take(3)) a BOUNDED-STATE summary: at
# 100 TB the fold state is O(k) counters per shard instead of O(vocab),
# with est within N/k of truth.


def mg_prune(counters: DataFrame, key_col: str, k: int,
             cnt_col: str = "cnt") -> DataFrame:
    """Misra-Gries prune of a counter table to at most ``k`` entries.
    Emits (key_col, est, err): ``est`` = counter minus the (k+1)-st
    largest counter value t (rows folding to <= 0 drop), ``err`` = t.
    Guarantee when ``counters`` holds exact counts: est <= true <= est
    + err, and every key with true count > err survives.

    Plan shape: ``orderBy(cnt DESC, md5(key)).limit(k+1)`` is a
    TakeOrderedAndProject — each partition keeps a (k+1)-row heap, the
    driver merges heaps; the global window after it runs on <= k+1 rows
    (driver-sized, the sanctioned single-partition exemption), so no
    data-sized exchange exists anywhere."""
    from pyspark.sql.window import Window

    tie = F.md5(F.col(key_col).cast("string"))
    lim = counters.orderBy(F.col(cnt_col).desc(), tie.asc()).limit(k + 1)
    w = Window.orderBy(F.col(cnt_col).desc(), tie.asc())
    ranked = lim.withColumn("__rn", F.row_number().over(w))
    t = F.max(
        F.when(F.col("__rn") == k + 1, F.col(cnt_col)).otherwise(F.lit(0))
    ).over(Window.partitionBy())
    return (
        ranked.withColumn("__t", t)
        .filter((F.col("__rn") <= k)
                & (F.col(cnt_col) - F.col("__t") > 0))
        .select(
            F.col(key_col),
            (F.col(cnt_col) - F.col("__t")).cast("long").alias("est"),
            F.col("__t").cast("long").alias("err"),
        )
    )


def mg_prune_full(counters: DataFrame, key_col: str, k: int,
                  cnt_col: str = "cnt") -> tuple[DataFrame, DataFrame]:
    """:func:`mg_prune` plus the forfeited error budget as a 1-ROW frame
    (column ``err``) — emitted even when EVERY counter folds to <= 0 and
    the pruned row table is empty. The row table's per-row ``err``
    column equals that scalar whenever rows survive, but an all-equal
    counter table (each counter == the (k+1)-st value) prunes to ZERO
    rows while still forfeiting a nonzero t; deriving the budget from
    surviving rows would then report 0 and a later merge could violate
    the documented est <= true <= est + err bound. Callers that merge
    summaries must carry this scalar (pass it to :func:`mg_merge`)."""
    tie = F.md5(F.col(key_col).cast("string"))
    lim = counters.orderBy(F.col(cnt_col).desc(), tie.asc()).limit(k + 1)
    # the (k+1)-st largest counter is the min over the (k+1)-limited set
    # when it actually reached k+1 rows; otherwise nothing was forfeited
    errf = lim.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min(cnt_col))
        .otherwise(F.lit(0)).cast("long").alias("err"))
    return mg_prune(counters, key_col, k, cnt_col), errf


def mg_merge(a: DataFrame, b: DataFrame, key_col: str, k: int,
             a_err: DataFrame | None = None,
             b_err: DataFrame | None = None) -> DataFrame:
    """Merge two MG summaries (key_col, est, err): pointwise counter
    addition, re-prune to ``k``, and the error budgets ADD (Agarwal et
    al. 2013 merge rule — the new prune's subtraction stacks on top of
    whatever each input already forfeited). Deterministic end to end,
    so repeated merges of the same shards reproduce bit-identical
    summaries; the MG bound est <= true <= est + err is preserved.

    ``a_err`` / ``b_err``: the 1-row forfeited-budget frames from
    :func:`mg_prune_full`. Pass them whenever an input may have pruned
    to EMPTY (every counter equaled the (k+1)-st value) — the fallback
    derives each input's budget as max(err) over its rows, which is
    exact for any non-empty summary but reads 0 from an empty one and
    would then under-state the merged bound."""
    added = (
        a.select(key_col, "est").unionByName(b.select(key_col, "est"))
        .groupBy(key_col).agg(F.sum("est").alias("cnt"))
    )
    ea = (a_err if a_err is not None
          else a.agg(F.coalesce(F.max("err"), F.lit(0)).alias("err")))
    eb = (b_err if b_err is not None
          else b.agg(F.coalesce(F.max("err"), F.lit(0)).alias("err")))
    carry = (
        ea.select(F.col("err").cast("long").alias("__ea"))
        .crossJoin(eb.select(F.col("err").cast("long").alias("__eb")))
    )
    return (
        mg_prune(added, key_col, k)
        .crossJoin(F.broadcast(carry))
        .select(
            key_col, "est",
            (F.col("err") + F.col("__ea") + F.col("__eb")).cast("long")
            .alias("err"),
        )
    )


def spacesaving_word_counts(docs: DataFrame,
                            text_col: str = "text") -> DataFrame:
    """The additive counter table under the heavy-hitter summary:
    per-word exact counts (word, cnt) — one explode + one partial-agged
    groupBy, the word_count shape with empty tokens dropped. ADDITIVE
    under corpus partition, so per-shard / per-micro-batch tables sum to
    the one-shot table (what counts_fold_sink folds)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def spacesaving_hot_words(docs: DataFrame, k: int = 20,
                          text_col: str = "text") -> DataFrame:
    """Heavy-hitter words via the deterministic SpaceSaving/MG summary:
    exact token counts, one MG prune to ``k``. Columns: word, est
    (guaranteed lower bound on the true count), err (= the subtracted
    (k+1)-st counter; true count <= est + err). Hash-checkable because
    every degree of freedom — counter values, boundary tie order, the
    subtraction — is integer + md5."""
    return mg_prune(spacesaving_word_counts(docs, text_col), "word", k)


def spacesaving_sql(k: int, table: str = "documents",
                    text_col: str = "text") -> str:
    """DuckDB twin of :func:`spacesaving_hot_words` — same counts, same
    (cnt DESC, md5(word)) boundary order, same subtract-and-drop."""
    return f"""
        WITH c AS (
          SELECT word, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT unnest(string_split({text_col}, ' ')) AS word
                FROM {table})
          WHERE word <> ''
          GROUP BY 1
        ),
        r AS (
          SELECT word, cnt,
                 row_number() OVER (ORDER BY cnt DESC, md5(word)) AS rn
          FROM c
        ),
        t AS (
          SELECT COALESCE(MAX(CASE WHEN rn = {k + 1} THEN cnt END), 0) AS tv
          FROM r
        )
        SELECT word, CAST(cnt - tv AS BIGINT) AS est,
               CAST(tv AS BIGINT) AS err
        FROM r, t
        WHERE rn <= {k} AND cnt - tv > 0
    """


def mg_prune_grouped(counters: DataFrame, group_col: str, key_col: str,
                     k: int, cnt_col: str = "cnt") -> DataFrame:
    """Per-GROUP Misra-Gries prune — :func:`mg_prune` composed with a
    grouping column (heavy hitters per language / per tenant / per
    day): within each group, subtract the group's (k+1)-st largest
    counter and drop non-positives. Same engine-exact contract (BIGINT,
    (cnt DESC, md5(key)) ties).

    Plan shape: the rank filter runs as WindowGroupLimit (Spark ≥ 3.5
    pushes ``row_number() <= k+1`` map-side, so each partition keeps
    k+1 rows per group before the ONE group-keyed exchange); the
    threshold pass is a second window over ≤ k+1 rows per group.
    Columns: group_col, key_col, est, err."""
    from pyspark.sql.window import Window

    tie = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(
        F.col(cnt_col).desc(), tie.asc())
    ranked = (
        counters.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k + 1)
    )
    t = F.max(
        F.when(F.col("__rn") == k + 1, F.col(cnt_col)).otherwise(F.lit(0))
    ).over(Window.partitionBy(group_col))
    return (
        ranked.withColumn("__t", t)
        .filter((F.col("__rn") <= k)
                & (F.col(cnt_col) - F.col("__t") > 0))
        .select(
            group_col, key_col,
            (F.col(cnt_col) - F.col("__t")).cast("long").alias("est"),
            F.col("__t").cast("long").alias("err"),
        )
    )


def spacesaving_terms_per_lang(docs: DataFrame, k: int = 10) -> DataFrame:
    """Heavy-hitter words PER LANGUAGE via the grouped MG summary — the
    per-tenant frequent-items report every multi-corpus pipeline wants,
    with the same guarantees per group (est ≤ true ≤ est + err, any
    word with true count > err in its language survives).
    Columns: lang, word, est, err."""
    counts = (
        docs.select("lang",
                    F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return mg_prune_grouped(counts, "lang", "word", k)


def spacesaving_grouped_sql(k: int, group_col: str = "lang",
                            table: str = "documents",
                            text_col: str = "text") -> str:
    """DuckDB twin of :func:`spacesaving_terms_per_lang`."""
    return f"""
        WITH c AS (
          SELECT {group_col}, word, CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT {group_col},
                       unnest(string_split({text_col}, ' ')) AS word
                FROM {table})
          WHERE word <> ''
          GROUP BY 1, 2
        ),
        r AS (
          SELECT {group_col}, word, cnt,
                 row_number() OVER (PARTITION BY {group_col}
                                    ORDER BY cnt DESC, md5(word)) AS rn
          FROM c
        ),
        t AS (
          SELECT {group_col},
                 COALESCE(MAX(CASE WHEN rn = {k + 1} THEN cnt END), 0) AS tv
          FROM r GROUP BY 1
        )
        SELECT r.{group_col}, r.word, CAST(r.cnt - t.tv AS BIGINT) AS est,
               CAST(t.tv AS BIGINT) AS err
        FROM r JOIN t USING ({group_col})
        WHERE r.rn <= {k} AND r.cnt - t.tv > 0
    """
