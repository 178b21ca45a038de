"""Deterministic bottom-k (KMV) sketches — distinct counting and
cross-source overlap WITHOUT corpus-width state.

At 100 TB you cannot afford exact distinct counts per slice (the exchange
carries every distinct item), and you certainly cannot afford pairwise
set intersections between corpus slices. The classic answer is a bottom-k
/ KMV sketch (Bar-Yossef et al. 2002; the theta-sketch family): keep only
the k SMALLEST hash values per group — O(k) state, mergeable as a monoid
(union = merge + re-truncate), with

* distinct estimate   n̂ = (k-1) / h_(k)   (h_(k) = k-th smallest hash
  normalized to (0,1); exact when the group has fewer than k items), and
* Jaccard estimate    Ĵ(A,B) = |X ∩ S_A ∩ S_B| / |X| where X is the
  bottom-k of S_A ∪ S_B — the standard bottom-k set-similarity estimator
  (each element of X is a uniform sample of A∪B; membership in both
  sketches ⇔ membership in A∩B for sampled elements).

Unlike Spark's HLL++ (`approx_count_distinct`, engine-private register
layout), the KMV hash order is md5 — EXACTLY reproducible in any SQL
engine — so these approximate operators still carry full-plan DuckDB
oracles: the hash match verifies the sketch itself, not agreement with
an exact count. No reference analog (LLM-pipeline extension): the
production use is the corpus overlap matrix that drives mixture design
(which sources duplicate each other) and per-slice vocabulary profiling.

Scale shape: ONE distinct-(group, item) pass; per-group bottom-k via a
rank window (rank ≤ k ⇒ WindowGroupLimit pushes a partial top-k below
the exchange — the same shape as the PQ codebook draw); everything
downstream touches only the O(groups × k) sketch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-prefix → uniform (0,1): 32-bit integer / 2^32 (0 is impossible for
# a nonempty string only in theory — guarded by the (k-1)/h formula using
# the k-th value, never 0 in practice; collisions at 2^-32 are the
# sketch's documented noise floor)
_HASH_DENOM = float(1 << 32)


def _item_hash(item) -> F.Column:
    return (F.conv(F.substring(F.md5(item), 1, 8), 16, 10)
            .cast("double") / F.lit(_HASH_DENOM))


def kmv_sketch_table(items: DataFrame, group_col: str, item_col: str,
                     k: int = 64) -> DataFrame:
    """(group, h) — the k smallest distinct item hashes per group, one row
    per retained hash. The whole sketch state is O(groups × k)."""
    hashed = items.select(
        F.col(group_col).alias("grp"),
        _item_hash(F.col(item_col)).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("grp", "h", "_rn")
    )


def kmv_distinct(items: DataFrame, group_col: str, item_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate: (group, n_est). Exact when the
    group holds fewer than k items (the sketch isn't full); otherwise
    (k-1)/h_(k). Rounded to 4dp so cross-engine double division can't
    flip the hash."""
    sk = kmv_sketch_table(items, group_col, item_col, k)
    agg = sk.groupBy("grp").agg(
        F.count("*").alias("n_in"),
        F.max(F.when(F.col("_rn") == k, F.col("h"))).alias("hk"),
    )
    est = F.when(F.col("n_in") < k, F.col("n_in").cast("double")) \
        .otherwise((F.lit(float(k - 1))) / F.col("hk"))
    return agg.select(F.col("grp").alias(group_col),
                      F.round(est, 4).alias("n_est"))


def kmv_source_overlap(items: DataFrame, group_col: str, item_col: str,
                       k: int = 64) -> DataFrame:
    """Pairwise group Jaccard estimates from the sketches ALONE:
    (group_a, group_b, jaccard_est) for every unordered group pair —
    the corpus overlap matrix, O(groups² × k) work over O(groups × k)
    state, the corpus itself read exactly once (by the sketch pass).

    For each pair, X = bottom-k of the merged hash sets; Ĵ = fraction of
    X present in BOTH sketches. Rounded to 4dp on both engines."""
    sk = kmv_sketch_table(items, group_col, item_col, k)
    groups = sk.select("grp").distinct()
    pairs = (
        groups.select(F.col("grp").alias("ga"))
        .join(groups.select(F.col("grp").alias("gb")),
              F.col("ga") < F.col("gb"))
    )
    # union row set: one row per (ga, gb, h) with membership flags
    a = sk.select(F.col("grp").alias("ga"), "h")
    b = sk.select(F.col("grp").alias("gb"), "h")
    ua = pairs.join(a, "ga").select("ga", "gb", "h",
                                    F.lit(1).alias("fa"), F.lit(0).alias("fb"))
    ub = pairs.join(b, "gb").select("ga", "gb", "h",
                                    F.lit(0).alias("fa"), F.lit(1).alias("fb"))
    union = (
        ua.unionByName(ub)
        .groupBy("ga", "gb", "h")
        .agg(F.max("fa").alias("in_a"), F.max("fb").alias("in_b"))
    )
    # tie-break on the flags too: if two distinct items collide on h at
    # the k boundary (2^-32 noise floor), the row kept must be the same
    # one in every engine
    w = Window.partitionBy("ga", "gb").orderBy("h", "in_a", "in_b")
    x = union.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return (
        x.groupBy("ga", "gb")
        .agg(F.round(F.sum(F.col("in_a") * F.col("in_b"))
                     / F.count("*"), 4).alias("jaccard_est"))
        .select(F.col("ga").alias(f"{group_col}_a"),
                F.col("gb").alias(f"{group_col}_b"), "jaccard_est")
    )


HLL_M = 64          # registers (b = 6 index bits)
_HLL_W_BITS = 54    # 60-bit md5 prefix minus the 6 index bits
_HLL_RHO_MAX = _HLL_W_BITS + 1
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# Pre-folded estimator numerator: alpha * m^2 * 2^RHO_MAX, so the per-group
# estimate is ONE double division by an exactly-integer denominator.
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX)
_HLL_SMALL = 2.5 * HLL_M


def hll_register_table(items: DataFrame, group_col: str,
                       item_col: str) -> DataFrame:
    """(grp, j, m_j) — HyperLogLog registers (Flajolet et al. 2007) from a
    60-bit md5 prefix: j = low 6 bits, rho = leading-zero rank of the
    remaining 54 bits. FIXED m = 64 registers → 64 rows of state per
    group, ever.

    Two deliberate contrasts with :func:`kmv_sketch_table`:

    * NO distinct pre-pass — ``max(rho)`` is idempotent, so duplicate
      items fold map-side for free. At 100 TB that removes the one
      distinct-width exchange KMV needs; the only shuffle here carries
      at most groups × 64 partially-combined register rows.
    * The register transform is pure integer/bit arithmetic
      (``shiftright`` for the index split, base-2 string length for the
      leading-zero rank), so — unlike Spark's engine-private HLL++
      registers in ``approx_count_distinct`` — the APPROXIMATE sketch
      replays exactly in any SQL engine and carries a full-plan oracle.
    """
    h = (F.conv(F.substring(F.md5(F.col(item_col)), 1, 15), 16, 10)
         .cast("long"))
    w = F.shiftright(h, 6)
    rho = (F.when(w == 0, F.lit(_HLL_RHO_MAX))
           .otherwise(F.lit(_HLL_RHO_MAX)
                      - F.length(F.conv(w.cast("string"), 10, 2))))
    return (
        items.select(F.col(group_col).alias("grp"),
                     F.pmod(h, F.lit(HLL_M)).alias("j"),
                     rho.alias("rho"))
        .groupBy("grp", "j")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_distinct(items: DataFrame, group_col: str,
                 item_col: str) -> DataFrame:
    """Per-group HLL distinct estimate: (group, n_est). Standard
    bias-corrected estimator with the small-range linear-counting branch
    (E ≤ 2.5m and empty registers present → m·ln(m/V)).

    Cross-engine determinism: the harmonic sum Σ2^(-m_j) is computed as
    an INTEGER Σ2^(RHO_MAX-m_j) (order-free bigint addition — double
    summation order could flip the last ulp between engines), the
    estimate is then one double division, rounded to 4dp on both sides."""
    return hll_estimate(hll_register_table(items, group_col, item_col),
                        group_col)


def hll_estimate(registers: DataFrame, group_col: str = "grp") -> DataFrame:
    """Estimator over a (grp, j, m_j) register table (from
    :func:`hll_register_table` or a :func:`hll_merge` roll-up):
    (group, n_est). Split out so incremental register state can be
    estimated without re-touching any corpus."""
    agg = registers.groupBy("grp").agg(
        F.count("*").alias("nz"),
        F.sum(F.expr(f"shiftleft(1L, {_HLL_RHO_MAX} - m_j)")).alias("s"),
    )
    v = F.lit(HLL_M) - F.col("nz")
    denom = (F.col("s")
             + v.cast("long") * F.lit(1 << _HLL_RHO_MAX).cast("long"))
    e_raw = F.lit(_HLL_NUM) / denom.cast("double")
    est = F.when((e_raw <= F.lit(_HLL_SMALL)) & (v > 0),
                 F.lit(float(HLL_M))
                 * F.log(F.lit(float(HLL_M)) / v.cast("double"))) \
        .otherwise(e_raw)
    return agg.select(F.col("grp").alias(group_col),
                      F.round(est, 4).alias("n_est"))


def hll_merge(registers: DataFrame) -> DataFrame:
    """Merge register tables (grp, j, m_j) built over SLICES of a corpus:
    per-register ``max`` — the HLL monoid. Output matches
    :func:`hll_register_table` over the unioned input exactly
    (pytest-pinned), which is what lets 1000 executors sketch partitions
    independently and roll daily snapshots up at O(m) per group."""
    return registers.groupBy("grp", "j").agg(F.max("m_j").alias("m_j"))


def kmv_merge(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge sketch tables (grp, h[, _rn]) built over SLICES of a corpus
    into the sketch of the union: distinct + re-truncate to the k
    smallest per group — the monoid property that lets 1000 executors
    sketch their partitions independently and combine at O(k) per group
    (also how daily snapshot sketches roll up without re-reading
    history). Output matches :func:`kmv_sketch_table` over the unioned
    input exactly (pytest-pinned)."""
    w = Window.partitionBy("grp").orderBy("h")
    return (
        sketches.select("grp", "h").distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("grp", "h", "_rn")
    )
