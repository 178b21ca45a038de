"""Corporate-family operators (G1/G2/J9).

Reference analogs (pandas dict/iterrows loops re-expressed as DataFrame ops):

  * derive_family_structure — /root/reference/src/orbis_graph.py:34-108:
    ``family_id = guo if present else own id``; role priority GUO > BRANCH
    > SUBSIDIARY > ENTITY; per-row edge flags. Here one narrow projection —
    zero shuffle at any scale.
  * expand_candidates_by_family — /root/reference/src/orbis_graph.py:227-297:
    each candidate (cand, entity) additionally proposes the entity's GUO and
    up to k family members. The reference builds three driver-side dicts over
    the full 15.9M-row structure table; here it is two equi-joins plus a
    windowed top-k, so the structure table never leaves the cluster. Member
    order is sorted-by-id (the deterministic analog of the reference's
    file-order ``members[:k]``). Dedup priority on collision: original
    candidate row > GUO expansion > member expansion (reference
    ``keep='first'`` after concat in that order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _present(c: Column) -> Column:
    return c.isNotNull() & (c.cast("string") != "")


def derive_family_structure(entities: DataFrame, id_col: str = "bvd_id",
                            guo_col: str = "guo_bvd_id",
                            sub_col: str = "sub_bvd_id",
                            sh_col: str = "sh_bvd_id",
                            branch_col: str = "branch_bvd_id") -> DataFrame:
    """(id, family_id, entity_role, guo, has_* flags, edge_count) — G1."""
    ic, guo = F.col(id_col), F.col(guo_col)
    sub, sh, br = F.col(sub_col), F.col(sh_col), F.col(branch_col)
    family_id = F.when(_present(guo), guo.cast("string")) \
                 .otherwise(ic.cast("string"))
    role = (
        F.when(_present(guo) & (ic.cast("string") == guo.cast("string")), "GUO")
        .when(_present(br), "BRANCH")
        .when(_present(sub), "SUBSIDIARY")
        .otherwise("ENTITY")
    )
    has = {
        "has_guo": _present(guo), "has_sub": _present(sub),
        "has_sh": _present(sh), "has_branch": _present(br),
    }
    out = entities.where(_present(ic)).select(
        ic.alias("bvd_id"),
        family_id.alias("family_id"),
        role.alias("entity_role"),
        F.when(_present(guo), guo.cast("string")).alias("guo_bvd_id"),
        *[v.cast("int").alias(k) for k, v in has.items()],
    )
    return out.withColumn(
        "edge_count",
        F.col("has_guo") + F.col("has_sub") + F.col("has_sh") + F.col("has_branch"),
    )


def structural_features(family: DataFrame) -> DataFrame:
    """Per-entity structural scorer features (F9,
    /root/reference/src/features.py structural block): ``is_guo`` flag and
    ``log1p_family_size``. Family sizes come from one map-side-combined
    count shuffle; the join back is on family_id (broadcast when the
    family dimension is small)."""
    sizes = family.groupBy("family_id").agg(F.count("*").alias("family_size"))
    return (
        family.join(sizes, "family_id")
        .select(
            "bvd_id", "family_id",
            (F.col("entity_role") == "GUO").cast("double").alias("is_guo"),
            F.round(F.log1p(F.col("family_size").cast("double")), 6)
             .alias("log1p_family_size"),
        )
    )


def family_members_topk(family: DataFrame, k: int) -> DataFrame:
    """(family_id, bvd_id, member_rank) — the k smallest-id members per
    family. One shuffle on family_id; WindowGroupLimit pushes the cap down
    so hot mega-families never materialize beyond k rows per partition."""
    w = Window.partitionBy("family_id").orderBy(F.asc("bvd_id"))
    return (
        family.select("family_id", "bvd_id")
        .withColumn("member_rank", F.row_number().over(w))
        .where(F.col("member_rank") <= k)
    )


def expand_candidates_by_family(candidates: DataFrame, family: DataFrame,
                                max_family_members: int = 10,
                                cand_id: str = "cb_id",
                                entity_id: str = "bvd_id") -> DataFrame:
    """J9/G2: add GUO + top-k family members per candidate edge.

    Input candidates: (cand_id, entity_id [, blocking_sources,
    blocking_score, rank]); missing payload columns default like the
    reference's originals. Output schema is the same five columns, deduped
    on (cand_id, entity_id) with priority original > GUO > member.
    """
    cols = ["blocking_sources", "blocking_score", "rank"]
    base = candidates
    for c, d in zip(cols, [F.lit("ORIGINAL"), F.lit(100), F.lit(1)]):
        if c not in base.columns:
            base = base.withColumn(c, d)
    base = base.select(
        F.col(cand_id).alias("cand_id"),
        F.col(entity_id).cast("string").alias("entity_id"),
        *cols, F.lit(0).alias("_prio"),
    )

    fam = family.select(F.col("bvd_id").cast("string").alias("entity_id"),
                        "family_id", "guo_bvd_id")
    joined = base.select("cand_id", "entity_id").join(fam, "entity_id")

    guo_rows = (
        joined.where(F.col("guo_bvd_id").isNotNull()
                     & (F.col("guo_bvd_id") != F.col("entity_id")))
        .select(
            "cand_id", F.col("guo_bvd_id").alias("entity_id"),
            F.lit("FAMILY_EXPAND_GUO").alias("blocking_sources"),
            F.lit(10).alias("blocking_score"), F.lit(999).alias("rank"),
            F.lit(1).alias("_prio"),
        )
    )

    members = family_members_topk(
        family.select("family_id", F.col("bvd_id").cast("string").alias("bvd_id")),
        max_family_members)
    member_rows = (
        joined.join(members, "family_id")
        .where((F.col("bvd_id") != F.col("entity_id"))
               & (F.col("guo_bvd_id").isNull()
                  | (F.col("bvd_id") != F.col("guo_bvd_id"))))
        .select(
            "cand_id", F.col("bvd_id").alias("entity_id"),
            F.lit("FAMILY_EXPAND").alias("blocking_sources"),
            F.lit(5).alias("blocking_score"), F.lit(999).alias("rank"),
            F.lit(2).alias("_prio"),
        )
    )

    all_rows = base.unionByName(guo_rows).unionByName(member_rows)
    w = Window.partitionBy("cand_id", "entity_id").orderBy(
        F.asc("_prio"), F.asc("rank"), F.asc("blocking_sources"))
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("cand_id", "entity_id", *cols)
    )
