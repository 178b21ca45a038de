"""Family-operator semantics (G1/G2/J9): family-id coalesce, role priority,
GUO + member expansion with the original>GUO>member dedup priority."""

import pyspark.sql.functions as F

from entity_resolution_pipeline_spark.operators.family import (
    derive_family_structure, expand_candidates_by_family, family_members_topk,
)


def _entities(spark):
    rows = [
        # (bvd, guo, sub, sh, branch)
        ("g1", "g1", None, None, None),    # GUO of family g1
        ("a",  "g1", "x", None, None),     # subsidiary in g1
        ("b",  "g1", None, None, "br"),    # branch in g1
        ("c",  "g1", None, "sh", None),    # shareholder-only → ENTITY
        ("solo", None, None, None, None),  # standalone → own family
        ("e",  "", None, None, None),      # empty-string guo == absent
    ]
    return spark.createDataFrame(
        rows, ["bvd_id", "guo_bvd_id", "sub_bvd_id", "sh_bvd_id", "branch_bvd_id"])


def test_derive_family_structure(spark):
    fam = {r["bvd_id"]: r for r in derive_family_structure(_entities(spark)).collect()}
    assert fam["g1"]["family_id"] == "g1" and fam["g1"]["entity_role"] == "GUO"
    assert fam["a"]["family_id"] == "g1" and fam["a"]["entity_role"] == "SUBSIDIARY"
    assert fam["b"]["entity_role"] == "BRANCH"      # branch beats nothing else
    assert fam["c"]["entity_role"] == "ENTITY"      # sh alone is not a role
    assert fam["solo"]["family_id"] == "solo" and fam["solo"]["has_guo"] == 0
    assert fam["e"]["family_id"] == "e"             # '' treated as absent
    assert fam["a"]["edge_count"] == 2              # guo + sub


def test_family_members_topk_cap(spark):
    fam = derive_family_structure(_entities(spark))
    top2 = family_members_topk(fam, 2)
    per_family = {r["family_id"]: r["cnt"] for r in
                  top2.groupBy("family_id").agg(F.count("*").alias("cnt")).collect()}
    assert all(v <= 2 for v in per_family.values())
    # smallest ids first: family g1 members sorted → 'a', 'b'
    g1 = sorted(r["bvd_id"] for r in top2.where("family_id = 'g1'").collect())
    assert g1 == ["a", "b"]


def test_expand_candidates_by_family(spark):
    fam = derive_family_structure(_entities(spark))
    cands = spark.createDataFrame(
        [("q1", "a"), ("q2", "solo")], ["cb_id", "bvd_id"])
    out = expand_candidates_by_family(cands, fam, max_family_members=10)
    rows = {(r["cand_id"], r["entity_id"]): r for r in out.collect()}
    # original kept with ORIGINAL source
    assert rows[("q1", "a")]["blocking_sources"] == "ORIGINAL"
    # GUO expansion wins over member expansion for the same (cand, entity)
    assert rows[("q1", "g1")]["blocking_sources"] == "FAMILY_EXPAND_GUO"
    # other members arrive as FAMILY_EXPAND
    assert rows[("q1", "b")]["blocking_sources"] == "FAMILY_EXPAND"
    assert rows[("q1", "c")]["blocking_sources"] == "FAMILY_EXPAND"
    # standalone candidate expands to nothing beyond itself
    q2 = [k for k in rows if k[0] == "q2"]
    assert q2 == [("q2", "solo")]
    # determinism
    again = {(r["cand_id"], r["entity_id"]): r["blocking_sources"]
             for r in expand_candidates_by_family(
                 cands, fam, max_family_members=10).collect()}
    assert again == {k: v["blocking_sources"] for k, v in rows.items()}
