"""Data selection via importance resampling (DSIR, Xie et al. 2023).

Selects raw-corpus documents whose hashed-n-gram profile looks like a
small TARGET corpus (the "quality" distribution): fit two bag-of-n-gram
bucket models — target and raw — and weight every raw document by its
log importance ratio sum_b c_doc[b] * (ln p_target[b] - ln p_raw[b]).
Selection is either deterministic top-k by weight (the paper's top-k
heuristic) or Gumbel-top-k sampling (equivalent to sampling without
replacement proportionally to the importance weights) with md5-derived
uniforms so the "random" draw is bit-reproducible and oracle-checkable.

Scale shape (the whole point of DSIR is that it runs where a trained
scorer can't):

* the corpus is touched ONCE to build its n-gram instances; unigrams +
  bigrams hash into ``n_buckets`` md5 buckets (the hashing trick — same
  md5-slot convention as functions/textstats.py:hashed_tf_embedding, so
  a SQL oracle reproduces every bucket id);
* both fitted models are **n_buckets-row tables** (default 256) — the
  log-ratio table is broadcast state exactly like the ANN quantizers,
  so scoring a 100 TB corpus is one broadcast-hash-join plus one
  per-document aggregation (a single exchange on doc id);
* per-bucket log ratios are rounded to 6dp and carried as MICRO-INT
  longs (×1e6), so each document's weight is an exact integer dot
  product — order-free, partition-invariant, hash-checkable (the same
  integer micro-score discipline the BM25 rows use);
* the final top-k is a TakeOrdered (sort + limit), never a global
  window over the corpus.

No reference analog (the reference is an ER system); this is an
LLM-pipeline extension graded alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 256      # hashed n-gram feature dimensionality
DSIR_SEED = 42          # Gumbel-key seed (md5-derived uniforms)
_MICRO = 1000000


def _words(text_col):
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "")


def ngram_instances(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, gram) — one row per unigram AND bigram instance (the DSIR
    feature space). Map-side only: split + zip_with + explode."""
    w = _words(text_col)
    m = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.zip_with(F.slice(w, 1, m), F.slice(w, 2, m),
                         lambda a, b: F.concat_ws(" ", a, b))
    return docs.select(
        F.col(id_col),
        F.explode(F.concat(w, bigrams)).alias("gram"))


def bucket_col(gram, n_buckets: int):
    """md5-based hashing-trick bucket — bit-reproducible in SQL (unlike
    murmur3), mirroring the hashed_tf_embedding slot convention."""
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10)
            .cast("long") % n_buckets).cast("int")


def dsir_bucket_counts(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(bucket, cnt) — the bag-of-hashed-n-grams model of a corpus.
    ONE exchange collapsing the corpus to at most ``n_buckets`` rows."""
    return (ngram_instances(docs, id_col, text_col)
            .select(bucket_col(F.col("gram"), n_buckets).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def dsir_log_ratio(raw_docs: DataFrame, target_docs: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(bucket, ratio_micro) for EVERY bucket 0..n_buckets-1:
    round(ln p_target[b] - ln p_raw[b], 6) × 1e6 as a long, with add-one
    smoothing p[b] = (cnt[b] + 1) / (total + n_buckets). This is the
    whole fitted model — n_buckets rows of broadcastable driver-ish
    state, the DSIR analog of a pinned ANN codebook."""
    spark = raw_docs.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int")
                                          .alias("bucket"))

    def _model(docs, cnt_name, tot_name):
        counts = dsir_bucket_counts(docs, id_col, text_col, n_buckets)
        tot = counts.agg(F.coalesce(F.sum("cnt"), F.lit(0))
                         .alias(tot_name))
        return counts.withColumnRenamed("cnt", cnt_name), tot

    t_counts, t_tot = _model(target_docs, "t_cnt", "t_tot")
    r_counts, r_tot = _model(raw_docs, "r_cnt", "r_tot")
    full = (spine
            .join(F.broadcast(t_counts), "bucket", "left")
            .join(F.broadcast(r_counts), "bucket", "left")
            .crossJoin(F.broadcast(t_tot))
            .crossJoin(F.broadcast(r_tot)))
    ln_t = F.log((F.coalesce("t_cnt", F.lit(0)) + F.lit(1.0))
                 / (F.col("t_tot") + F.lit(float(n_buckets))))
    ln_r = F.log((F.coalesce("r_cnt", F.lit(0)) + F.lit(1.0))
                 / (F.col("r_tot") + F.lit(float(n_buckets))))
    ratio_micro = F.round(F.round(ln_t - ln_r, 6) * _MICRO).cast("long")
    return full.select("bucket", ratio_micro.alias("ratio_micro"))


def dsir_weights(docs: DataFrame, log_ratio: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """(id, weight_micro) — exact-integer log importance weight of every
    document: sum over its n-gram instances of the bucket's micro log
    ratio. One broadcast join (n_buckets rows) + ONE exchange on doc id;
    empty documents weigh 0."""
    inst = ngram_instances(docs, id_col, text_col).select(
        id_col, bucket_col(F.col("gram"), n_buckets).alias("bucket"))
    summed = (inst.join(F.broadcast(log_ratio), "bucket")
              .groupBy(id_col)
              .agg(F.sum("ratio_micro").alias("weight_micro")))
    return (docs.select(id_col).join(summed, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("weight_micro", F.lit(0).cast("long"))
                    .alias("weight_micro")))


def gumbel_micro_col(id_col, seed: int = DSIR_SEED):
    """Deterministic Gumbel(0,1) noise keyed on md5(seed:id): u in (0,1)
    from the first 8 md5 hex digits, g = -ln(-ln(u)), rounded to 6dp and
    carried as a micro-int long. Same draw in any engine — this is what
    makes SAMPLING hash-checkable."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)),
                              F.col(id_col).cast("string"))), 1, 8),
        16, 10).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    g = -F.log(-F.log(u))
    return F.round(F.round(g, 6) * _MICRO).cast("long")


def dsir_select(raw_docs: DataFrame, target_docs: DataFrame, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = DSIR_BUCKETS, method: str = "gumbel",
                seed: int = DSIR_SEED) -> DataFrame:
    """Select ``k`` raw documents toward the target distribution:
    (id, weight_micro, score_micro, rank). ``method='gumbel'`` adds the
    deterministic md5 Gumbel key (importance *sampling* without
    replacement, the paper's estimator); ``method='topk'`` ranks by raw
    weight (the paper's heuristic variant). Ties break on ascending id.
    The k-row result earns its rank from a window over OUTPUT-sized
    data; the corpus itself only ever sees a sort+limit."""
    if method not in ("gumbel", "topk"):
        raise ValueError(f"unknown DSIR method {method!r}")
    lr = dsir_log_ratio(raw_docs, target_docs, id_col, text_col, n_buckets)
    w = dsir_weights(raw_docs, lr, id_col, text_col, n_buckets)
    score = (F.col("weight_micro") + gumbel_micro_col(id_col, seed)
             if method == "gumbel" else F.col("weight_micro"))
    scored = w.select(id_col, "weight_micro",
                      score.cast("long").alias("score_micro"))
    top = scored.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k)
    from pyspark.sql import Window
    rn = F.row_number().over(
        Window.orderBy(F.desc("score_micro"), F.asc(id_col)))
    return top.select(id_col, "weight_micro", "score_micro",
                      rn.cast("int").alias("rank"))


def cluster_balanced_sample(emb: DataFrame, n_cells: int = 16,
                            per_cell: int = 16, id_col: str = "vec_id",
                            vec_col: str = "embedding", seed: int = 42,
                            draw_seed: int = 7) -> DataFrame:
    """Topic-balanced corpus pruning over an embedding column (the
    cluster-then-balance step of Sorscher et al. 2022's data pruning and
    Tirumala et al. 2023's D4): cluster every vector with the SAME
    deterministic IVF coarse quantizer the ANN/SemDeDup stack uses
    (:func:`~.ann.ivf_assign_cells` — driver-state centroid literals,
    one narrow map-side assignment pass), then keep at most ``per_cell``
    members of each cluster, chosen by a seeded md5 draw — so no
    majority topic can dominate the training mix, and the "random"
    survivors are bit-reproducible in a SQL oracle.

    Output: (id, cell_id, cell_rank) for the KEPT rows only — the
    per-cell rank window is therefore a WindowGroupLimit (the top-k
    pushes below the sort), never a full per-cell sort materializing
    ranks for dropped rows; downstream left-anti-joins for the drops.
    100 TB shape: one narrow assignment projection + one exchange on
    cell_id with a group-limited window.
    """
    from pyspark.sql import Window
    from .ann import ivf_assign_cells

    _, assigned = ivf_assign_cells(emb, n_cells, id_col, vec_col, seed)
    draw = F.md5(F.concat(F.col(id_col).cast("string"),
                          F.lit(f":{draw_seed}")))
    w = Window.partitionBy("cell_id").orderBy(draw, F.col(id_col))
    return (assigned
            .select(F.col(id_col), "cell_id",
                    F.row_number().over(w).cast("int").alias("cell_rank"))
            .where(F.col("cell_rank") <= per_cell))
