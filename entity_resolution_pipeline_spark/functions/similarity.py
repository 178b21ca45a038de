"""Pairwise similarity functions (SURVEY.md §2.8).

Native Column expressions wherever Spark has a JVM-side implementation
(levenshtein, token-Jaccard via array ops, prefix/acronym equality,
embedding cosine via zip_with/aggregate). Jaro-Winkler has no Spark builtin
and rapidfuzz is not in this environment, so it is a pure-Python
implementation applied batch-wise inside a pandas UDF — sanctioned Python
touchpoint #2 (SURVEY.md §2.14; reference semantics:
/root/reference/src/features.py:45-119).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# --- Jaro-Winkler (pure python, Arrow-batched) --------------------------------


def jaro_winkler_py(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Standard Jaro-Winkler similarity in [0, 1].

    Short-circuits on equality/emptiness like the reference
    (/root/reference/src/features.py:58-66).
    """
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(len1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0
    if jaro <= 0.7:  # standard Winkler boost threshold (rapidfuzz/DuckDB)
        return jaro
    prefix = 0
    for a, b in zip(s1, s2):
        if a == b and prefix < 4:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_weight * (1.0 - jaro)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    return pd.Series([jaro_winkler_py(x, y) for x, y in zip(av, bv)], dtype="float64")


def token_sort_ratio_py(s1: str, s2: str) -> float:
    """Token-sort similarity in [0,1]: sort tokens, then normalized
    indel ratio (reference uses fuzz.token_sort_ratio/100,
    /root/reference/src/features.py:139-148)."""
    if not s1 or not s2:
        return 0.0
    a = " ".join(sorted(s1.split()))
    b = " ".join(sorted(s2.split()))
    if a == b:
        return 1.0
    # normalized indel similarity = 1 - distance/(len(a)+len(b)),
    # where indel distance = len(a)+len(b) - 2*LCS.
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1]
            else:
                cur[j] = 1 + min(prev[j], cur[j - 1])
        prev = cur
    dist = prev[lb]
    return 1.0 - dist / (la + lb)


@pandas_udf(DoubleType())
def token_sort_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    return pd.Series([token_sort_ratio_py(x, y) for x, y in zip(av, bv)], dtype="float64")


# --- native similarity expressions --------------------------------------------


def token_jaccard_col(tokens_a: Column, tokens_b: Column) -> Column:
    """|A∩B| / |A∪B| over token arrays (F3; src/features.py:122-136).

    Pure array arithmetic — stays JVM-side.
    """
    a = F.array_distinct(tokens_a)
    b = F.array_distinct(tokens_b)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def levenshtein_ratio_col(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(len) — native `levenshtein` builtin (F2)."""
    ml = F.greatest(F.length(a), F.length(b))
    return F.when(ml > 0, 1.0 - F.levenshtein(a, b) / ml).otherwise(F.lit(1.0))


def prefix_match_col(a: Column, b: Column, k: int = 8) -> Column:
    """First-k alnum chars equal, both at least k long (F4)."""
    pa = F.substring(F.regexp_replace(a, r"[^a-z0-9]", ""), 1, k)
    pb = F.substring(F.regexp_replace(b, r"[^a-z0-9]", ""), 1, k)
    return (F.length(pa) >= k) & (pa == pb)


def cosine_col(a: Column, b: Column) -> Column:
    """Embedding cosine over two array<float|double> columns (F10).

    Native fold: zip_with product → aggregate sum; norms likewise. Arrays are
    co-located on the row, so this is a narrow, codegen-friendly expression —
    no UDF, no sidecar matrix (contrast reference mmap gather,
    /root/reference/src/features.py:825-866).
    """
    from .hashing import _bind

    def _with(ad: Column, bd: Column) -> Column:
        # fold order is part of the spec: oracles reproduce these doubles
        # bit-for-bit, so binding must not reorder the arithmetic (it
        # doesn't — it only stops the cast arrays evaluating twice each)
        dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y),
                          F.lit(0.0), lambda acc, x: acc + x)
        na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x),
                                F.lit(0.0), lambda acc, x: acc + x))
        nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x),
                                F.lit(0.0), lambda acc, x: acc + x))
        stats = F.struct(dot.alias("dot"), na.alias("na"), nb.alias("nb"))
        return _bind(stats, lambda s: F.when(
            (s["na"] > 0) & (s["nb"] > 0),
            s["dot"] / (s["na"] * s["nb"])).otherwise(F.lit(0.0)))

    return _bind(
        F.transform(a, lambda x: x.cast("double")),
        lambda ad: _bind(F.transform(b, lambda x: x.cast("double")),
                         lambda bd: _with(ad, bd)))


# --- SRP projection (Arrow-batched numpy matmul) ------------------------------


def srp_projection_udf(planes: list[list[float]]):
    """All sign-random-projection dot products per vector in one numpy
    matmul per Arrow batch: (batch × dim) @ (dim × n_planes).

    Sanctioned vectorized touchpoint: per-element higher-order-function
    folds are interpreted (no codegen) and benchmarked ~1000× slower than
    BLAS for this shape, and a per-plane expression tree makes Catalyst
    analysis itself the bottleneck. numpy's pairwise summation differs
    from a sequential fold only in the last ulps — sign decisions (the
    only thing consumed downstream) are never that close on real data.
    """
    import numpy as np

    W = np.asarray(planes, dtype=np.float64).T  # dim × n_planes

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        M = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        P = M @ W
        return pd.Series(list(P))

    return proj
