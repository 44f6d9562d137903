"""Similarity search over the ``embeddings`` table (SURVEY.md §2.B X9).

Cosine math uses built-in higher-order functions (``zip_with`` /
``aggregate`` — sequential left-fold in double precision), which is
bit-compatible with DuckDB's ``list_dot_product`` on ``DOUBLE[]`` — verified
empirically, so exact value-hash parity holds without rounding.

Brute-force top-k is the exactness baseline and the oracle; the scale path
(bucketed LSH pruning) lives in ``q_ann_lsh_topk`` — same top-k contract,
candidate generation bounded by bucket collisions instead of N².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import davg
from ..functions.oracle_sql import sql_davg
from ..functions.vectors import cosine_similarity, dot, l2_norm
from ..sources.tables import load_table

ORACLES: dict[str, str] = {}

N_QUERY_VECS = 10  # vec_id < 10 are the query set
TOP_K = 5
LSH_TABLES = 8  # OR-amplification: candidate if ANY table's code matches
LSH_BITS = 4  # AND-amplification within a table: all 4 sign bits match

_DUCK_COS = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


def _cos(a: str, b: str) -> F.Column:
    """dot/(|a|*|b|) with the exact op structure of ``_DUCK_COS``."""
    return dot(F.col(a), F.col(b)) / (l2_norm(F.col(a)) * l2_norm(F.col(b)))


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X9 baseline: exact top-k cosine neighbors for the query set.

    Query side is tiny -> broadcast it; candidates stream by, so the cost
    is one scan of the corpus per batch of queries (the right brute-force
    layout at scale: broadcast Q, never shuffle the corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms computed ONCE per side, not per pair — O(N) instead of O(N*Q)
    # norm evaluations; the per-pair work is a single dot product
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    sim = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_norm") * F.col("c_norm")
    )
    pairs = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "rn", "neighbor_id", "cosine")
    )


ORACLES["knn_cosine"] = f"""
SELECT query_id, rn, neighbor_id, cosine FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DUCK_COS} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_DUCK_COS} DESC, b.vec_id ASC) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < {N_QUERY_VECS}
) WHERE rn <= {TOP_K}
"""


def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats: count + mean L2 norm (quantized mean for
    cross-engine stability)."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = l2_norm(F.col("embedding"))
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            davg(F.col("norm")).alias("avg_norm"),
        )
    )


ORACLES["embedding_norm_stats"] = f"""
SELECT label, COUNT(*) AS n_vectors,
       {sql_davg("SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))")} AS avg_norm
FROM embeddings GROUP BY label
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= 0.9, a <.> b once).
    Brute pairs at test scale; LSH blocking at 100 TB (see ann_lsh)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
                   l2_norm(F.col("embedding")).alias("na"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
                   l2_norm(F.col("embedding")).alias("nb"))
    sim = dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= 0.9)
    )


ORACLES["embedding_near_dup"] = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_DUCK_COS} AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_DUCK_COS} >= 0.9
"""


# --- ANN: random-hyperplane LSH (the 100 TB path; rows-only check) ----------

def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component via md5 — no RNG
    state, reproducible on any engine/cluster."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:8]
        out.append(int(h, 16) / float(0xFFFFFFFF) - 0.5)
    return out


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """X9 at scale: multi-table random-hyperplane LSH.

    Each vector gets ``LSH_TABLES`` sign codes of ``LSH_BITS`` hyperplane
    bits.  A corpus vector is a candidate for a query iff ANY table's code
    matches (OR-amplification recovers recall that a single code cannot
    achieve on weakly-clustered data); candidates are exact-cosine
    re-ranked for the top-k.  Approximate by construction — no SQL oracle;
    recall vs the exact baseline is pytest-asserted.

    100 TB shape: coding is a narrow scan (no shuffle); the candidate join
    shuffles on (table, code) so only colliding vectors meet; tune
    LSH_BITS up as the corpus grows (collision count ~ N / 2^bits per
    table) and LSH_TABLES up for recall.
    """
    emb = load_table(spark, sf_dir, "embeddings")

    def code_for_table(t: int) -> F.Column:
        code = None
        for b in range(LSH_BITS):
            plane = _hyperplane(dim, t * LSH_BITS + b)
            arr = F.array(*[F.lit(v) for v in plane])
            proj = F.aggregate(
                F.zip_with(F.col("embedding"), arr,
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            bit = F.when(proj > 0, 2 ** b).otherwise(0)
            code = bit if code is None else code + bit
        return code

    # (vec_id, embedding, table, code) — one row per table per vector
    coded = emb.select(
        "vec_id", "embedding",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("table"),
                         code_for_table(t).alias("code"))
                for t in range(LSH_TABLES)
            ])
        ).alias("tc"),
    ).select("vec_id", "embedding", "tc.table", "tc.code")

    q = coded.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
        "table", F.col("code").alias("q_code"),
    )
    c = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
        "table", F.col("code").alias("c_code"),
    )
    candidates = (
        F.broadcast(q)
        .join(c, ["table"])
        .filter((F.col("q_code") == F.col("c_code"))
                & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "q_emb", "q_norm", "neighbor_id", "c_emb", "c_norm")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_norm") * F.col("c_norm")
    )
    pairs = candidates.select("query_id", "neighbor_id", sim.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "rn", "neighbor_id", "cosine")
    )
