"""In-engine document embeddings — hashed TF-IDF with signed feature
hashing (the "hashing trick", Weinberger et al. 2009), L2-normalized.

Closes the loop the embedding operators otherwise leave to an external
model: text -> ``doc_embeddings`` -> SemDeDup / embedding LSH dedup /
ANN, all inside the engine. The reference consumes precomputed
signals/models only (README.md:78); sparse hashed TF-IDF is the standard
model-free baseline those pipelines bootstrap from.

Formulation (exact-integer until the final division, so both engines
agree bit-for-bit):

* tf(doc, tok)  — one grouped count;
* idf_micro(tok) = round(ln((N+1)/(df+1)) * 1e6) + 1e6  (sklearn's
  smoothed idf, in integer micro-units);
* feature index = md5int(tok) % dim, sign = parity of the seeded hash
  (md5int("1:" || tok)) — the signed hashing trick, unbiased in
  expectation;
* cell value s(doc, i) = SUM sign * tf * idf_micro  — a bigint sum,
  order-independent;
* embedding_i = round(s_i / sqrt(SUM s_j^2), 6)  — the micro factors
  cancel in the normalization; the sum of squares is accumulated in
  DECIMAL(38,0) (HUGEINT oracle-side) so it is exact, and the single
  double division per element is order-independent.

Scale shape: two corpus-token shuffles (tf, then the contribution sum
keyed on (doc, index)); the idf table is vocabulary-sized and joins on
the token key; the dense assembly is a dim-bounded grid join + one
grouped sort-collect per doc (dim elements — the only higher-order
function is the final dim-element struct extraction, the same pattern
as span_dedup's rebuild). Nothing reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5int, md5int_seeded
from ..functions.vectors import round_half_up
from ..functions.text import normalize, tokens

EMB_ROUND = 6


def doc_embeddings(
    docs: DataFrame, id_col: str, text_col: str = "text", dim: int = 64
) -> DataFrame:
    """DF(id, embedding: array<double>): L2-normalized hashed-TF-IDF
    document vectors. Docs with no tokens (null/empty text) get the zero
    vector."""
    ids = docs.select(F.col(id_col).alias("id"))
    tk = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(normalize(F.col(text_col)))).alias("tok"),
    )
    # tf feeds both the df/idf branch and the contribution join; checkpoint
    # the (doc, token)-sized table so the corpus explode runs once
    # (Catalyst does not share subplans — same convention as vocab.py)
    tf = (
        tk.groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = ids.agg(F.count("*").alias("_n"))
    idf = dfreq.crossJoin(F.broadcast(n)).select(
        "tok",
        (
            F.round(
                F.log((F.col("_n") + 1) / (F.col("df") + 1)) * F.lit(1e6)
            ).cast("long")
            + F.lit(1_000_000)
        ).alias("idf_u"),
    )
    contrib = (
        tf.join(idf, "tok")
        .select(
            "id",
            F.pmod(md5int(F.col("tok")), F.lit(dim)).alias("idx"),
            (
                F.when(F.pmod(md5int_seeded(1, F.col("tok")), F.lit(2)) == 0, 1)
                .otherwise(-1)
                * F.col("tf")
                * F.col("idf_u")
            ).cast("long").alias("c"),
        )
        .groupBy("id", "idx")
        .agg(F.sum("c").alias("s"))
    )
    # ONE aggregation per doc carries both the sparse cells (as a map) and
    # the exact decimal sum of squares; the dense array is then a single
    # dim-bounded projection (map lookup per index, zero-filled). The
    # previous composition — separate norm aggregation, ids x dim grid
    # crossJoin, two joins, and a sort-collect re-aggregation — paid three
    # extra exchanges for the same cells (guide §2.4). Arithmetic is
    # unchanged: the identical round_half_up(s / sqrt(ss)) per cell.
    agg = contrib.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "s"))).alias("_m"),
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s"))
        .cast("double")
        .alias("_ss"),
    )
    dense = agg.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(
                F.col("_ss") > 0,
                round_half_up(
                    F.coalesce(F.col("_m")[i], F.lit(0)) / F.sqrt(F.col("_ss")),
                    EMB_ROUND,
                ),
            ).otherwise(0.0),
        ).alias("embedding"),
    )
    zero = F.array(*[F.lit(0.0)] * dim)
    return ids.join(dense, "id", "left").select(
        "id", F.coalesce("embedding", zero).alias("embedding")
    )
