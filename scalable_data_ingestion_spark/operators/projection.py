"""Dimensionality reduction: deterministic sign-random projection.

Johnson-Lindenstrauss-style reduction of the 64-d embedding column to
8 dimensions with a ±1 projection matrix. The matrix is derived from
md5 at module import (a pure function of (i, j) — no RNG state), and
the arithmetic is BIGINT fixed-point over 1e4-quantized components, so
the projection is exact: both engines produce identical integers no
matter how the sums are ordered.

Scale notes (billions of vectors):
- The Spark side is ENTIRELY map-side: the ±1 rows are embedded as
  literal arrays and each output dimension is one
  ``aggregate(zip_with(...))`` fold inside whole-stage codegen — zero
  shuffles, zero joins, no UDF. Reducing 64-d to 8-d before an LSH/IVF
  index cuts that index's shuffle volume 8x.
- The oracle rebuilds the same projection relationally (unnest +
  sign-matrix VALUES join + grouped integer sums) — a completely
  different plan shape that must land on the same integers.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

IN_DIM = 64
OUT_DIM = 8
FX = 10000  # fixed-point quantization of embedding components


def _sign(i: int, j: int) -> int:
    """±1 from the first hex digit of md5("i:j") — stateless, exact."""
    return 1 if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) < 8 else -1


_SIGNS = [[_sign(i, j) for i in range(IN_DIM)] for j in range(OUT_DIM)]

_SIGN_VALUES_SQL = ", ".join(
    f"({i}, {j}, {_SIGNS[j][i]})" for j in range(OUT_DIM) for i in range(IN_DIM)
)


@register(
    "emb_random_projection",
    oracle=f"""
    WITH signs(i, j, s) AS (VALUES {_SIGN_VALUES_SQL}),
    idx AS (
      SELECT vec_id, embedding AS e, unnest(range(1, {IN_DIM} + 1)) AS i1
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, i1 - 1 AS i,
             CAST(floor(CAST(e[i1] AS DOUBLE) * {FX}) AS BIGINT) AS v
      FROM idx
    )
    SELECT q.vec_id, CAST(sg.j AS INTEGER) AS dim,
           CAST(sum(q.v * sg.s) AS BIGINT) AS proj_fx
    FROM q JOIN signs sg ON q.i = sg.i
    GROUP BY q.vec_id, sg.j
    """,
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project each embedding to {OUT_DIM} sign-random dimensions.

    ``aggregate(zip_with(quantized, signs_j, *), 0, +)`` per output
    dimension — the whole reduction is one codegen'd projection with no
    shuffle; output is long-format (vec_id, dim, proj_fx) for the
    value check.
    """
    emb = table(spark, sf_dir, "embeddings")
    quant = F.expr(
        f"transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE) * {FX}) AS BIGINT))"
    )
    projected = emb.select("vec_id", quant.alias("_q")).select(
        "vec_id",
        F.array(
            *[
                F.expr(
                    "aggregate(zip_with(_q, array({}), (x, s) -> x * s),"
                    " 0L, (acc, x) -> acc + x)".format(
                        ",".join(str(s) for s in _SIGNS[j])
                    )
                )
                for j in range(OUT_DIM)
            ]
        ).alias("_p"),
    )
    return projected.select("vec_id", F.posexplode("_p").alias("dim", "proj_fx"))
