"""Spark-4 Python UDTF surface: a lateral table function.

UDTFs are Python-row-path (the repo's parity operators deliberately
avoid them — see tests/test_plan_quality.py's no-BatchEvalPython
gates); this test exists to prove the API surface works end-to-end for
the cases where a user genuinely wants a Python table function (e.g.
calling an external tokenizer library per document). The equivalent
JVM-side chunker (chunk_token_windows) is the production path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import Row


@udtf(returnType="chunk_id: int, chunk: string")
class ChunkWords:
    """Split a string into fixed-size word chunks with overlap 2."""

    def eval(self, doc_id: int, text: str):
        words = (text or "").split()
        size, step = 8, 6
        i, cid = 0, 0
        while i < len(words):
            yield Row(chunk_id=cid, chunk=" ".join(words[i : i + size]))
            if i + size >= len(words):
                break
            i += step
            cid += 1


def test_udtf_lateral_chunking(spark, sf_dir):
    spark.udtf.register("chunk_words", ChunkWords)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    docs.createOrReplaceTempView("_udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk
        FROM _udtf_docs d, LATERAL chunk_words(d.doc_id, d.text) c
        """
    ).collect()
    assert out
    # chunks reconstruct coverage: every doc contributes chunk 0
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        ids = sorted(c.chunk_id for c in chunks)
        assert ids[0] == 0
        assert ids == list(range(len(ids)))  # contiguous
        for c in chunks:
            assert 1 <= len(c.chunk.split()) <= 8
