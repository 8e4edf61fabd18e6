"""Python user-defined TABLE functions (Spark 3.5+/4.x UDTF surface) —
the row→rows extension point, completing the Python API coverage next
to the custom DataSource (sources/pydatasource.py) and the GROUPED_AGG
UDAF (functions/udafs.py).

The demo operator is RAG-style document chunking: each document
explodes into fixed-size token chunks with a portable md5 chunk hash.
Chunking IS expressible natively (transform over sequence — that is
exactly how dedup/substring.py enumerates windows), so the UDTF here
is API-surface coverage like a14_udaf_mode, not the recommended hot
path; the docstring of the query says the same. ``useArrow=True``
keeps the transfer Arrow-batched.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


@udtf(
    returnType="doc_id bigint, chunk_ix int, n_tokens int, chunk_hash string",
    useArrow=True,
)
class ChunkText:
    """Yield ~CHUNK-token chunks of the whitespace-tokenized document
    (last chunk ragged). Token normalization matches text/analysis
    tokens(): trim + lowercase + split on whitespace runs."""

    CHUNK = 50

    def eval(self, doc_id: int, text: str):  # noqa: D102
        toks = (text or "").strip().lower().split()
        if not toks:
            return
        for ix in range(0, len(toks), self.CHUNK):
            chunk = toks[ix : ix + self.CHUNK]
            h = hashlib.md5(" ".join(chunk).encode("utf-8")).hexdigest()
            yield doc_id, ix // self.CHUNK, len(chunk), h


def register_udtfs(spark) -> None:
    spark.udtf.register("chunk_text", ChunkText)
