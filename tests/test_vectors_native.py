"""Bit-identity pins for the r14 embed_neardup_cosine rewrite.

Three representations of the same dot product must agree BITWISE on
real fixture vectors, or the query/oracle hash contract breaks:

1. the explicit left-to-right DuckDB fold (``V._dot_sql`` — the
   original oracle form),
2. DuckDB's vectorized ``list_dot_product`` over DOUBLE casts
   (``V._dot_sql_native`` — the r14 oracle form),
3. the engine's numpy dimension-ordered Gram accumulation
   (``G += col_d ⊗ col_d`` — the r14 applyInPandas kernel).

All three accumulate IEEE doubles in element order 0..dim-1 starting
from 0.0, so equality is exact, not approximate — asserted here on
every within-label pair of the sf0.001 and sf0.01 embeddings fixtures.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from flinkexp_spark.functions import vectors as V

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_native_dot_bitwise_equals_fold(sf_dir: str) -> None:
    con = duckdb.connect()
    n_pairs, n_eq = con.execute(
        f"""
        WITH e AS (SELECT vec_id, label, embedding
                   FROM read_parquet('{sf_dir}/embeddings.parquet'))
        SELECT COUNT(*),
               SUM(CASE WHEN {V._dot_sql('a.embedding', 'b.embedding')}
                             = {V._dot_sql_native('a.embedding', 'b.embedding')}
                        THEN 1 ELSE 0 END)
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        """
    ).fetchone()
    assert n_pairs > 0 and n_eq == n_pairs


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_gram_accumulation_bitwise_equals_fold(sf_dir: str) -> None:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT label, list(vec_id ORDER BY vec_id),
               list(embedding ORDER BY vec_id)
        FROM read_parquet('{sf_dir}/embeddings.parquet')
        GROUP BY label
        """
    ).fetchall()
    checked = 0
    for _, ids, embs in rows:
        A = np.asarray(embs, dtype=np.float32).astype(np.float64)
        n, dim = A.shape
        gram = np.zeros((n, n), dtype=np.float64)
        for d in range(dim):
            col = A[:, d]
            gram += col[:, None] * col[None, :]
        # the fold reference: explicit python left-to-right accumulation
        # (same op sequence as the SQL fold and the old zip_with plan)
        for i in range(0, n, max(1, n // 7)):  # spot rows, all columns
            for j in range(n):
                acc = 0.0
                for d in range(dim):
                    acc = acc + A[i, d] * A[j, d]
                assert gram[i, j] == acc  # BITWISE
                checked += 1
    assert checked > 100
