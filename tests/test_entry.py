"""Driver-contract tests: Spark queries vs DuckDB oracles at sf0.001.

Mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): row count,
column set, and order-insensitive exact value equality.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Subset that exercises every operator family; the full set runs in
# tools/check_correctness.py at sf0.01.
SUBSET = [
    "ogr_like_filter",
    "ogr_summary_record",
    "ogr_first_match_join",
    "ogr_two_valued_null",
    "tile_assign_z8",
    "cell_pack_parent",
    "pip_join_pentagon",
    "knn_kring",
    "dedup_exact_prefix",
    "text_quality",
    "lang_id",
    "cosine_topk",
]


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, oracle, name):
    sdf = E.queries()[name](spark, sf_dir).toPandas()
    odf = oracle.execute(E.oracle_sql()[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf)
    a, b = _canon(sdf), _canon(odf)
    b = b.astype(a.dtypes.to_dict(), errors="ignore")
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["pid", "fid", "z", "tx", "ty"]


def test_rows_only_queries_run(spark, sf_dir):
    qs = E.queries()
    for name in ("minhash_lsh_pairs", "simhash", "raster_checksum",
                 "pages_enrich"):
        n = qs[name](spark, sf_dir).count()
        assert n >= 0
