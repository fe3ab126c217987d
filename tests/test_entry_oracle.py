"""T3: the driver-contract gate, reproduced locally — every oracle-checked
``queries()`` entry is run through Spark AND its ``oracle_sql()`` through
DuckDB at sf0.01 (the driver's scale), then compared row-for-row after
sorting columns by name (the driver's canonicalization). There are no
rows-only queries — a dedicated test pins that every entry has an oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


ORACLE_NAMES = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLE_NAMES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    qs = entrymod.queries()
    spark_pdf = _canon(qs[name](spark, SF).toPandas())
    duck_pdf = _canon(duck.sql(entrymod.oracle_sql()[name]).df())
    assert list(spark_pdf.columns) == list(duck_pdf.columns), "column names differ"
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    for col in spark_pdf.columns:
        s, d = spark_pdf[col], duck_pdf[col]
        # dtype-strict: the driver's value hash is representation-sensitive
        # (DuckDB HUGEINT surfacing as float64 made 123.0 "equal" 123 here in
        # r1 while the driver hash-mismatched) — identical kinds required
        assert s.dtype.kind == d.dtype.kind, (
            f"column {col}: dtype kind {s.dtype} (spark) vs {d.dtype} (oracle)"
        )
        if s.dtype.kind == "f" or d.dtype.kind == "f":
            assert np.allclose(
                s.to_numpy(np.float64), d.to_numpy(np.float64), rtol=0, atol=0
            ), f"float column {col} differs (bit-exactness expected)"
        else:
            same = s.astype(str).to_numpy() == d.astype(str).to_numpy()
            assert same.all(), f"column {col}: first diff at row {int(np.argmin(same))}"


def test_every_query_is_oracle_checked():
    # No rows-only entries: every queries() key carries a DuckDB oracle, so
    # the driver's strongest (hash-match) gate applies to the whole surface.
    # (If a genuinely non-SQL-expressible query ever lands, this assert is
    # the deliberate speed bump: replace it with a determinism smoke test
    # for the rows-only set, as earlier rounds had.)
    assert not ROWS_ONLY


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "cluster_id"]
