import duckdb
import pytest

from recon_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="recon_spark_tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


def register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def normalize(rows, ndigits: int = 6):
    """Order-insensitive, column-name-sorted canonical form (mirrors the
    driver's value-hash comparison)."""
    out = []
    for row in rows:
        items = sorted(row.items())
        vals = []
        for _, v in items:
            if isinstance(v, float):
                v = round(v, ndigits)
                if v == -0.0:
                    v = 0.0
            if v is not None and repr(v) == "NaT":  # pandas NULL timestamp
                v = None
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda r: tuple(str(x) for x in r))
    return out


def compare_query(spark, con, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    srows = [r.asDict() for r in sdf.collect()]
    register_views(con, sf_dir)
    odf = con.sql(sql).df()
    orows = odf.to_dict("records")
    s_cols = sorted(sdf.columns)
    o_cols = sorted(odf.columns)
    assert s_cols == o_cols, f"column mismatch: spark={s_cols} oracle={o_cols}"
    sn, on = normalize(srows), normalize(orows)
    assert len(sn) == len(on), f"row count: spark={len(sn)} oracle={len(on)}"
    mismatches = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b]
    assert not mismatches, (
        f"value mismatch at rows {mismatches[:5]} of {len(sn)}: "
        f"spark={[sn[i] for i in mismatches[:3]]} oracle={[on[i] for i in mismatches[:3]]}"
    )
