"""Planted-extreme engine-parity tests for the DECIMAL(38,0)/HUGEINT
power-sum accumulators (the round-6 q295 sweep).

Each test writes rows whose squared terms sum PAST int64 (so a plain
BIGINT sum would silently wrap — the q295 defect) and asserts the Spark
plan still matches its DuckDB oracle value-for-value, i.e. both engines
route the second moments through wide integers.
"""

import duckdb
import pytest

import __spark_entry__ as entry


def _oracle_df(sql: str, tmp_path, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    return con.execute(sql).fetchdf()


def _assert_parity(spark_df, oracle_pdf):
    got = spark_df.toPandas()
    assert list(got.columns) == list(oracle_pdf.columns)
    assert len(got) == len(oracle_pdf)
    for col in got.columns:
        for a, b in zip(got[col].tolist(), oracle_pdf[col].tolist()):
            assert str(a) == str(b), f"{col}: spark={a!r} oracle={b!r}"


@pytest.fixture(scope="module")
def qs():
    return entry.queries()


@pytest.fixture(scope="module")
def oracles():
    return entry.oracle_sql()


def test_q295_squared_cents_survive_int64(spark, tmp_path, qs, oracles):
    """30 events of ~3.5e7 value → cents² ≈ 1.2e19 each: the per-arm
    Σcents² passes int64 after two rows; a BIGINT accumulator wraps
    and the Welch z goes garbage. 30 users make every one of the 20
    md5 salts have both arms nonempty with overwhelming probability."""
    from datetime import datetime

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    t = datetime(2024, 1, 1)
    rows = [
        (i, t, i, "t", 3.5e7 + i * 101.0, "{}") for i in range(30)
    ]
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = qs["q295_aa_test_audit"](spark, str(tmp_path))
    ora = _oracle_df(oracles["q295_aa_test_audit"], tmp_path, ["events"])
    assert len(ora) == 20
    # every z must be finite — a wrapped accumulator yields NaN/huge z
    for z in ora["z_welch"].tolist():
        assert abs(z) < 50
    _assert_parity(out, ora)


def test_q269_pair_counts_and_moments_survive_int64(
    spark, tmp_path, qs, oracles
):
    """Docs with n_chars ≈ 4e9 → v² ≈ 1.6e19 > int64: Σv² wraps a
    BIGINT after one row. The pair counts gt/lt/ties are tiny here but
    ride the same DECIMAL(38,0)/HUGEINT path and string emission."""
    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    # spread ~1e6 keeps the double-precision variance chain well above
    # the ~s²·2⁻⁵² cancellation noise while every v² still tops int64
    rows = [
        (1, "a", "en", "src0", 4_000_000_000),
        (2, "b", "en", "src0", 4_001_000_000),
        (3, "c", "en", "src0", 4_002_000_000),
        (4, "d", "en", "src1", 3_998_500_000),
        (5, "e", "en", "src1", 4_001_000_000),
        (6, "f", "en", "src1", 4_003_000_000),
    ]
    spark.createDataFrame(rows, SCHEMAS["documents"]).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = qs["q269_effect_sizes"](spark, str(tmp_path))
    ora = _oracle_df(oracles["q269_effect_sizes"], tmp_path, ["documents"])
    r = ora.iloc[0]
    # hand-checked concordance on the planted values:
    # src0 = {0, 7, 14}+4e9, src1 = {-10, 7, 21}+4e9 (offsets)
    # pairs (x>y): 0>-10, 7>-10, 14>-10, 14>7 → gt=4; ties: (7,7) → 1
    assert (r["gt"], r["ties"], r["lt"]) == ("4", "1", "4")
    _assert_parity(out, ora)


def test_q286_cuped_moments_survive_int64(spark, tmp_path, qs, oracles):
    """Two users × two halves with ~3.5e9-cent spends: Σpre² ≈ 1.2e19
    per row passes int64 immediately; theta/rho_sq stay exact."""
    from datetime import datetime

    from airflow_spotify_etl_spark.sources.files import SCHEMAS

    rows = []
    eid = 0
    for u, (a, b) in enumerate([(3.5e7, 3.6e7), (3.7e7, 3.4e7),
                                (3.3e7, 3.8e7)]):
        rows.append((eid, datetime(2024, 1, 1), u, "t", a, "{}"))
        eid += 1
        rows.append((eid, datetime(2024, 12, 31), u, "t", b, "{}"))
        eid += 1
    spark.createDataFrame(rows, SCHEMAS["events"]).write.parquet(
        str(tmp_path / "events.parquet")
    )
    out = qs["q286_cuped_adjustment"](spark, str(tmp_path))
    ora = _oracle_df(oracles["q286_cuped_adjustment"], tmp_path, ["events"])
    assert int(ora.iloc[0]["n_users"]) == 3
    _assert_parity(out, ora)
