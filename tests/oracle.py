"""Local replica of the driver's Spark-vs-DuckDB comparison: row count +
column-name set + order-insensitive value hash (columns sorted by name).

Driver-faithful canonicalization: the driver round-trips both result sets
through pandas and stringifies, so a BIGINT 8 ("8") and a HUGEINT/float 8.0
("8.0") MUST hash differently here too — round-1 used a ".9g" float format
that rendered them identically and masked exactly that class of bug
(VERDICT round 1, "What's wrong" #3). `str(v)` preserves the int-vs-float
distinction the way pandas stringification does."""

from __future__ import annotations

import datetime
import hashlib
import math


import numpy as np


def _norm(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, (bool, np.bool_)):
        return "1" if v else "0"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "nan"
        # driver-faithful: str keeps the float-ness visible ("8.0" != "8");
        # queries round explicitly so there is no repr noise to hide
        return str(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def canon(rows, colnames) -> tuple[int, tuple, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), tuple(sorted(c.lower() for c in colnames)), h


def _pandas_rows(pdf):
    return list(pdf.itertuples(index=False, name=None))


def spark_canon(df):
    # driver-faithful: the driver compares through pandas, where a Spark
    # BIGINT lands as int64 and a DuckDB HUGEINT as float64 — collect()
    # would hide that dtype distinction
    pdf = df.toPandas()
    return canon(_pandas_rows(pdf), list(pdf.columns))


def duck_canon(con, sql):
    pdf = con.execute(sql).df()
    return canon(_pandas_rows(pdf), list(pdf.columns))


def assert_parity(spark_df, duck_con, oracle_sql, name=""):
    sn, sc, sh = spark_canon(spark_df)
    dn, dc, dh = duck_canon(duck_con, oracle_sql)
    assert sn == dn, f"{name}: row count spark={sn} duck={dn}"
    assert sc == dc, f"{name}: columns spark={sc} duck={dc}"
    if sh != dh:
        # dump a small diff for debugging
        srows = {tuple(r) for r in spark_df.collect()}
        cur = duck_con.execute(oracle_sql)
        drows = set(cur.fetchall())
        only_s = list(srows - drows)[:5]
        only_d = list(drows - srows)[:5]
        raise AssertionError(
            f"{name}: value hash mismatch\n only-spark={only_s}\n only-duck={only_d}"
        )
