"""Local replica of the driver's Spark-vs-DuckDB comparison: row count +
column-name set + order-insensitive value hash (columns sorted by name)."""

from __future__ import annotations

import datetime
import hashlib
import math


def _norm(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # queries round explicitly; this only canonicalizes repr noise
        return format(v, ".9g")
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


def spark_canon(df):
    return canon([tuple(r) for r in df.collect()], df.columns)


def duck_canon(con, sql):
    cur = con.execute(sql)
    cols = [c[0] for c in cur.description]
    return canon(cur.fetchall(), cols)


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
