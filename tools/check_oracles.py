"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, order-insensitive values (exact string compare after
canonical float repr) AND Arrow value types. The Arrow-type check is what
the round-1 version lacked: the driver hashes through Arrow, where a DuckDB
``SUM(int)`` surfaces as decimal128(38,0) while Spark emits int64 — string
compare alone calls that a match, the driver does not. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb


def arrow_type_canon(t) -> str:
    """Canonical Arrow type name, normalizing representation-only variants
    (large_string vs string, large_list vs list) that hash identically."""
    import pyarrow as pa

    if t in (pa.large_string(), pa.string()):
        return "string"
    if t in (pa.large_binary(), pa.binary()):
        return "binary"
    if isinstance(t, (pa.LargeListType, pa.ListType)):
        return f"list<{arrow_type_canon(t.value_type)}>"
    if isinstance(t, pa.TimestampType):
        return f"timestamp[tz={t.tz}]"
    return str(t)


def arrow_schema_by_name(tab) -> dict[str, str]:
    return {f.name: arrow_type_canon(f.type) for f in tab.schema}

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    return str(v)


def rows_to_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            sp_cols = df.columns
            sp_tab = df.toArrow()
            sp_rows = [tuple(r.values()) for r in sp_tab.to_pylist()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sp_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            du_tab = res.fetch_arrow_table()
            du_cols = du_tab.column_names
            du_rows = [tuple(r.values()) for r in du_tab.to_pylist()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(sp_cols) != sorted(du_cols):
            problems.append(f"cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
        else:
            sp_types = arrow_schema_by_name(sp_tab)
            du_types = arrow_schema_by_name(du_tab)
            tdiff = {c: (sp_types[c], du_types[c]) for c in sp_types
                     if sp_types[c] != du_types[c]}
            if tdiff:
                problems.append(f"arrow types differ: {tdiff}")
        if len(sp_rows) != len(du_rows):
            problems.append(f"rowcount spark={len(sp_rows)} duck={len(du_rows)}")
        if not problems:
            a = rows_to_multiset(sp_rows, sp_cols)
            b = rows_to_multiset(du_rows, du_cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(sp_rows)} rows, exact match")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
