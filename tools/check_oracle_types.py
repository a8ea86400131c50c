#!/usr/bin/env python3
"""Oracle result-type fence.

Binds every oracle query in DuckDB (plan only, nothing executes) over
the sf tables and fails if any result column's type is outside what
Spark can emit through parquet. This catches DuckDB's silent integer
widening — e.g. sum(BIGINT) -> HUGEINT — which the driver's
type-sensitive row hash mismatches even when every value is identical
(the round-9 quality_model_score defect class).

Usage: python3 tools/check_oracle_types.py <sfDir> <oracle_sql.json>

Prints one line per offending (query, column, type) and a final
ALL_TYPES_OK / TYPE_VIOLATIONS=<n> summary; exit code 1 on violations.
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types DuckDB can produce that Spark cannot emit (or that the driver's
# hasher stringifies differently than Spark's closest type).
BANNED = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
          "UTINYINT", "UUID", "BIT", "INTERVAL", "TIME")


def banned(t: str) -> bool:
    # \b-anchored whole-token match, so TIME never trips on TIMESTAMP
    # and types nested in LIST/STRUCT compositions are still caught
    import re
    up = t.upper()
    return any(re.search(rf"\b{b}\b", up) for b in BANNED)


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        if t == "events":
            typ = con.sql(f"SELECT typeof(ts) FROM '{p}' LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM '{p}'")
                continue
        con.sql(f"CREATE VIEW {t} AS FROM '{p}'")
    oracles = json.load(open(oracle_path))
    violations = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)  # lazy relation: binds + plans only
            cols = rel.columns
            types = [str(t) for t in rel.types]
        except Exception as e:
            print(f"{name}  BIND_ERROR: {str(e)[:200]}")
            violations += 1
            continue
        for c, t in zip(cols, types):
            if banned(t):
                print(f"{name}  column={c} type={t}")
                violations += 1
    if violations:
        print(f"TYPE_VIOLATIONS={violations}")
        sys.exit(1)
    print(f"ALL_TYPES_OK n={len(oracles)}")


if __name__ == "__main__":
    main()
