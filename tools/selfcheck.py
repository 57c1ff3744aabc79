#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run Verify output
against DuckDB oracles on the same parquet tables and diff values.

Type-strict: arrow schemas are compared BEFORE values. The driver's hash
canonicalization distinguishes decimal128 (DuckDB's uncast sum() output)
from int64 (Spark's long), so an oracle whose aggregate is left uncast
must FAIL here even when every value is equal — coercing ints to float
before comparing (the old behavior) masked exactly that class.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t: pa.DataType) -> str:
    """Canonical name for an arrow type, normalizing only representation
    details that carry no value semantics (string width class, timestamp
    storage unit / utc flag, list width class, integer width — the driver
    hashes int32 and int64 the same: 17 existing oracles return BIGINT
    where Spark writes int32 and all pass its gate). Integer-vs-decimal
    and integer-vs-float ARE distinguished, like the driver."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(
            f"{t.field(i).name}: {canon_type(t.field(i).type)}"
            for i in range(t.num_fields))
        return f"struct<{inner}>"
    return str(t)  # int32 / int64 / decimal128(38,0) / double stay distinct


def schema_sig(tbl: pa.Table) -> dict:
    return {f.name: canon_type(f.type) for f in tbl.schema}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_a = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
            want_a = con.sql(sql).arrow()
            g_sig, w_sig = schema_sig(got_a), schema_sig(want_a)
            if sorted(g_sig) != sorted(w_sig):
                print(f"FAIL {name}: columns {sorted(g_sig)} vs {sorted(w_sig)}")
                n_bad += 1
                continue
            type_diffs = {c: (g_sig[c], w_sig[c])
                          for c in g_sig if g_sig[c] != w_sig[c]}
            if type_diffs:
                print(f"FAIL {name}: arrow type mismatch {type_diffs}")
                n_bad += 1
                continue
            g, w = normalize(got_a.to_pandas()), normalize(want_a.to_pandas())
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_bad += 1
                continue
            eq = g.compare(w)
            if len(eq) > 0:
                print(f"FAIL {name}: {len(eq)} differing rows; first:\n{eq.head(3)}")
                n_bad += 1
                continue
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
