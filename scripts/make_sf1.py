#!/usr/bin/env python3
"""Build a 10x scale-up of /root/testdata/sf0.1 at /tmp/sf1 (dev-side
evidence for the BENCH ratio-vs-SF trend, VERDICT r2 item 7).

Fact tables are replicated 10x with keys shifted per copy so join
selectivities and group cardinalities scale the way a real sf1 would:
  - lineitem/orders/customer/supplier/part: all FK chains shifted
    together (each copy is a self-contained TPC-H-ish universe).
  - events: event_id and user_id shifted (sessions/windows stay
    copy-local; the ts distribution is untouched).
  - documents: doc_id shifted AND every token suffixed with the copy
    tag, so the near-dup structure is preserved per copy instead of
    every doc gaining 9 identical cross-copy twins (which would
    quadratically explode candidate pairs in a way no real corpus
    scale-up does).
  - embeddings: vec_id shifted; each copy's embedding matrix gets an
    independent per-column shuffle (preserves every component's
    marginal distribution, destroys cross-copy duplicates).
Dims (region/nation) are copied once, as in TPC-H SF scaling.
"""
import duckdb, numpy as np, pyarrow as pa, pyarrow.parquet as pq, os, sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 10**9
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def rep(table, sql_tpl):
    parts = [sql_tpl.format(src=f"'{SRC}/{table}.parquet'", k=i * SHIFT, i=i)
             for i in range(COPIES)]
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"[sf1] {table}: {n} rows")

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"[sf1] {t}: copied")

rep("customer", "SELECT c_custkey + {k} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src}")
rep("supplier", "SELECT s_suppkey + {k} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM {src}")
rep("part", "SELECT p_partkey + {k} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM {src}")
rep("orders", "SELECT o_orderkey + {k} AS o_orderkey, o_custkey + {k} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM {src}")
rep("lineitem", "SELECT l_orderkey + {k} AS l_orderkey, l_partkey + {k} AS l_partkey, "
    "l_suppkey + {k} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
    "l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src}")
rep("events", "SELECT event_id + {k} AS event_id, ts, user_id + {k} AS user_id, "
    "event_type, value, props FROM {src}")
rep("documents", "SELECT doc_id + {k} AS doc_id, "
    "CASE WHEN {i} = 0 THEN text ELSE regexp_replace(text, '(\\S+)', '\\1c{i}', 'g') END AS text, "
    "lang, source, n_chars FROM {src}")

# embeddings: numpy column shuffle per copy (keeps float32 + list type)
t = pq.read_table(f"{SRC}/embeddings.parquet")
vec = np.array(t.column("embedding").to_pylist(), dtype=np.float32)  # (n, d)
lab = t.column("label").to_numpy()
vid = t.column("vec_id").to_numpy()
chunks = []
for i in range(COPIES):
    m = vec.copy()
    if i > 0:
        rng = np.random.RandomState(1234 + i)
        for j in range(m.shape[1]):
            m[:, j] = m[rng.permutation(m.shape[0]), j]
    chunks.append(pa.table({
        "vec_id": pa.array(vid + i * SHIFT, type=pa.int64()),
        "embedding": pa.array([row for row in m.tolist()], type=pa.list_(pa.float32())),
        "label": pa.array(lab, type=pa.int32()),
    }))
pq.write_table(pa.concat_tables(chunks), f"{DST}/embeddings.parquet")
print(f"[sf1] embeddings: {COPIES * len(vid)} rows")

# duckdb COPY coerces timestamps to [us]; restore the source physical
# types (events are TIMESTAMP(NANOS), dates TIMESTAMP(MILLIS)) so the
# engine reads sf1 exactly like sf0.1
def recast(table, casts):
    path = f"{DST}/{table}.parquet"
    t = pq.read_table(path)
    t = t.cast(pa.schema([(n, casts.get(n, t.schema.field(n).type))
                          for n in t.schema.names]))
    pq.write_table(t, path, version="2.6")
recast("events", {"ts": pa.timestamp("ns")})
recast("lineitem", {"l_shipdate": pa.timestamp("ms")})
recast("orders", {"o_orderdate": pa.timestamp("ms")})
print("[sf1] done ->", DST)
