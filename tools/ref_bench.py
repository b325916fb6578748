#!/usr/bin/env python3
"""Benchmark the reference (msoedov/vector_lake) on the driver testdata
embeddings, for a like-for-like throughput comparison with the Spark
engine (see BENCHNOTES.md). The reference's sklearn import feeds only
dead code (SURVEY.md §2.5), so it is stubbed.

Usage: python3 tools/ref_bench.py [sfDir] [n_queries]
"""
import sys, time, types, tempfile, json

fake = types.ModuleType("sklearn")
fake_m = types.ModuleType("sklearn.metrics")
fake_p = types.ModuleType("sklearn.metrics.pairwise")
fake_p.cosine_similarity = lambda *a, **k: None
sys.modules.update({"sklearn": fake, "sklearn.metrics": fake_m,
                    "sklearn.metrics.pairwise": fake_p})
sys.path.insert(0, "/root/reference")

import duckdb  # noqa: E402
from vector_lake import VectorLake  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 10

rows = duckdb.sql(
    f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
).fetchall()
vecs = [r[1] for r in rows]
print(f"loaded {len(vecs)} x {len(vecs[0])} embeddings from {sf_dir}")

loc = tempfile.mkdtemp(prefix="ref_lake_")
lake = VectorLake(location=loc, dimension=64, approx_shards=243)

t0 = time.time()
for i, v in enumerate(vecs):
    lake.add(v, {"id": str(i)}, f"doc-{i}")
t_add = time.time() - t0

t0 = time.time()
lake.persist()
t_persist = time.time() - t0

# reference query path: routed-shard probe, k=10 (cold: lazy re-load per
# first touch of each shard already done during add)
t0 = time.time()
for q in vecs[:n_queries]:
    lake.query(q, n_results=10)
t_query = time.time() - t0

out = {"impl": "reference", "sf": sf_dir, "rows": len(vecs),
       "ingest_sec": round(t_add, 3), "persist_sec": round(t_persist, 3),
       f"query_x{n_queries}_sec": round(t_query, 3),
       "queries_per_sec": round(n_queries / t_query, 1) if t_query else None}
print(json.dumps(out))
