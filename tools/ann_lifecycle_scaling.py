"""Measure the ANN artifact lifecycle's scaling claims (SCALE.md r12/r13):

- freeze_ivf_pq re-encodes the WHOLE corpus  → expect exponent ≈ 1 in N;
- extend_ivf_pq encodes ONLY the new shard   → expect ≈ FLAT in base N
  (the FAISS ``add()`` deployment trade — the reason the artifact exists);
- ivf_pq_topk_frozen scans the probed cells' codes → with FIXED nlist the
  candidate set is ∝ N/nlist·nprobe, so expect ≈ linear at fixed nlist
  (the probe never touches raw embeddings either way);
- probe_grown_nlist re-freezes both arms with nlist=None (the √N
  auto-rule) and probes those → per-cell size is ~√N, so expect an
  exponent well BELOW the fixed-nlist probe's — the measured form of
  the "grow nlist ∝ √N to hold per-cell size" production guidance.

Protocol mirrors tools/scaling_slope.py: a K× corpus built from sf0.1's
embeddings by cyclic-shift replication (norms and geometry preserved,
cross-replica cosine decorrelated, ids remapped), the SAME fixed-size new
shard extended onto both artifacts, min-of-``reps`` per timed stage, quiet
window required. Prints one JSON line per stage pair plus exponents
(ln(t_K/t_1)/ln(K)); paste the table into SCALE.md.

Usage: python tools/ann_lifecycle_scaling.py [K] [reps]   (defaults 25 2)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1/embeddings.parquet"
WORK = "/tmp/ann_lifecycle_scaling"
SHARD_SIZE = 200  # fixed new-arrivals shard, identical for both arms


def _replicate(spark, k: int, out_path: str):
    """K× embeddings by cyclic-shift replication (scaling_slope's recipe)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(BASE)
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0]
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for r in range(k):
        e = emb
        s = (13 * r) % dim
        if s:
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), s + 1, dim - s),
                    F.slice(F.col("embedding"), 1, s),
                ),
            )
        parts.append(
            e.withColumn("vec_id", F.col("vec_id") + F.lit(r * (max_vec + 1)))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(out_path)


def _shard(spark, base_rows: int, k: int):
    """The fixed new-arrivals shard: SHARD_SIZE vectors derived from the
    base with a shift no replica uses, ids beyond BOTH arms' ranges."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(BASE).filter(F.col("vec_id") < SHARD_SIZE)
    dim = len(emb.select("embedding").first()[0])
    s = (13 * k + 7) % dim
    return emb.select(
        (F.col("vec_id") + F.lit(base_rows * (k + 10))).alias("vec_id"),
        F.concat(
            F.slice(F.col("embedding"), s + 1, dim - s),
            F.slice(F.col("embedding"), 1, s),
        ).alias("embedding"),
    ).localCheckpoint()


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from learn_hbase_spark.operators import similarity
    from learn_hbase_spark.session import get_session

    spark = get_session("ann-lifecycle-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    os.makedirs(WORK)
    scaled_path = f"{WORK}/emb_{k}x"
    _replicate(spark, k, scaled_path)

    base = spark.read.parquet(BASE)
    scaled = spark.read.parquet(scaled_path)
    n_base = base.count()
    shard = _shard(spark, n_base, k)
    import math

    results: dict[str, dict] = {}

    def timed(stage: str, arm: str, fn) -> None:
        best = min(_once(fn) for _ in range(reps))
        results.setdefault(stage, {})[arm] = best

    def _once(fn) -> float:
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    for arm, corpus in (("1x", base), ("kx", scaled)):
        art = f"{WORK}/art_{arm}"

        # freeze: full-corpus encode (re-frozen each rep — that IS the cost)
        timed("freeze", arm, lambda: similarity.freeze_ivf_pq(
            corpus, art, nlist=16, m=4, k_codes=16, src_fingerprint=arm,
        ))
        # extend: the SAME fixed shard onto each frozen artifact. Each rep
        # re-freezes first so every extend lands on a clean base (the
        # extend itself is what's timed).
        def _extend_once(corpus=corpus, art=art, arm=arm):
            similarity.freeze_ivf_pq(
                corpus, art, nlist=16, m=4, k_codes=16, src_fingerprint=arm,
            )
            t0 = time.time()
            similarity.extend_ivf_pq(shard, art, src_fingerprint=arm + "+")
            return round(time.time() - t0, 3)

        results.setdefault("extend", {})[arm] = min(
            _extend_once() for _ in range(reps)
        )
        # probe: 10 queries, k=50, raw corpus untouched
        q = base.filter(F.col("vec_id") < 10)
        timed("probe", arm, lambda: similarity.ivf_pq_topk_frozen(
            q, art, nprobe=4, k=50,
        ).write.mode("overwrite").format("noop").save())

        # probe under GROWN nlist: freeze with the √N auto-rule (once —
        # the freeze cost is already measured above) and time the probe.
        # Same nprobe, so the scan is nprobe cells of ~√N rows instead
        # of nprobe cells of N/16 rows.
        art_auto = f"{WORK}/art_auto_{arm}"
        similarity.freeze_ivf_pq(
            corpus, art_auto, nlist=None, m=4, k_codes=16,
            src_fingerprint=arm,
        )
        resolved = int(similarity.ivf_pq_meta(spark, art_auto)["nlist"])
        results.setdefault("probe_grown_nlist", {})[f"nlist_{arm}"] = resolved
        timed("probe_grown_nlist", arm, lambda: similarity.ivf_pq_topk_frozen(
            q, art_auto, nprobe=4, k=50,
        ).write.mode("overwrite").format("noop").save())

    print(json.dumps({
        "k": k, "reps": reps, "n_base": n_base, "shard": SHARD_SIZE,
        "stages": {
            stage: {
                **arms,
                "exponent": round(
                    math.log(max(arms["kx"], 1e-9) / max(arms["1x"], 1e-9))
                    / math.log(k), 3,
                ),
            }
            for stage, arms in results.items()
        },
    }))
    shutil.rmtree(WORK, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
