"""Generate a scale-test corpus: N× the sf0.1 `documents`/`embeddings`
tables, written as MULTI-FILE parquet so scans actually split (the sf
testdata tables are single files with ONE row group — stage 1 of every
query runs on one task there, which is why sf0.1 wall-clock stopped
distinguishing scale behavior; VERDICT r15 "what's wrong" #3).

Replicas are deterministic but NOT near-duplicates of their base row —
otherwise the dedup/CC/SemDeDup queries would measure a pathological
10-clique-per-document graph instead of scale:

- documents: replica r rotates the word order by r positions (same
  vocabulary, token count and length stats; 3-gram shingle sets and
  n-gram repetition profiles decorrelate, so MinHash/LSH does not pair
  replicas with their base);
- embeddings: replica r applies a fixed per-r dimension permutation and
  sign pattern (marginal value distribution preserved exactly; the
  cosine between a vector and its permuted/sign-flipped self is
  ~N(0, 1/sqrt(dim)) — not a near-duplicate).

Every other sf0.1 table is copied through unscaled so any registered
query can run against the output directory.

Usage: python tools/make_scale_corpus.py [out_dir] [multiplier] [files]
  defaults: /root/scale_corpus 25 32
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/scale_corpus"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    src = "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{src}/documents.parquet")
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    doc_stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    vec_stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])

    doc_parts = []
    for r in range(mult):
        words = F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != ""
        )
        if r == 0:
            text = F.col("text")
        else:
            # rotate word order by r (mod length): same words, new n-grams
            k = (F.lit(r) % F.greatest(F.size(words), F.lit(1))) + 1
            text = F.array_join(
                F.concat(
                    F.slice(words, k, F.size(words)),
                    F.slice(words, 1, k - 1),
                ),
                " ",
            )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * doc_stride)).alias("doc_id"),
                text.alias("text"),
                "source",
            )
        )
    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_docs.repartition(n_files, "doc_id").write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb_parts = []
    for r in range(mult):
        if r == 0:
            vec = F.col("embedding")
        else:
            rng = random.Random(1_000_003 * r)
            perm = list(range(dim))
            rng.shuffle(perm)
            signs = [rng.choice((-1.0, 1.0)) for _ in range(dim)]
            vec = F.array(
                *[
                    F.element_at("embedding", perm[j] + 1) * F.lit(signs[j])
                    for j in range(dim)
                ]
            )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * vec_stride)).alias("vec_id"),
                vec.alias("embedding"),
            )
        )
    out_emb = emb_parts[0]
    for p in emb_parts[1:]:
        out_emb = out_emb.unionByName(p)
    out_emb.repartition(n_files, "vec_id").write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    for name in sorted(os.listdir(src)):
        if name in ("documents.parquet", "embeddings.parquet"):
            continue
        if not name.endswith(".parquet"):
            continue
        spark.read.parquet(f"{src}/{name}").write.mode("overwrite").parquet(
            f"{out_dir}/{name}"
        )
    print(
        f"scale corpus at {out_dir}: documents x{mult} "
        f"({out_docs.count()} rows), embeddings x{mult} "
        f"({out_emb.count()} rows), {n_files} files each"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
