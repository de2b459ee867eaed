#!/usr/bin/env python
"""A/B: composed vs materialized E7 curation (round-8 verdict item 6).

The headline ``q_e7_curation_minhash`` composes quality gate -> exact
dedup -> banded-LSH near-dup in ONE plan; its documented cost is the
quality scan re-deriving per consumer. The materialized form writes
each stage through the versioned-table layer and the next stage reads
it back — paying a corpus-sized text write at stage 1 to never re-scan
raw documents. This script times both at a given SF dir and prints one
JSON line; run it on a QUIET machine (no other JVM — see the verify
skill's timing hygiene note) at .scratch/sf1 and .scratch/sf10.

Usage::

    python scripts/ab_curation.py [sf_dir] [--runs 2]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opcua_ingestion_engine_spark import catalog as C  # noqa: E402
from opcua_ingestion_engine_spark.operators import tablefmt as TF  # noqa: E402
from opcua_ingestion_engine_spark.operators.curate import (  # noqa: E402
    _quality_stage,
)
from opcua_ingestion_engine_spark.operators.dedup import (  # noqa: E402
    minhash_neardup_pairs,
)
from opcua_ingestion_engine_spark.session import get_spark  # noqa: E402


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def composed(spark, sf_dir: str) -> float:
    from opcua_ingestion_engine_spark.operators.curate import curate_corpus

    docs = C.load_table(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    _materialize(curate_corpus(docs, candidates="minhash"))
    return time.perf_counter() - t0


def materialized(spark, sf_dir: str, workdir: str) -> float:
    """Each stage committed through the table layer, next stage reads
    it back: stage1 = gated docs WITH text (the corpus-sized write the
    composed form avoids), stage2 = exact-dedup representatives,
    stage3 = the final kept set."""
    docs = C.load_table(spark, sf_dir, "documents")
    roots = {k: os.path.join(workdir, k) for k in ("s1", "s2", "s3")}
    t0 = time.perf_counter()
    s1 = _quality_stage(docs, "text", "rules", None)
    TF.commit_version(s1, roots["s1"])
    s1m = TF.read_version(spark, roots["s1"])
    reps = (
        s1m.groupBy(F.sha2(F.col("text"), 256).alias("digest"))
        .agg(F.min(F.struct("doc_id", "lang", "n_tokens")).alias("r"))
        .select("r.doc_id", "r.lang", "r.n_tokens")
    )
    TF.commit_version(reps, roots["s2"])
    repsm = TF.read_version(spark, roots["s2"])
    # survivors' text comes from the STAGE-1 TABLE, not a raw re-scan
    survivors = s1m.join(
        repsm.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id", "text")
    pairs = minhash_neardup_pairs(survivors, text_col="text", threshold=0.5)
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    final = repsm.join(drop, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_tokens"
    )
    TF.commit_version(final, roots["s3"])
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = 2
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("ab_curation")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM + codegen (timing hygiene per the verify skill)
    C.load_table(spark, sf_dir, "documents").count()
    out = {"sf_dir": sf_dir, "composed": [], "materialized": []}
    for _ in range(runs):
        out["composed"].append(round(composed(spark, sf_dir), 3))
        wd = tempfile.mkdtemp(prefix="ab_curation_")
        try:
            out["materialized"].append(
                round(materialized(spark, sf_dir, wd), 3)
            )
        finally:
            shutil.rmtree(wd, ignore_errors=True)
    out["composed_best"] = min(out["composed"])
    out["materialized_best"] = min(out["materialized"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
