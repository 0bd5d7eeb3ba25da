"""Two-parallelism-level scaling evidence for the ingest-time LSH
index (operators/neardup_index.py) — the round-5 addition whose whole
reason to exist is corpus-scale ingest.

Same convention as scaling_bench.py: the SAME job (a deterministic
synthetic corpus drained through NearDupIndex in two batches) runs
pinned via taskset at N and 4N cores; efficiency = tput(4N) /
(4 * tput(N)), host-probe-bracketed so a throttled window is visible.

The corpus is synthesized ENGINE-SIDE from the id range (no driver
data, no files): token i of doc d indexes a seeded vocabulary by an
md5-derived value, and every 10th doc clones its predecessor's text
plus a small suffix so ~10% of docs are true near-dups for the index
to catch — the drain has real drop work to do, not a no-op scan.

Usage:
  python scripts/neardup_scaling.py                # full campaign
  python scripts/neardup_scaling.py --worker --cpus 8 --docs 60000
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB_SIZE = 4096
TOKENS_PER_DOC = 48


def synth_corpus(spark, n_docs: int):
    """Deterministic (doc_id, text) corpus, generated in the engine."""
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(f"w{i:04d}") for i in range(VOCAB_SIZE)])
    # base id: every 10th doc reuses its predecessor's token stream
    base = F.when(F.col("id") % 10 == 9, F.col("id") - 1).otherwise(F.col("id"))
    tok = lambda i: F.element_at(  # noqa: E731
        vocab,
        (F.pmod(F.conv(F.substring(
            F.md5(F.concat(base.cast("string"), F.lit(":"), i.cast("string"))),
            1, 6), 16, 10).cast("long"), F.lit(VOCAB_SIZE)) + 1).cast("int"))
    words = F.transform(F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)), tok)
    text = F.concat_ws(" ", words)
    text = F.when(F.col("id") % 10 == 9,
                  F.concat(text, F.lit(" extra tail"))).otherwise(text)
    return (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"), text.alias("text")))


def worker(cpus: int, n_docs: int) -> None:
    from arcane_stream_sqlserver_change_tracking_spark.operators.neardup_index import (
        NearDupIndex,
    )
    from arcane_stream_sqlserver_change_tracking_spark.session import build_session

    import shutil

    spark = build_session(cpus=cpus)
    docs = synth_corpus(spark, n_docs)
    docs.count()  # materialize plan warmup outside the timed window
    root = tempfile.mkdtemp(prefix="ndscale_")
    try:
        idx = NearDupIndex(root, num_perms=16, num_bands=4,
                           threshold=0.5, buckets=32)
        t0 = time.monotonic()
        kept = 0
        half = n_docs // 2
        for i, (lo, hi) in enumerate([(0, half - 1), (half, n_docs - 1)]):
            batch = docs.where((docs.doc_id >= lo) & (docs.doc_id <= hi))
            kept += idx.filter_batch(batch, f"b{i}").count()
        dt = time.monotonic() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"cpus": cpus, "docs": n_docs, "kept": kept,
                      "seconds": round(dt, 2),
                      "docs_per_sec": round(n_docs / dt, 1)}))
    spark.stop()


def run_level(cpus: int, n_docs: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.abspath(__file__), "--worker", "--cpus", str(cpus),
           "--docs", str(n_docs)]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def probe() -> float:
    out = subprocess.run([sys.executable,
                          os.path.join(REPO, "scripts", "host_probe.py"),
                          "calib"], capture_output=True, text=True,
                         check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line).get("calib", 0.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--docs", type=int, default=60000)
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus, args.docs)
        return
    # 2 -> 8 cores, the campaign's levels: BOTH runs stay far from
    # the 32-core host's capacity so auxiliary JVM threads (GC,
    # shuffle IO, Python workers) don't starve the hi level — the
    # same reason scaling_bench.py defaults to local[2] vs local[8].
    p0 = probe()
    lo = run_level(2, args.docs)
    hi = run_level(8, args.docs)
    p1 = probe()
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    print(json.dumps({"check": "neardup_ingest_scaling",
                      "lo": lo, "hi": hi,
                      "efficiency_2_to_8": round(eff, 3),
                      "probe_before": p0, "probe_after": p1}))


if __name__ == "__main__":
    main()
