"""Timed micro-bench for the streaming operators (r13 — VERDICT r12
item 7: the only operator family with zero perf evidence).

Methodology mirrors ``bench.py``'s contract: data from
``$SPARK_GRAFT_SF_DIR`` (default sf0.1), ``local[$SPARK_GRAFT_CPUS]``,
one JSON line on stdout
``{"metric": "streaming_ops_total_wall", "value": N, "unit": "sec",
"queries": {op: sec}, "sf": ...}`` plus a ``STREAM_BENCH.json``
sidecar. Each operator replays the same chunked parquet snapshot as a
file-source stream (``maxFilesPerTrigger=1`` → ``N_CHUNKS``
micro-batches — the state store, watermark advance, and
per-micro-batch planning are all inside the timed region) and runs to
completion with ``trigger(availableNow=True)`` into a ``noop`` sink
(guide §1.4) or its own ``foreachBatch`` sink. Wall time is
start→awaitTermination per op, best of ``SPARK_GRAFT_BENCH_REPS``
(default 2) with fresh checkpoint/output dirs per rep — a stream is
never measured against its own prior state.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tafra_spark import get_spark
from tafra_spark.streaming import ops

N_CHUNKS = 8

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, "
    "n_chars long, ingest_ts timestamp"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    spark = get_spark(app_name="tafra_spark_stream_bench")
    work = tempfile.mkdtemp(prefix="tafra_stream_bench_")

    # chunked replay snapshots: N_CHUNKS files -> N_CHUNKS micro-batches
    events_src = f"{work}/events_src"
    docs_src = f"{work}/docs_src"
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(
        N_CHUNKS
    ).write.mode("overwrite").parquet(events_src)
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "ingest_ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")),
        )
        .repartition(N_CHUNKS)
        .write.mode("overwrite")
        .parquet(docs_src)
    )

    def ev_stream():
        return (
            spark.readStream.schema(ops.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_src)
        )

    def docs_stream():
        return (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(docs_src)
        )

    def run(df, mode: str, ckpt: str) -> None:
        q = (
            df.writeStream.format("noop")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def run_feb(src, fn, ckpt: str) -> None:
        q = (
            src.writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # each case: name -> callable(tmp_dir) executing the full stream
    def c_windowed(d):
        run(ops.windowed_counts(ev_stream()), "append", f"{d}/ck")

    def c_dedup(d):
        run(ops.dedup_stream(ev_stream()), "append", f"{d}/ck")

    def c_sessionize(d):
        run(ops.sessionize_stateful(ev_stream()), "append", f"{d}/ck")

    def c_interval_join(d):
        run(
            ops.interval_join(ev_stream(), ev_stream()),
            "append",
            f"{d}/ck",
        )

    def c_corpus_gate(d):
        run(ops.corpus_gate_stream(docs_stream()), "append", f"{d}/ck")

    def c_ledger_dedup(d):
        run_feb(
            docs_stream(),
            ops.ledger_dedup_sink(f"{d}/out", f"{d}/ledger"),
            f"{d}/ck",
        )

    def c_fuzzy_ledger(d):
        run_feb(
            docs_stream(),
            ops.fuzzy_ledger_dedup_sink(f"{d}/out", f"{d}/ledger"),
            f"{d}/ck",
        )

    def c_countmin(d):
        run_feb(
            ev_stream(),
            ops.countmin_ledger_sink(f"{d}/sketch", "event_type"),
            f"{d}/ck",
        )

    def c_quality_monitor(d):
        rules = [
            {"rule": "not_null", "col": "event_id"},
            {"rule": "unique", "col": "event_id"},
        ]
        run_feb(
            ev_stream(),
            ops.quality_monitor_sink(f"{d}/report", rules),
            f"{d}/ck",
        )

    def c_k_anonymity(d):
        run_feb(
            ev_stream(),
            ops.k_anonymity_monitor_sink(f"{d}/report", ["event_type"]),
            f"{d}/ck",
        )

    def c_scd2_dim(d):
        run_feb(
            ev_stream(),
            ops.scd2_dim_sink(
                spark,
                f"{d}/dim",
                keys=["user_id"],
                tracked=["event_type", "value"],
                effective_col="ts",
            ),
            f"{d}/ck",
        )

    cases = [
        ("windowed_counts_stream", c_windowed),
        ("dedup_stream", c_dedup),
        ("sessionize_stateful_stream", c_sessionize),
        ("interval_join_stream", c_interval_join),
        ("corpus_gate_stream", c_corpus_gate),
        ("ledger_dedup_sink", c_ledger_dedup),
        ("fuzzy_ledger_dedup_sink", c_fuzzy_ledger),
        ("countmin_ledger_sink", c_countmin),
        ("quality_monitor_sink", c_quality_monitor),
        ("k_anonymity_monitor_sink", c_k_anonymity),
        ("scd2_dim_sink", c_scd2_dim),
    ]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in cases:
        spark.sparkContext.setJobDescription(f"stream bench: {name}")
        best = float("inf")
        try:
            for rep in range(reps):
                d = f"{work}/{name}_{rep}"
                os.makedirs(d, exist_ok=True)
                t0 = time.time()
                fn(d)
                best = min(best, time.time() - t0)
        except Exception as exc:  # noqa: BLE001 - report-and-continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    shutil.rmtree(work, ignore_errors=True)

    out = {
        "metric": "streaming_ops_total_wall",
        "value": round(sum(timings.values()), 3) if not errors else None,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": reps,
        "n_chunks": N_CHUNKS,
        "n_measured": len(timings),
    }
    if errors:
        out["errors"] = errors
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "STREAM_BENCH.json",
        ),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
