"""spark-submit entry point.

    spark-submit --py-files rpv2spark.zip -m redpajama_v2_processing_spark.cli ...

Subcommands:
  generate  --out DIR --rows N [--seed S]        write a synthetic pages table
  run       --input DIR --warehouse DIR [--no-resume] [--stages a,b,c]
  stream    --input DIR --warehouse DIR          availableNow streaming label pass

Replaces the reference's SLURM job constructors
(src/fuzzy_dedup_job_constructor*.py, scripts/*_sbatch.sh): stages are a
resumable DAG inside one Spark app instead of array jobs + file markers.
Build the --py-files zip with tools/build_pyfiles.py.
"""

from __future__ import annotations

import argparse
import json
import sys

from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rpv2spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("--out", required=True)
    g.add_argument("--rows", type=int, default=1000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--partitions", type=int, default=8)

    r = sub.add_parser("run")
    r.add_argument("--input", required=True)
    r.add_argument("--warehouse", required=True)
    r.add_argument("--no-resume", action="store_true")
    r.add_argument("--stages", default=None, help="comma list; default all")

    s = sub.add_parser("stream")
    s.add_argument("--input", required=True)
    s.add_argument("--warehouse", required=True)

    c = sub.add_parser("compact")
    c.add_argument("--table", required=True)
    c.add_argument("--rows-per-file", type=int, default=1_000_000)
    c.add_argument("--sort-by", default=None, help="comma list of sort keys")
    c.add_argument("--keep-versions", type=int, default=2)

    args = p.parse_args(argv)
    spark = get_spark()

    if args.cmd == "generate":
        from .fixtures import write_pages

        write_pages(spark, args.out, args.rows, args.seed, args.partitions)
        print(json.dumps({"written": args.out, "rows": args.rows}))
        return 0

    if args.cmd == "run":
        from .sources.pages import pages_stages, read_pages
        from .tableio import run_stages

        stages = pages_stages()
        if args.stages:
            wanted = set(args.stages.split(","))
            stages = [st for st in stages if st.name in wanted]
        src = read_pages(spark, args.input)
        _, metrics = run_stages(
            spark, src, stages, args.warehouse, resume=not args.no_resume
        )
        print(json.dumps(metrics))
        return 0

    if args.cmd == "compact":
        from .tableio import compact_table, data_file_count

        snap = compact_table(
            spark, args.table, rows_per_file=args.rows_per_file,
            sort_by=tuple(args.sort_by.split(",")) if args.sort_by else (),
            keep_versions=args.keep_versions,
        )
        print(json.dumps({
            "version": snap["version"], "rows": snap["rows"],
            "files": data_file_count(args.table),
            "compaction": snap["meta"]["compaction"],
        }))
        return 0

    if args.cmd == "stream":
        from .streaming.ingest import stream_labels

        q = stream_labels(
            spark, args.input,
            f"{args.warehouse}/stream_labels",
            f"{args.warehouse}/_checkpoints/stream_labels",
        )
        q.awaitTermination()
        print(json.dumps({"stream": "done"}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
