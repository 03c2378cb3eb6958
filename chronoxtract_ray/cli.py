"""CLI entry point: ``python -m chronoxtract_ray <command>``.

Commands:
  rollup    --input DIR --out DIR [--num-parts N] [--no-gorilla] [--no-resume]
  ingest    --input DIR --out DIR [--num-parts N] [--batch-id ID]   (incremental merge)
  retention --root DIR --num-parts N --keep TIER=DURATION[,...]     (e.g. 1m=7d,1h=90d)
  generate  --out DIR --convs N
  query     --name NAME --sf-dir DIR
  decode    --chunks DIR --tier T     (Gorilla chunks → points, prints head)
  export    --root DIR --tier T --out DIR --format parquet|jsonl|csv [--columns a,b]

Owns the Ray session (scripts own sessions; library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    if not ray.is_initialized():
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="chronoxtract_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_roll = sub.add_parser("rollup", help="run the tier rollup pipeline")
    p_roll.add_argument("--input", required=True)
    p_roll.add_argument("--out", required=True)
    p_roll.add_argument("--format", default=None, choices=["parquet", "jsonl", "json", "csv"],
                        help="input format (default: sniff from file extensions)")
    p_roll.add_argument("--num-parts", type=int, default=None,
                        help="partition count (default: the store's recorded value, else 16)")
    p_roll.add_argument("--no-gorilla", action="store_true")
    p_roll.add_argument("--no-resume", action="store_true")

    p_ing = sub.add_parser("ingest", help="incrementally merge a transcript batch into an existing store")
    p_ing.add_argument("--input", required=True)
    p_ing.add_argument("--out", required=True)
    p_ing.add_argument("--format", default=None, choices=["parquet", "jsonl", "json", "csv"],
                        help="input format (default: sniff from file extensions)")
    p_ing.add_argument("--num-parts", type=int, default=None,
                        help="partition count (default: the store's recorded value, else 16)")
    p_ing.add_argument("--batch-id", default=None, help="exactly-once key; rerun a killed job with the same id")

    p_ret = sub.add_parser("retention", help="enforce per-tier keep horizons against the store watermark")
    p_ret.add_argument("--root", required=True)
    p_ret.add_argument("--num-parts", type=int, default=None,
                       help="partition count (default: the store's recorded value)")
    p_ret.add_argument("--keep", required=True, help="TIER=DURATION[,TIER=DURATION...], units s/m/h/d (e.g. 1m=7d,1h=90d)")

    p_gen = sub.add_parser("generate", help="write a deterministic synthetic transcript table")
    p_gen.add_argument("--out", required=True)
    p_gen.add_argument("--convs", type=int, default=1000)

    p_q = sub.add_parser("query", help="run one driver query")
    p_q.add_argument("--name", required=True)
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    p_d = sub.add_parser("decode", help="decode Gorilla chunks of a tier")
    p_d.add_argument("--root", required=True)
    p_d.add_argument("--tier", default="1m")

    p_x = sub.add_parser("export", help="export a tier table to parquet/jsonl/csv")
    p_x.add_argument("--root", required=True)
    p_x.add_argument("--tier", default="1h")
    p_x.add_argument("--out", required=True)
    p_x.add_argument("--format", default="parquet", choices=["parquet", "jsonl", "csv"])
    p_x.add_argument("--columns", default=None, help="comma-separated column projection")

    args = ap.parse_args(argv)
    ray = _init_ray(args.num_cpus)
    try:
        if args.cmd == "rollup":
            from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline
            from chronoxtract_ray.sources.transcripts import open_transcripts
            from chronoxtract_ray.state.checkpoint import read_store_meta

            meta = read_store_meta(args.out)
            metrics = run_rollup_pipeline(
                open_transcripts(args.input, args.format),
                args.out,
                PipelineConfig(
                    # omit --num-parts → adopt the store's recorded value
                    # (ensure_store_meta raises on an explicit conflict)
                    num_parts=args.num_parts or (meta or {}).get("num_parts", 16),
                    with_gorilla=not args.no_gorilla,
                    resume=not args.no_resume,
                ),
            )
            print(json.dumps(metrics, default=str))
        elif args.cmd == "ingest":
            from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig
            from chronoxtract_ray.sources.transcripts import open_transcripts
            from chronoxtract_ray.stages.ingest import run_incremental_ingest
            from chronoxtract_ray.state.checkpoint import read_store_meta

            meta = read_store_meta(args.out)
            metrics = run_incremental_ingest(
                open_transcripts(args.input, args.format),
                args.out,
                PipelineConfig(
                    num_parts=args.num_parts or (meta or {}).get("num_parts", 16),
                    # an ingest must match the store's chunk layout
                    with_gorilla=(meta or {}).get("with_gorilla", True),
                ),
                batch_id=args.batch_id,
            )
            print(json.dumps(metrics, default=str))
        elif args.cmd == "retention":
            from chronoxtract_ray.stages.retention import RetentionPolicy, apply_retention
            from chronoxtract_ray.state.checkpoint import read_store_meta

            units = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}
            keep = {}
            for spec in args.keep.split(","):
                try:
                    tier, dur = spec.split("=")
                    dur = dur.strip()
                    keep[tier.strip()] = int(float(dur[:-1]) * units[dur[-1]])
                except (ValueError, KeyError, IndexError):
                    print(f"bad --keep entry {spec!r}: expected TIER=NUMBER<unit> with "
                          f"unit one of s/m/h/d (e.g. 1m=7d,1h=90d)", file=sys.stderr)
                    return 2
            num_parts = args.num_parts or (read_store_meta(args.root) or {}).get("num_parts")
            if not num_parts:
                print("--num-parts required: store has no recorded metadata "
                      "(pre-metadata store) and no value was given", file=sys.stderr)
                return 2
            summary = apply_retention(args.root, num_parts, RetentionPolicy(keep))
            print(json.dumps(summary, default=str))
        elif args.cmd == "generate":
            from chronoxtract_ray.sources.transcripts import write_transcripts

            write_transcripts(args.out, args.convs)
            print(json.dumps({"written": args.out, "convs": args.convs}))
        elif args.cmd == "query":
            import os

            # the entry module lives next to the package, not in cwd
            sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            import __ray_entry__ as entry

            qs = entry.queries()
            if args.name not in qs:
                print(f"unknown query {args.name!r}; available: {', '.join(sorted(qs))}",
                      file=sys.stderr)
                return 2
            res = qs[args.name](args.sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(df.head(20).to_string())
            print(f"... {len(df)} rows")
        elif args.cmd == "export":
            import os

            from chronoxtract_ray.stages.util import read_parquet_locked

            src = os.path.join(args.root, f"tier={args.tier}")
            cols = args.columns.split(",") if args.columns else None
            # streaming read → streaming write; never materialized on the driver
            ds = read_parquet_locked(src, columns=cols)
            if args.format == "parquet":
                ds.write_parquet(args.out)
            elif args.format == "jsonl":
                ds.write_json(args.out)
            else:
                ds.write_csv(args.out)
            print(json.dumps({"exported": args.out, "tier": args.tier,
                              "format": args.format, "rows": ds.count()}))
        elif args.cmd == "decode":
            import os

            from chronoxtract_ray.pipelines.rollup_pipeline import tier_table
            from chronoxtract_ray.stages.gorilla_stage import decode_chunks

            ch = tier_table(os.path.join(args.root, "chunks"), args.tier)
            drop = [c for c in ("tier", "part") if c in ch.column_names]
            ch = ch.drop_columns(drop) if drop else ch
            # decode only enough chunks for the 20-row preview; the total
            # comes from the n_points column — a bench-scale store must not
            # be fully decoded in a driver loop just to print a head
            import pyarrow.compute as pc

            total = int(pc.sum(ch["n_points"]).as_py() or 0) if ch.num_rows else 0
            need, k = 0, 0
            npts = ch["n_points"].to_numpy() if ch.num_rows else []
            while k < len(npts) and need < 20:
                need += int(npts[k])
                k += 1
            pts = decode_chunks(ch.slice(0, k))
            print(pts.to_pandas().head(20).to_string())
            print(f"... {total} points from {ch.num_rows} chunks")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
