"""CLI entry point: ``python -m chronoxtract_ray <command>``.

Commands:
  rollup   --input DIR --out DIR [--num-parts N] [--no-gorilla] [--no-resume]
  generate --out DIR --convs N
  query    --name NAME --sf-dir DIR
  decode   --chunks DIR --tier T      (Gorilla chunks → points, prints head)

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
    p_roll.add_argument("--num-parts", type=int, default=16)
    p_roll.add_argument("--no-gorilla", action="store_true")
    p_roll.add_argument("--no-resume", action="store_true")

    p_gen = sub.add_parser("generate", help="write a deterministic synthetic transcript table")
    p_gen.add_argument("--out", required=True)
    p_gen.add_argument("--convs", type=int, default=1000)

    p_q = sub.add_parser("query", help="run one driver query")
    p_q.add_argument("--name", required=True)
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    p_d = sub.add_parser("decode", help="decode Gorilla chunks of a tier")
    p_d.add_argument("--root", required=True)
    p_d.add_argument("--tier", default="1m")

    args = ap.parse_args(argv)
    ray = _init_ray(args.num_cpus)
    try:
        if args.cmd == "rollup":
            from chronoxtract_ray.pipelines.rollup_pipeline import PipelineConfig, run_rollup_pipeline

            metrics = run_rollup_pipeline(
                args.input,
                args.out,
                PipelineConfig(
                    num_parts=args.num_parts,
                    with_gorilla=not args.no_gorilla,
                    resume=not args.no_resume,
                ),
            )
            print(json.dumps(metrics, default=str))
        elif args.cmd == "generate":
            from chronoxtract_ray.sources.transcripts import write_transcripts

            write_transcripts(args.out, args.convs)
            print(json.dumps({"written": args.out, "convs": args.convs}))
        elif args.cmd == "query":
            sys.path.insert(0, ".")
            import __ray_entry__ as entry

            res = entry.queries()[args.name](args.sf_dir)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            print(df.head(20).to_string())
            print(f"... {len(df)} rows")
        elif args.cmd == "decode":
            import os

            from chronoxtract_ray.pipelines.rollup_pipeline import tier_table
            from chronoxtract_ray.stages.gorilla_stage import decode_chunks

            ch = tier_table(os.path.join(args.root, "chunks"), args.tier)
            drop = [c for c in ("tier", "part") if c in ch.column_names]
            pts = decode_chunks(ch.drop_columns(drop) if drop else ch)
            print(pts.to_pandas().head(20).to_string())
            print(f"... {pts.num_rows} points from {ch.num_rows} chunks")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
