"""CLI: run declared queries or the streaming demo pipeline.

  python -m video_stream_processing_spark list
  python -m video_stream_processing_spark run b01_pricing_summary [--sf-dir DIR] [-n 20]
  python -m video_stream_processing_spark explain b03_broadcast_join
  python -m video_stream_processing_spark stream --seconds 15 --out /tmp/vsp-out
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="video_stream_processing_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list declared queries")

    runp = sub.add_parser("run", help="run a declared query and show rows")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default=None)
    runp.add_argument("-n", type=int, default=20)

    exp = sub.add_parser("explain", help="print the formatted physical plan")
    exp.add_argument("name")
    exp.add_argument("--sf-dir", default=None)

    stp = sub.add_parser("stream", help="run the rate-source demo pipeline")
    stp.add_argument("--seconds", type=int, default=15)
    stp.add_argument("--out", default="/tmp/vsp-stream-out")

    args = p.parse_args(argv)

    from video_stream_processing_spark.engine import Engine
    from video_stream_processing_spark.tables import DEFAULT_SF_DIR

    if args.cmd == "list":
        eng = Engine()
        for name, doc in eng.queries().items():
            print(f"{name:32s} {doc}")
        return 0

    if args.cmd == "run":
        eng = Engine(sf_dir=args.sf_dir or DEFAULT_SF_DIR)
        eng.run(args.name).show(args.n, truncate=False)
        return 0

    if args.cmd == "explain":
        eng = Engine(sf_dir=args.sf_dir or DEFAULT_SF_DIR)
        eng.run(args.name).explain("formatted")
        return 0

    if args.cmd == "stream":
        import time

        from video_stream_processing_spark.streaming.pipeline import rate_frames

        eng = Engine()
        frames = rate_frames(eng.spark)
        det, seg = eng.start_pipeline(
            frames, args.out, args.out + "-ck", segment_duration_ms=10_000
        )
        time.sleep(args.seconds)
        det.stop()
        seg.stop()
        n = eng.spark.read.parquet(args.out + "/detections").count()
        print(f"wrote {n} detection rows to {args.out}/detections")
        return 0

    return 1  # pragma: no cover


if __name__ == "__main__":
    sys.exit(main())
