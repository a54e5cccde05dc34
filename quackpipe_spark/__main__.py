"""CLI entry point.

``python -m quackpipe_spark --stdin`` pipes SQL statements (``;``- or
newline-separated) straight to the engine — parity with the reference's
stdin bootstrap used to pre-run SQL in containers (stdin/init.go:15-49).
``--serve`` starts the HTTP server over ``--root``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="quackpipe_spark")
    ap.add_argument("--stdin", action="store_true", help="execute SQL from stdin")
    ap.add_argument("--serve", action="store_true", help="start the HTTP server")
    ap.add_argument("--root", default="./gigadata", help="data root directory")
    ap.add_argument("--db", default="default")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7971)
    args = ap.parse_args(argv)

    from quackpipe_spark.session import get_spark

    spark = get_spark()
    if args.stdin:
        from quackpipe_spark.catalog import Catalog
        from quackpipe_spark.query import QueryEngine

        qe = QueryEngine(spark, Catalog(args.root))
        text = sys.stdin.read()
        for stmt in [s.strip() for s in text.split(";") if s.strip()]:
            df = qe.sql(stmt, db=args.db)
            for row in df.collect():
                print("\t".join(str(v) for v in row))
        return 0
    if args.serve:
        from quackpipe_spark.api import GigapiServer

        srv = GigapiServer(spark, args.root, host=args.host, port=args.port)
        srv.start()
        print(f"listening on http://{args.host}:{srv._httpd.server_address[1]}")
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            srv.stop()
        return 0
    ap.print_help()
    return 2


if __name__ == "__main__":
    sys.exit(main())
