"""Full literal-SQL differential: run the reference's TPC-DS ``q*.sql``
files (dev/auron-it/src/main/resources/tpcds-queries) through the SQL
front-end and diff value-for-value against the Frame-port pandas oracles.

This is the QueryRunner + QueryResultComparator analog
(reference dev/auron-it/.../QueryResultComparator.scala:39-106) applied to
the SECOND front-end: text -> wire JSON -> engine, no Frame builder.

    python -m auron_tpu.tpcds.sqldiff [--sf 0.2] [q5 q77 ...]

Prints one line per query (MATCH/SHAPE/DIFF/ERROR) and a TOTAL line;
exit code 0 iff every selected query matches. All 103 match at sf=0.2.
"""

from __future__ import annotations

import argparse
import glob
import os
import signal
import sys

_SQL_DIR = "/root/reference/dev/auron-it/src/main/resources/tpcds-queries"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", help="subset (default: all)")
    ap.add_argument("--sf", type=float, default=0.2)
    ap.add_argument("--timeout", type=int, default=300,
                    help="per-query wall-clock limit (s)")
    args = ap.parse_args(argv)

    import jax
    # CPU is the correctness oracle (f64); must be set before any jax
    # computation (default_backend() would already initialize the TPU)
    jax.config.update("jax_platforms", "cpu")
    import auron_tpu.sql  # noqa: F401 — installs Session.sql
    from auron_tpu.tpcds.datagen import generate
    from auron_tpu.tpcds.queries import QUERIES
    from auron_tpu.tpcds.runner import frames_match, make_session

    tables = generate(sf=args.sf)
    s = make_session(tables, 1)

    class _Timeout(Exception):
        pass

    def _alarm(*_):
        raise _Timeout()
    signal.signal(signal.SIGALRM, _alarm)

    sel = set(args.queries) or None
    match = bad = 0
    for p in sorted(glob.glob(os.path.join(_SQL_DIR, "q*.sql"))):
        q = os.path.basename(p)[:-4]
        if sel and q not in sel:
            continue
        if q not in QUERIES:
            print(f"{q} NO-ORACLE", flush=True)
            bad += 1
            continue
        signal.alarm(args.timeout)
        try:
            got = s.sql(open(p).read())
            want = QUERIES[q][1](tables)
            if len(got.columns) != len(want.columns):
                print(f"{q} SHAPE got={list(got.columns)} "
                      f"want={list(want.columns)}", flush=True)
                bad += 1
                continue
            got = got.set_axis(list(want.columns), axis=1)
            if frames_match(got, want):
                print(f"{q} MATCH rows={len(got)}", flush=True)
                match += 1
            else:
                print(f"{q} DIFF got_rows={len(got)} "
                      f"want_rows={len(want)}", flush=True)
                bad += 1
        except _Timeout:
            print(f"{q} TIMEOUT", flush=True)
            bad += 1
        except Exception as e:  # noqa: BLE001 — per-query report
            print(f"{q} ERROR {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            bad += 1
        finally:
            signal.alarm(0)
    print(f"TOTAL match={match} failed={bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
