"""Merge at-scale sweep jsonl files into one BENCH_SCALE artifact.

Later rows win per query (re-runs supersede earlier phases), summary
rows are recomputed over the merged set, and a markdown table is
printed for BENCH_NOTES.

    python -m auron_tpu.tpcds.merge_bench out.jsonl in1.jsonl in2.jsonl ...
"""

from __future__ import annotations

import json
import math
import sys


def main(argv) -> int:
    out_path, ins = argv[0], argv[1:]
    rows = {}
    order = []
    for p in ins:
        with open(p) as f:
            for line in f:
                d = json.loads(line)
                if d.get("summary"):
                    continue
                q = d["query"]
                if q not in rows:
                    order.append(q)
                d["source"] = p.rsplit("/", 1)[-1]
                rows[q] = d
    merged = [rows[q] for q in order]
    ok = [r for r in merged if r.get("match")]
    speed = [r["speedup"] for r in ok if r.get("speedup")]
    summary = {"summary": True, "matched": len(ok), "total": len(merged)}
    if speed:
        gm = math.exp(sum(math.log(x) for x in speed) / len(speed))
        summary.update({
            "geomean_speedup_vs_warm_pandas": round(gm, 3),
            "min_speedup": min(speed), "max_speedup": max(speed),
            "ge_1x": sum(1 for x in speed if x >= 1.0)})
    with open(out_path, "w") as f:
        for r in merged:
            f.write(json.dumps(r) + "\n")
        f.write(json.dumps(summary) + "\n")
    print("| query | match | mode | compute_s | vs warm pandas | rows/s/chip |")
    print("|---|---|---|---|---|---|")
    for r in merged:
        if not r.get("match"):
            print(f"| {r['query']} | **{r.get('error', 'FAIL')}** | | | | |")
            continue
        mode = r.get("mode", "jit")
        comp = r.get("compute_s") or r.get("engine_s")
        rps = r.get("rows_per_s")
        print(f"| {r['query']} | yes | {mode} | {comp} | "
              f"{r['speedup']}x | {rps and round(rps / 1e6, 1)}M |")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
