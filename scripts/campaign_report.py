"""Summarize BENCH_scaling_campaign.jsonl into the BENCH.md table:
per-protocol raw / host-normalized efficiency distributions, medians,
and per-phase scaling of the steady-state batches."""

from __future__ import annotations

import json
import statistics
import sys


def main(path: str = "BENCH_scaling_campaign.jsonl") -> None:
    pairs: dict[str, list[dict]] = {}
    for line in open(path):
        rec = json.loads(line)
        if "summary" in rec:
            continue
        pairs.setdefault(rec["protocol"], []).append(rec)
    for proto, recs in pairs.items():
        raws = sorted(r["raw_efficiency"] for r in recs)
        norms = sorted(r["normalized_efficiency"] for r in recs)
        print(f"\n== {proto} ({recs[0]['geometry']}) ==")
        print(f"raw:  {raws}  median {statistics.median(raws):.3f}")
        print(f"norm: {norms}  median {statistics.median(norms):.3f}")
        # steady-state commit scaling (batches 2+, prepare overlapped)
        for r in recs:
            pn, p4 = r.get("phases_n"), r.get("phases_4n")
            if not pn or not p4:
                continue
            cn = sum(p["commit"] for p in pn[1:])
            c4 = sum(p["commit"] for p in p4[1:])
            sn = pn[0]["prepare"]
            s4 = p4[0]["prepare"]
            print(
                f"  pair {r['pair']}: stage1 {sn:.1f}->{s4:.1f}s "
                f"({sn / max(s4, 1e-9) / 4:.2f}), steady commits "
                f"{cn:.1f}->{c4:.1f}s ({cn / max(c4, 1e-9) / 4:.2f}), "
                f"host {r['host_cpu_eff_2_8']:.3f}"
            )


if __name__ == "__main__":
    main(*sys.argv[1:])
