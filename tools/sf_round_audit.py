"""Checkpointed round(double) audit runner (VERDICT r8 #2).

Wraps tools/round_audit.py one-oracle-at-a-time in subprocesses with a
per-oracle timeout, recording each verdict to a JSONL checkpoint so a
multi-hour sf0.1 audit can accumulate across invocations instead of
needing one uninterrupted budget (the r8 lesson: the O(n^2) brute
oracles run twice each and one alone took ~54 min).

Usage:
    python tools/sf_round_audit.py [--sf DIR] [--ckpt FILE]
        [--timeout SEC] [--tail N | query ...]

--tail N audits the N heaviest round-bearing oracles by BENCH_FULL wall
time (the same proxy ordering the r8 incremental audit used, so its
"not reached" tail is exactly the heavy suffix). Already-checkpointed
queries are skipped; a TIMEOUT verdict marks the oracle as needing a
MATERIALIZED-CTE rewrite rather than a bigger budget.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--ckpt", default="/tmp/sf01_round_audit.jsonl")
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--tail", type=int, default=0)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as m

    bench = json.load(open(REPO / "BENCH_FULL.json"))["queries"]
    oracles = {
        n: s
        for n, s in m.oracle_sql().items()
        if re.search(r"\bround\s*\(", s)
    }
    if args.queries:
        todo = [q for q in args.queries if q in oracles]
    elif args.tail:
        order = sorted(oracles, key=lambda n: bench.get(n, 999.0))
        todo = order[-args.tail:]
    else:
        todo = sorted(oracles, key=lambda n: bench.get(n, 999.0))

    done: dict[str, str] = {}
    ckpt = Path(args.ckpt)
    if ckpt.exists():
        for line in ckpt.read_text().splitlines():
            if line.strip():
                rec = json.loads(line)
                done[rec["query"]] = rec["verdict"]

    print(
        f"{len(todo)} oracles queued, {sum(q in done for q in todo)} "
        f"already checkpointed, timeout {args.timeout:.0f}s each",
        flush=True,
    )
    for name in todo:
        if name in done:
            continue
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "tools/round_audit.py", args.sf, name],
                cwd=REPO,
                capture_output=True,
                text=True,
                timeout=args.timeout,
            )
            out = proc.stdout + proc.stderr
            m_risk = re.search(r"(\d+)\s+at risk", out)
            if m_risk and int(m_risk.group(1)) > 0:
                verdict = "AT_RISK"
            elif proc.returncode == 0:
                verdict = "IMMUNE"
            else:
                verdict = "ERROR"
        except subprocess.TimeoutExpired:
            verdict, out = "TIMEOUT", ""
        wall = time.time() - t0
        with ckpt.open("a") as f:
            f.write(
                json.dumps(
                    {"query": name, "verdict": verdict, "wall_sec": round(wall, 1)}
                )
                + "\n"
            )
        done[name] = verdict  # keep the closing summary current-run-aware
        print(f"{name}: {verdict} ({wall:.0f}s)", flush=True)
        if verdict in ("AT_RISK", "ERROR"):
            print(out[-2000:], flush=True)
    bad = [q for q in todo if done.get(q) not in (None, "IMMUNE")]
    print("done; non-immune so far:", bad or "none", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
