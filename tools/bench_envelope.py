"""Quantify the bench noise envelope: N process-fresh bench.py runs.

Every headline FPS in docs/PERFORMANCE.md rides the axon relay, which adds
multi-percent day-state jitter; single-digit-% wins must be read against a
MEASURED spread, not an assumed one (VERDICT r3 task 8).  This runs bench.py
N times in fresh processes (interleaving variants if given) and prints
median / min / max / rel-spread per variant.

Usage:
    python tools/bench_envelope.py [-n 5] [--variants bf16 int8]

Writes one JSON line per variant:
    {"metric": ..., "median": ..., "min": ..., "max": ..., "spread_pct": ...}
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(variant, timeout=2400):
    # timeout must cover bench.py's OWN wedge-retry supervisor (up to ~6
    # attempts x (480s + backoff) in a bad relay window); and a timeout here
    # is a data point to skip, not a reason to lose the whole envelope.
    env = dict(os.environ)
    env.pop("ORIENMASK_BENCH_INT8", None)
    if variant == "int8":
        env["ORIENMASK_BENCH_INT8"] = "1"
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"bench run ({variant}) timed out after {timeout}s — skipped",
              file=sys.stderr)
        return None
    if out.returncode != 0:
        print("bench run failed:\n" + out.stderr[-2000:], file=sys.stderr)
        return None
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5, help="process-fresh runs per variant")
    ap.add_argument("--variants", nargs="+", default=["bf16"],
                    choices=["bf16", "int8"])
    args = ap.parse_args()

    results = {v: [] for v in args.variants}
    # interleave variants so day-state drift hits all of them equally
    for i in range(args.n):
        for v in args.variants:
            r = run_once(v)
            if r is not None:
                results[v].append(r)
                print(f"[run {i + 1}/{args.n} {v}] {r['value']} img/s "
                      f"(windows {r.get('window_min')}-{r.get('window_max')})",
                      file=sys.stderr, flush=True)

    for v, rs in results.items():
        if not rs:
            print(json.dumps({"variant": v, "error": "no successful runs"}))
            continue
        vals = sorted(r["value"] for r in rs)
        med = vals[len(vals) // 2]
        spread = 100.0 * (vals[-1] - vals[0]) / med if med else float("nan")
        print(json.dumps({
            "metric": rs[0]["metric"], "runs": len(vals),
            "median": med, "min": vals[0], "max": vals[-1],
            "spread_pct": round(spread, 2),
        }))


if __name__ == "__main__":
    main()
