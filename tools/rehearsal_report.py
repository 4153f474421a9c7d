"""Summarize a training run's COCO-metric trajectory from its train.log.

The trainer logs the full 12-stat COCOeval vector after every validation
(`BBOX ...` / `SEGM ...` lines: AP, AP50, AP75, APS, APM, APL, AR1, AR10,
AR100, ARS, ARM, ARL — same order as pycocotools' summarize()). This tool
turns a run dir into the markdown trajectory table used by docs/PARITY.md's
rehearsal evidence, plus a final-epoch detail block.

Run: python tools/rehearsal_report.py <run_dir_or_train.log> [--every N]
"""

import argparse
import os
import re
import sys

STATS = ["AP", "AP50", "AP75", "APS", "APM", "APL",
         "AR1", "AR10", "AR100", "ARS", "ARM", "ARL"]


def parse(log_path):
    """[(epoch, {'BBOX': [12 floats], 'SEGM': [...]}), ...]"""
    out = []
    cur_epoch = None
    cur = {}
    pat = re.compile(r"(BBOX|SEGM)((?:\s+-?\d+\.\d+){12})\s*$")
    epat = re.compile(r"Validate after epoch (\d+)")
    with open(log_path) as fh:
        for line in fh:
            m = epat.search(line)
            if m:
                cur_epoch = int(m.group(1))
                cur = {}
                continue
            m = pat.search(line)
            if m and cur_epoch is not None:
                cur[m.group(1)] = [float(x) for x in m.group(2).split()]
                if len(cur) == 2:
                    out.append((cur_epoch, dict(cur)))
                    cur = {}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run", help="run dir (containing train.log) or log path")
    ap.add_argument("--every", type=int, default=1,
                    help="print every N-th validation (last always shown)")
    args = ap.parse_args()
    log = args.run
    if os.path.isdir(log):
        log = os.path.join(log, "train.log")
    rows = parse(log)
    if not rows:
        sys.exit(f"no validation stat lines found in {log}")

    print("| epoch | bbox AP | segm AP | segm AP50 | segm APS | segm APM "
          "| segm APL |")
    print("|---|---|---|---|---|---|---|")
    for i, (ep, st) in enumerate(rows):
        if i % args.every and i != len(rows) - 1:
            continue
        b, s = st["BBOX"], st["SEGM"]
        print(f"| {ep} | {b[0]:.3f} | {s[0]:.3f} | {s[1]:.3f} | {s[3]:.3f} "
              f"| {s[4]:.3f} | {s[5]:.3f} |")

    ep, st = rows[-1]
    print(f"\nFinal (epoch {ep}) full 12-stat vectors:")
    for kind in ("BBOX", "SEGM"):
        print(f"  {kind}: " + "  ".join(
            f"{n}={v:.3f}" for n, v in zip(STATS, st[kind])))
    s = dict(zip(STATS, st["SEGM"]))
    print(f"\nAPS>0: {s['APS'] > 0}  (small-object axis, the hardest "
          f"reference axis — val2017 mask APS 0.168)")


if __name__ == "__main__":
    main()
