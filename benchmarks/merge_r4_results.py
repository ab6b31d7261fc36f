#!/usr/bin/env python
"""Collect the round-4 measurement artifacts (benchmarks/.r4_*.json)
into benchmarks/results_v5e_r4.json, in the same list-of-entries shape
as results_v5e_r3.json.  Idempotent; skips missing steps."""

import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

NOTES = {
    "core": "configs 0/2/5/1 at the round-4 HEAD (config 1 on the evolved-"
            "std operating point, config 5 with sync-comparable accounting)",
    "anatomy": "SUPERSEDED by anatomy2: phase labels were off by one",
    "anatomy2": "corrected prefix-timing phase anatomy of EnSRF.update()",
    "cycled": "SUPERSEDED by cycled3: diverged (lambda applied unsquare-"
              "rooted; undamped/uncapped field)",
    "cycled2": "SUPERSEDED by cycled3: sqrt fix alone; still diverged "
               "(undamped/uncapped field)",
    "cycled3": "production cycled benchmark (config 13) with sqrt-lambda "
               "application + damping 0.9 + cap 4.0",
    "letkf_host": "config 7 with letkf_topk=host",
    "letkf_exact": "config 7 with exact device selection",
    "obscap": "config 12, per-point subprocess isolation; the 200k ensrf "
              "point crashes the TPU worker (shape-specific: 100k and "
              "500k run)",
    "rest": "configs 3/4/6/8/9/11",
    "letkf_tune": "LETKF pod patch-size x selection sweep",
    "config5": "config 5 re-measured with sync-comparable accounting",
    "chunked200k": "public-API EnSRF with auto obs chunking at the "
                   "one-shot crash size and above",
    "onchip_ab": "config-1 operating points x seeds on chip",
    "bisect_donate": "200k one-shot crash bisect: donating step",
}


def main():
    out = []
    for path in sorted(glob.glob(os.path.join(HERE, ".r4_*.json"))):
        name = os.path.basename(path)[4:-5]
        try:
            data = json.load(open(path))
        except Exception as e:
            out.append({"step": name, "load_error": repr(e)})
            continue
        entries = data if isinstance(data, list) else [data]
        for e in entries:
            if isinstance(e, dict):
                e = dict(e)
                e["r4_step"] = name
                if name in NOTES:
                    e["r4_note"] = NOTES[name]
            out.append(e)
    for path in sorted(glob.glob(os.path.join(HERE, ".r4_bisect_*.json"))):
        name = os.path.basename(path)[4:-5]
        try:
            e = json.load(open(path))
            e["r4_step"] = name
            out.append(e)
        except Exception:
            pass
    dst = os.path.join(HERE, "results_v5e_r4.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {dst}: {len(out)} entries")


if __name__ == "__main__":
    main()
