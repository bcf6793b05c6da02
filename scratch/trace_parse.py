"""Dump all device-op durations from a jax.profiler trace dir, sorted by time.

Usage: python scratch/trace_parse.py /tmp/tbl_prof [out.txt]
Filters out host-side python frames ($-prefixed and known host names).
"""
import glob
import gzip
import json
import os
import sys


def main():
    logdir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace json found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    # find device-lane pids: process names containing "TPU" / "/device:"
    durs = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        if name.startswith("$") or name.startswith("np.") or name == "1":
            continue
        durs[name] = durs.get(name, 0.0) + e.get("dur", 0) / 1e3
    lines = [f"{ms:10.3f} ms  {name}" for name, ms in
             sorted(durs.items(), key=lambda kv: -kv[1])]
    text = "\n".join(lines)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {len(lines)} ops to {out}; top 40:")
        print("\n".join(lines[:40]))
    else:
        print(text)


if __name__ == "__main__":
    main()
