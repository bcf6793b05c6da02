#!/usr/bin/env python
"""Download the two public demo datasets and drop them where the demo params
expect them (reference parity: demo/data/data_url.txt lists the same records).

  tBL-WSe2  Zenodo record 10621271 (Fig_01.zip -> Panel_g-h_Themis/
            scan_x128_y128.raw), doi:10.1126/science.adl2029
  PSO       PARADIM doi ssmm-2j11 (sample_data_PrScO3.mat),
            doi:10.1126/science.abg2533
  bundle    Zenodo record 15273176 (the reference's own demo bundle with
            both datasets pre-arranged)

Needs network access (not available in air-gapped CI — this script is the
one reference workflow that cannot run there; everything else in demo/
runs on synthetic data). Uses only the stdlib.

Usage:
  python demo/scripts/download_demo_data.py [--dest demo/data] [--dataset all]
  python demo/scripts/run_demo_reconstruct.py demo/params/tBL_WSe2_reconstruct.yml
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.request
import zipfile

BUNDLE_URL = "https://zenodo.org/records/15273176/files/demo.zip?download=1"
WSE2_URL = "https://zenodo.org/records/10621271/files/Fig_01.zip?download=1"
PSO_URL = "https://data.paradim.org/api/files/doi/ssmm-2j11/sample_data_PrScO3.mat"


def _fetch(url: str, dest: str, desc: str) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    if os.path.exists(dest):
        print(f"[skip] {desc}: {dest} exists")
        return dest
    print(f"[get ] {desc}: {url}")

    def hook(blocks, bsize, total):
        done = blocks * bsize
        if total > 0:
            sys.stdout.write(f"\r       {done/1e6:8.1f} / {total/1e6:.1f} MB")
            sys.stdout.flush()

    tmp = dest + ".part"
    urllib.request.urlretrieve(url, tmp, reporthook=hook)
    print()
    os.replace(tmp, dest)
    return dest


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    # demo/params/*.yml reference measurements as data/<name>/... relative to
    # demo/ (same layout as the reference bundle); default dest matches
    ap.add_argument("--dest", default="demo")
    ap.add_argument("--dataset", choices=["all", "bundle", "wse2", "pso"],
                    default="bundle")
    args = ap.parse_args()
    dest = args.dest

    try:
        if args.dataset in ("bundle", "all"):
            z = _fetch(BUNDLE_URL, os.path.join(dest, "demo_bundle.zip"),
                       "reference demo bundle (both datasets)")
            with zipfile.ZipFile(z) as zf:
                zf.extractall(dest)
            print(f"[ ok ] bundle extracted under {dest}")
        if args.dataset in ("wse2", "all"):
            ddir = os.path.join(dest, "data", "tBL_WSe2")
            z = _fetch(WSE2_URL, os.path.join(ddir, "Fig_01.zip"),
                       "tBL-WSe2 4D-STEM (Zenodo 10621271)")
            with zipfile.ZipFile(z) as zf:
                members = [m for m in zf.namelist()
                           if m.endswith("scan_x128_y128.raw")]
                zf.extractall(ddir, members=members or None)
            print(f"[ ok ] tBL-WSe2 raw under {ddir}")
        if args.dataset in ("pso", "all"):
            p = _fetch(PSO_URL,
                       os.path.join(dest, "data", "PSO", "sample_data_PrScO3.mat"),
                       "PSO 4D-STEM (PARADIM ssmm-2j11)")
            print(f"[ ok ] PSO .mat at {p} (sha256 {_sha256(p)[:16]}...)")
    except (urllib.error.URLError, OSError) as e:
        print(f"\n[fail] download failed: {e}\n"
              "       This environment may have no network access. The demo\n"
              "       params run unchanged on data fetched from any machine:\n"
              f"       copy the files into {dest}/ and re-run.", file=sys.stderr)
        return 1

    print("\nNext: point the params' data path at the downloaded file and run\n"
          "  ptyrad-tpu run demo/params/tBL_WSe2_reconstruct.yml\n"
          "or the synthetic demo (no download needed):\n"
          "  python demo/scripts/run_synthetic_demo.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
