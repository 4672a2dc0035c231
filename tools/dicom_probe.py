"""DICOM series probe: list series, shapes, spacing, and windowing metadata.

Port of reference suibian.py (ad-hoc DICOM inspection). pydicom is optional.

Usage: python tools/dicom_probe.py --dir <dicom_dir>
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    args = ap.parse_args(argv)
    try:
        import pydicom
    except ImportError:
        raise SystemExit("pydicom not installed; convert series to npz with tools/datacheck.py")

    series = defaultdict(list)
    for root, _, files in os.walk(args.dir):
        for f in files:
            if f.lower().endswith(".dcm"):
                p = os.path.join(root, f)
                try:
                    ds = pydicom.dcmread(p, stop_before_pixels=True)
                    series[str(ds.get("SeriesInstanceUID", "?"))].append((p, ds))
                except Exception:  # noqa: BLE001
                    pass
    for uid, items in series.items():
        ds = items[0][1]
        print(
            f"series {uid[:16]}…  n={len(items)}  desc={ds.get('SeriesDescription','?')}  "
            f"rows={ds.get('Rows','?')} cols={ds.get('Columns','?')}  "
            f"spacing={ds.get('PixelSpacing','?')} thickness={ds.get('SliceThickness','?')}  "
            f"WL/WW={ds.get('WindowCenter','?')}/{ds.get('WindowWidth','?')}"
        )


if __name__ == "__main__":
    main()
