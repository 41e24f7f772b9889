"""Encode the KITTI Eigen split lists into the bundled binary form.

The reference ships the Eigen splits as plain-text pair lists
(``Datasets/kitti_eigen_train.txt`` 22,600 pair lines,
``kitti_eigen_test_{improved,original}.txt`` 697 lines each — SURVEY
§2.3).  Every line is fully determined by a ``(date, drive, frame)``
triple (verified here with strict regexes), so we ship the split DATA as
one ~100 KB uint16 ``.npz`` instead of ~3 MB of text, and
``fal_net_tpu.data.lists`` regenerates the exact lines on demand.

Usage (one-off, already committed — re-run only if the upstream lists
ever change)::

    python scripts/encode_split_lists.py \
        --src /root/reference/Datasets \
        --out fal_net_tpu/data/lists/kitti_eigen_splits.npz

``tests/test_lists.py`` pins byte parity of the regenerated lines
against the source files whenever the reference checkout is present.
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fal_net_tpu.data.lists import DATES, LIST_SPECS  # noqa: E402

_PATTERNS = {
    # date/date_drive_DDDD_sync/image_02/data/FFFFFFFFFF.png  (x2: 02, 03)
    "pair": re.compile(
        r"(\d{4}_\d{2}_\d{2})/\1_drive_(\d{4})_sync/image_02/data/(\d{10})\.png"
        r" \1/\1_drive_\2_sync/image_03/data/\3\.png"
    ),
    # date_drive_DDDD_sync_02/FFFFFFFFFF.jpg  (x2: 02, 03)
    "flat": re.compile(
        r"(\d{4}_\d{2}_\d{2})_drive_(\d{4})_sync_02/(\d{10})\.jpg"
        r" \1_drive_\2_sync_03/\3\.jpg"
    ),
}


def encode_file(path: str, style: str) -> np.ndarray:
    rx = _PATTERNS[style]
    rows = []
    with open(path) as f:
        for ln in f.read().splitlines():
            if not ln.strip():
                continue
            m = rx.fullmatch(ln)
            if m is None:
                raise ValueError(f"{path}: unexpected line {ln!r}")
            date, drive, frame = m.groups()
            rows.append((DATES.index(date), int(drive), int(frame)))
    return np.asarray(rows, dtype=np.uint16)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="dir with kitti_eigen_*.txt")
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args(argv)

    arrays = {}
    for fname, style in LIST_SPECS.items():
        arrays[fname] = encode_file(os.path.join(args.src, fname), style)
        print(f"{fname}: {len(arrays[fname])} rows ({style})")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **{k.replace(".txt", ""): v for k, v in arrays.items()})
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
