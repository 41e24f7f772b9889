"""Bundled KITTI Eigen split lists.

The reference ships the Eigen splits as plain-text pair lists inside its
repo (``Datasets/kitti_eigen_train.txt`` — 22,600 L/R pairs,
``Datasets/kitti_eigen_test_improved.txt`` / ``_original.txt`` — 697
lines each; consumed at ``Kitti.py:38-42``,
``Kitti_eigen_test_improved.py:26-58``,
``Kitti_eigen_test_original.py:25-49``).  A user switching from the
reference should not have to carry those files over by hand, so this
package bundles the same split DATA — but not as copied text: every line
is fully determined by a ``(date, drive, frame)`` triple, so we store
one compressed uint16 array per list (~100 KB total vs ~3 MB of text,
``lists/kitti_eigen_splits.npz``, built by
``scripts/encode_split_lists.py``) and regenerate the exact reference
lines on demand.  ``tests/test_lists.py`` pins byte parity against the
reference files whenever that checkout is present.

Line grammar (strict — the encoder refuses anything else):

- ``pair`` style (train + improved test)::

    {date}/{date}_drive_{drive:04d}_sync/image_02/data/{frame:010d}.png \
 {same with image_03}

- ``flat`` style (original test)::

    {date}_drive_{drive:04d}_sync_02/{frame:010d}.jpg \
 {same with _03}
"""

import os
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

# The five KITTI-raw recording dates (index 0-4 in the encoded arrays).
DATES = ("2011_09_26", "2011_09_28", "2011_09_29", "2011_09_30", "2011_10_03")

# filename -> line style
LIST_SPECS: Dict[str, str] = {
    "kitti_eigen_train.txt": "pair",
    "kitti_eigen_test_improved.txt": "pair",
    "kitti_eigen_test_original.txt": "flat",
}

_BUNDLE = os.path.join(os.path.dirname(__file__), "lists", "kitti_eigen_splits.npz")


def _format_pair(date: str, drive: int, frame: int) -> str:
    stem = f"{date}/{date}_drive_{drive:04d}_sync"
    return (
        f"{stem}/image_02/data/{frame:010d}.png"
        f" {stem}/image_03/data/{frame:010d}.png"
    )


def _format_flat(date: str, drive: int, frame: int) -> str:
    stem = f"{date}_drive_{drive:04d}_sync"
    return f"{stem}_02/{frame:010d}.jpg {stem}_03/{frame:010d}.jpg"


_FORMATTERS = {"pair": _format_pair, "flat": _format_flat}


def bundled_names() -> List[str]:
    return list(LIST_SPECS)


@lru_cache(maxsize=None)
def _cached_lines(fname: str) -> Tuple[str, ...]:
    if fname not in LIST_SPECS:
        raise KeyError(f"no bundled split list named {fname!r}; have {bundled_names()}")
    with np.load(_BUNDLE) as z:
        rows = z[fname.replace(".txt", "")]
    fmt = _FORMATTERS[LIST_SPECS[fname]]
    return tuple(fmt(DATES[d], int(dr), int(fr)) for d, dr, fr in rows)


def bundled_list_lines(fname: str) -> List[str]:
    """Regenerate the exact lines of a bundled reference split list.

    Returns a fresh list each call (the cache holds an immutable tuple)
    so callers may mutate their copy freely.
    """
    return list(_cached_lines(fname))
