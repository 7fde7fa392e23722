#!/usr/bin/env python
"""Generate a Wild6D video-list file by scanning a dataset directory.

The reference ships per-category train/test list files whose lines are
`<object-index>_<sequence-index>` tokens indexing the *sorted* directory
listing (reference data/dataset_wild6d.py:49-57 resolves them exactly this
way; its shipped `*_list_all.txt` files are the full enumeration of the
downloaded split). This regenerates that enumeration from whatever subset
of Wild6D is on disk.

Usage:
  python scripts/gen_lists.py /data/Wild6D/laptop  config/wild6d/lists/laptop_train.txt
  python scripts/gen_lists.py /data/Wild6D/test_set/laptop config/wild6d/lists/laptop_test.txt
"""
from __future__ import annotations

import os
import sys


def enumerate_videos(root: str):
    """Yield `<obj_idx>_<seq_idx>` for every <root>/<obj>/<seq> with frames."""
    tokens = []
    objs = sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))
    for oi, obj in enumerate(objs):
        seqs = sorted(d for d in os.listdir(os.path.join(root, obj))
                      if os.path.isdir(os.path.join(root, obj, d)))
        for si, seq in enumerate(seqs):
            if os.path.isdir(os.path.join(root, obj, seq, "images")):
                tokens.append(f"{oi}_{si}")
    return tokens


def main(root: str, out_path: str) -> int:
    if not os.path.isdir(root):
        print(f"error: dataset directory not found: {root}", file=sys.stderr)
        return 2
    tokens = enumerate_videos(root)
    if not tokens:
        print(f"error: no <object>/<sequence>/images/ videos under {root}",
              file=sys.stderr)
        return 2
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(tokens) + "\n")
    print(f"{out_path}: {len(tokens)} videos from {root}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    raise SystemExit(main(sys.argv[1], sys.argv[2]))
