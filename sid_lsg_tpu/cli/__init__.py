"""CLI entry points mirroring the reference's surface:

  python -m sid_lsg_tpu.cli.sid_train ...          (reference sid_train.py)
  python -m sid_lsg_tpu.cli.generate_onestep ...   (reference generate_onestep.py)
  python -m sid_lsg_tpu.cli.generate_hpsv2 ...     (reference generate_hpsv2.py)
  python -m sid_lsg_tpu.cli.sid_metrics ...        (metric evaluation)
  python -m sid_lsg_tpu.cli.dataset_tool ...       (dataset prep)
  python -m sid_lsg_tpu.cli.cocodataset_tool ...   (COCO eval-set prep)
"""

from typing import List


def parse_int_list(s) -> List[int]:
    """'1,2,5-10' -> [1,2,5,...,10] (reference sid_train.py:33)."""
    if isinstance(s, (list, tuple)):
        return list(s)
    out: List[int] = []
    for part in str(s).split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part[1:]:
            lo, hi = part.split("-", 1)
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    return out
