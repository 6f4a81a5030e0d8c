"""stat.csv logging with the reference's exact file format.

Reference ``save_result_stat`` (src/util.py:853-866): appends one row per
call to ``<ckpt_path>/stat.csv`` via pandas with columns
``['', 'info'] + sorted(stat keys)`` (the unnamed first column is the
pandas index, always 0).
"""

from __future__ import annotations

import os
from typing import Dict

import pandas as pd


def save_result_stat(stat: Dict[str, float], ckpt_path: str,
                     info: str = "Default") -> None:
    stat = {k: float(v) for k, v in stat.items()}
    stat_path = os.path.join(ckpt_path, "stat.csv")
    columns = ["info"] + sorted(k for k in stat.keys())
    if not os.path.exists(stat_path):
        pd.DataFrame(columns=columns).to_csv(stat_path, mode="a", header=True)
    row = {"info": [info]}
    row.update({k: [v] for k, v in stat.items()})
    df = pd.DataFrame.from_dict(row)[columns]
    df.to_csv(stat_path, mode="a", header=False)
