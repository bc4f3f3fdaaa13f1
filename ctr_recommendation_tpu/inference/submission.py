"""Kaggle submission writer.

Byte-format parity with the reference output (Prediction.py:120-126):
``prediction_fibinet.csv`` with columns ``ID`` (0-based row index) and
``Task2`` (click probability), zipped into ``submission_fibinet.zip``.
"""

from __future__ import annotations

import csv
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
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["ID", "Task2"])
        for i, p in enumerate(np.asarray(probs).ravel()):
            w.writerow([i, float(p)])
    zip_path = os.path.join(out_dir, zip_name)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        z.write(csv_path, arcname=csv_name)
    return csv_path, zip_path
