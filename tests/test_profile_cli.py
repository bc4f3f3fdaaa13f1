"""--profile-dir: one traced epoch, trace files written, no training run.

Covers Trainer.profile_epoch + the CLI wiring (SURVEY §5.1 tracing
subsystem), which was previously exercised only by hand on the chip.
"""

import pytest

import glob
import os

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop


def test_profile_dir_writes_device_trace(tmp_path):
    from ctr_recommendation_tpu.cli.train import main

    prof = tmp_path / "prof"
    rc = main([
        "--synthetic", str(tmp_path / "data"), "--synthetic-rows", "4000",
        "--epochs", "1", "--embedding-dim", "16", "--batch-size", "512",
        "--no-pallas", "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--profile-dir", str(prof),
    ])
    assert rc == 0
    # jax.profiler writes plugins/profile/<ts>/*.xplane.pb (+ trace json)
    planes = glob.glob(str(prof / "plugins" / "profile" / "*" / "*.xplane.pb"))
    assert planes, f"no xplane trace under {prof}: {list(os.walk(str(prof)))}"
    # profiling mode must NOT have produced training epochs
    assert not os.path.exists(tmp_path / "ckpt" / "metrics.csv")
