"""Failure recovery under a REAL preemption (SURVEY §5.3).

The reference loses everything since the last best-AUC export on a crash
(train_fibinet.py:148-152). Here: launch the train CLI as a subprocess,
SIGKILL it after its first full-state epoch checkpoint lands (an actual
preemption, not a simulated flag), then relaunch with --resume and assert
training continues from the checkpoint and finishes all epochs.
"""

import pytest

import os
import signal
import subprocess
import sys
import time

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import jax; jax.config.update("jax_platforms", "cpu")
from ctr_recommendation_tpu.cli.train import main
main([
    "--synthetic", {data!r}, "--synthetic-rows", "6000",
    "--epochs", "4", "--embedding-dim", "16", "--batch-size", "256",
    "--checkpoint-dir", {ckpt!r}, "--no-pallas",
] + {extra!r})
"""


def _launch(data, ckpt, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, "-c", SCRIPT.format(data=data, ckpt=ckpt, extra=list(extra))],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env,
    )


def _epoch_checkpoints(ckpt):
    try:
        return sorted(
            int(d) for d in os.listdir(ckpt) if d.isdigit()
        )
    except FileNotFoundError:
        return []


def test_kill_and_resume_completes_training(tmp_path):
    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")

    proc = _launch(data, ckpt)
    try:
        # wait for the first epoch's full-state checkpoint, then preempt
        deadline = time.time() + 240
        while time.time() < deadline:
            if _epoch_checkpoints(ckpt):
                break
            if proc.poll() is not None:
                out, _ = proc.communicate()
                raise AssertionError(f"train exited early:\n{out[-2000:]}")
            time.sleep(0.5)
        else:
            raise AssertionError("no epoch checkpoint appeared within 240s")
        time.sleep(0.5)  # let the checkpoint write settle
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
    killed_at = max(_epoch_checkpoints(ckpt))
    assert killed_at >= 1

    # resume: must pick up at the checkpoint and run only the remaining epochs
    proc2 = _launch(data, ckpt, extra=["--resume"])
    out, _ = proc2.communicate(timeout=420)
    assert proc2.returncode == 0, out[-2000:]
    assert "[resume]" in out, out[-2000:]
    assert "Done. Best auc" in out, out[-2000:]
    # all 4 epochs' full-state checkpoints exist across the two runs
    assert max(_epoch_checkpoints(ckpt)) == 4
    # the resumed run did not redo epoch `killed_at` from scratch
    assert f"[resume] epoch {killed_at}" in out
