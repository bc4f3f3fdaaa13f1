"""Train-on-pod / serve-on-one-chip: a checkpoint trained with
model_parallel>1 must restore and score on a host with FEWER devices.

The serving CLIs rebuild the experiment from the checkpoint's
experiment.json, which records the TRAINING mesh; before the fix they fed it
straight to make_mesh, which raises when this host's device count cannot
cover the training layout (e.g. mp=2 on a 1-device serving host). The CLIs
must force a replicated serving mesh instead (cli/predict.py, cli/evaluate.py).
"""

import dataclasses
import os
import subprocess
import sys

import pytest

from ctr_recommendation_tpu.config import microlens_experiment
from ctr_recommendation_tpu.config.loader import microlens_features
from ctr_recommendation_tpu.config.schema import MeshConfig
from ctr_recommendation_tpu.data import write_synthetic_dataset

pytestmark = pytest.mark.slow  # excluded from `pytest -m 'not slow'` inner loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PREDICT_1DEV = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")  # 1 CPU device — smaller than mp=2
from ctr_recommendation_tpu.cli.predict import main as pmain
from ctr_recommendation_tpu.cli.evaluate import main as emain
root, ckpt, out = sys.argv[1:4]
assert len(jax.devices()) == 1, jax.devices()
rc = pmain(["--data-root", root, "--checkpoint-dir", ckpt,
            "--out-dir", out, "--batch-size", "512"])
assert rc == 0, rc
rc = emain(["--data-root", root, "--checkpoint-dir", ckpt,
            "--split", "valid", "--batch-size", "512"])
assert rc == 0, rc
print("SERVE_OK")
"""


def test_mp2_checkpoint_serves_on_single_device(tmp_path):
    root = tmp_path / "data"
    ckpt = tmp_path / "ckpt"
    write_synthetic_dataset(
        str(root), num_rows=4000, num_items=400, max_len=8, mm_dim=24, seed=3
    )
    exp = microlens_experiment(
        data_root=str(root),
        embedding_dim=16,
        hidden_units=(32, 16),
        batch_size=256,
        epochs=1,
        max_len=8,
        use_pallas=False,
        checkpoint_dir=str(ckpt),
        log_every=1000,
    )
    exp = exp.replace(
        dataset=dataclasses.replace(
            exp.dataset,
            features=microlens_features(
                item_vocab=401, cate_vocab=11, max_len=8, mm_dim=24
            ),
        ),
        mesh=MeshConfig(model_parallel=2),  # row-sharded tables in training
    )
    from ctr_recommendation_tpu.cli.train import run_training

    assert run_training(exp) == 0
    assert (ckpt / "experiment.json").exists()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # no forced device count: exactly 1 CPU device
    out = subprocess.run(
        [
            sys.executable, "-c", _PREDICT_1DEV,
            str(root), str(ckpt), str(tmp_path / "out"),
        ],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SERVE_OK" in out.stdout
    assert (tmp_path / "out" / "submission_fibinet.zip").exists()
