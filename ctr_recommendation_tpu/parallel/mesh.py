"""Device mesh construction.

One mesh, two axes (SURVEY §2.3): ``data`` shards the batch (the TPU-native
replacement for the reference's torch.nn.DataParallel, train_fibinet.py:69-70);
``model`` shards embedding-table rows. Dense tower params stay replicated.
Multi-host: call ``jax.distributed.initialize()`` before building the mesh —
the mesh then spans all processes' devices and XLA routes collectives over
ICI/DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ctr_recommendation_tpu.config.schema import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp != n:
        raise ValueError(
            f"mesh {dp}x{mp} does not cover {n} devices "
            f"(data_parallel={cfg.data_parallel}, model_parallel={cfg.model_parallel})"
        )
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, cfg.axis_names)


def single_device_mesh(axis_names=("data", "model")) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), axis_names)
