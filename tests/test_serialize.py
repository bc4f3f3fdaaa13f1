"""ExperimentConfig JSON roundtrip (self-describing checkpoints)."""

from ctr_recommendation_tpu.config import microlens_experiment, serialize


def test_roundtrip(tmp_path):
    exp = microlens_experiment(
        data_root="/data", model="xdeepfm", embedding_dim=64,
        batch_size=1024, optimizer="adamw",
    )
    path = str(tmp_path / "experiment.json")
    serialize.save(exp, path)
    back = serialize.load(path)
    assert back == exp
    assert back.model.model == "xdeepfm"
    assert back.model.hidden_units == exp.model.hidden_units
    assert back.dataset.features == exp.dataset.features
