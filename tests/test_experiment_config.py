"""Experiment config dataclasses: JSON round-trip, model construction, and a
config-driven training fold (SURVEY §5 config-system obligation)."""

import numpy as np

from oak_tpu.experiment import ExperimentConfig, FitConfig, ModelConfig


def test_config_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(
        dataset_name="servo", task="regression", k_folds=3, seed=11,
        model=ModelConfig(max_interaction_depth=3, num_inducing=64,
                          binary_feature=[0], lengthscale_bounds=[1e-2, 1e2],
                          likelihood="gaussian"),
        fit=FitConfig(max_iters=77, minibatch=True, batch_size=32, steps=10),
    )
    p = tmp_path / "config.json"
    cfg.save(p)
    loaded = ExperimentConfig.load(p)
    assert loaded == ExperimentConfig.from_json(cfg.to_json())
    assert loaded.model.max_interaction_depth == 3
    assert loaded.model.binary_feature == [0]
    assert loaded.fit.batch_size == 32
    assert loaded.seed == 11


def test_config_builds_and_trains(rng):
    X = rng.normal(size=(60, 2))
    y = (np.sin(X[:, 0]) + X[:, 1]).reshape(-1, 1)
    cfg = ExperimentConfig(
        model=ModelConfig(max_interaction_depth=2),
        fit=FitConfig(max_iters=30),
    )
    oak = cfg.run_fold(X, y)
    pred = oak.predict(X)
    assert np.sqrt(np.mean((pred - y[:, 0]) ** 2)) < np.std(y)


def test_config_minibatch_path(rng):
    X = rng.normal(size=(80, 2))
    y = (X[:, 0] > 0).astype(np.float64)
    cfg = ExperimentConfig(
        model=ModelConfig(max_interaction_depth=1, num_inducing=8,
                          likelihood="bernoulli", use_normalising_flow=False),
        fit=FitConfig(minibatch=True, batch_size=16, steps=5),
    )
    oak = cfg.run_fold(X, y)
    assert np.isfinite(oak.predict_proba(X)).all()
