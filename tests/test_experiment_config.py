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


def test_dataset_loader_records_provenance():
    """Artifact consumers must be able to detect synthetic stand-in data
    without reading prose (VERDICT r1): the loaders return a machine-readable
    provenance record, threaded into config.json and out_*.npz."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "examples" / "uci"))
    try:
        from datasets import load_classification, load_regression
    finally:
        sys.path.pop(0)

    X, y, prov = load_regression("autoMPG")
    assert prov["data_provenance"] in ("real_mat", "synthetic_standin")
    assert prov["shape"] == [392, 7] and X.shape == (392, 7)
    if prov["data_provenance"] == "synthetic_standin":
        assert prov["generator_seed"] == 0 and prov["path"] is None
    Xc, yc, provc = load_classification("breast")
    assert provc["data_provenance"] in ("real_mat", "synthetic_standin")
    assert Xc.shape == (449, 9)

    from oak_tpu.experiment import ExperimentConfig

    cfg = ExperimentConfig(data_provenance=prov)
    rt = ExperimentConfig.from_json(cfg.to_json())
    assert rt.data_provenance == prov
