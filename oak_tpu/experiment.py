"""Experiment configuration: one dataclass tree (model + fit + experiment)
serialized as JSON alongside outputs and checkpoints.

The reference has no config system — two argparse flags per script and magic
numbers inline (SURVEY §5: N>1000 sparse threshold model_utils.py:374,
num_inducing defaults, seeds 4/44, likelihood var 0.01, Gamma(1,0.2)). This
module gives those knobs one typed home while keeping the ``oak_model``
kwarg surface as the public API: ``ModelConfig`` mirrors the constructor
kwargs 1:1 (model_utils.py:195-208), ``FitConfig`` the optimise/minibatch
options, ``ExperimentConfig`` the script-level choices.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Sequence


@dataclasses.dataclass
class ModelConfig:
    """Constructor kwargs of ``oak_model`` (reference model_utils.py:195-208)."""

    max_interaction_depth: int = 2
    num_inducing: int = 200
    lengthscale_bounds: Optional[Sequence[float]] = (1e-3, 1e3)
    binary_feature: Optional[List[int]] = None
    categorical_feature: Optional[List[int]] = None
    empirical_measure: Optional[List[int]] = None
    use_sparsity_prior: bool = True
    gmm_measure: Optional[List[int]] = None
    sparse: bool = False
    use_normalising_flow: bool = True
    share_var_across_orders: bool = True
    likelihood: str = "gaussian"
    optimizer: str = "lbfgs"

    def build(self):
        from .model import oak_model

        return oak_model(**dataclasses.asdict(self))


@dataclasses.dataclass
class FitConfig:
    optimise: bool = True
    max_iters: int = 500
    compile: bool = True
    # parallel multi-start L-BFGS (optim/multistart.py); 0 = single start
    # with the degenerate-fit fallback
    restarts: int = 0
    # minibatch (SVGP) options; used when minibatch=True
    minibatch: bool = False
    batch_size: int = 256
    steps: int = 2000
    learning_rate: float = 1e-2
    seed: int = 0

    def run(self, oak, X, Y, mesh=None):
        """fit + optimise an oak_model according to this config.
        ``optimise`` is the train/no-train switch for BOTH modes; with it
        off, ``minibatch`` is ignored."""
        oak.fit(X, Y, optimise=False)
        if not self.optimise:
            return oak
        if self.minibatch:
            oak.optimise_minibatch(batch_size=self.batch_size, steps=self.steps,
                                   lr=self.learning_rate, seed=self.seed,
                                   mesh=mesh)
        else:
            oak.optimise(max_iters=self.max_iters, compile=self.compile,
                         restarts=self.restarts)
        return oak


def artifact_provenance(path) -> dict:
    """Machine-readable provenance of a per-fold metrics artifact
    (``out_<fold>.npz``).

    Both this repo's UCI scripts and the reference's
    (uci_regression_train.py:183-190 / uci_classification_train.py:214-220)
    write per-fold npz metric files with shared field names. Ours
    additionally stamp ``synthetic`` (bool) and ``data_generator_seed`` so a
    consumer diffing artifacts cross-repo can detect synthetic stand-in data
    without reading prose docs. Reference-written files carry neither field:
    they are reported as ``{"synthetic": None, "source": "reference-layout"}``
    — unknown provenance, NOT assumed real.
    """
    import numpy as np

    with np.load(Path(path), allow_pickle=True) as d:
        if "synthetic" in d.files:
            seed = (int(d["data_generator_seed"])
                    if "data_generator_seed" in d.files else None)
            return {
                "synthetic": bool(d["synthetic"]),
                "generator_seed": (None if seed in (None, -1) else seed),
                "source": "oak_tpu",
                "fields": sorted(d.files),
            }
        return {
            "synthetic": None,
            "generator_seed": None,
            "source": "reference-layout",
            "fields": sorted(d.files),
        }


@dataclasses.dataclass
class ExperimentConfig:
    """Script-level experiment description (dataset, CV, outputs)."""

    dataset_name: str = "autoMPG"
    task: str = "regression"  # or "classification"
    k_folds: int = 5
    seed: int = 4  # the reference's data-shuffle seed (uci_*_train.py)
    output_dir: Optional[str] = None
    # which branch fed the run: {"data_provenance": "real_mat" |
    # "synthetic_standin", "path", "generator_seed", "shape"} — stamped by
    # the UCI scripts so committed artifacts are machine-distinguishable
    # from real-data runs
    data_provenance: Optional[dict] = None
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    fit: FitConfig = dataclasses.field(default_factory=FitConfig)

    # ------------------------------------------------------------------ #
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=list)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        model = ModelConfig(**raw.pop("model", {}))
        fit = FitConfig(**raw.pop("fit", {}))
        return cls(model=model, fit=fit, **raw)

    def save(self, path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(self.to_json())

    @classmethod
    def load(cls, path) -> "ExperimentConfig":
        return cls.from_json(Path(path).read_text())

    # ------------------------------------------------------------------ #
    def build_model(self):
        return self.model.build()

    def run_fold(self, X_train, y_train, mesh=None):
        """Build + train one fold's model."""
        return self.fit.run(self.build_model(), X_train, y_train, mesh=mesh)
