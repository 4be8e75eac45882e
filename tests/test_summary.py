"""Parameter-summary parity: the reference prints a gpflow parameter table
around optimisation (model_utils.py:174,416,426); oak_tpu exposes the same
inspection surface via utils.summary / oak_model.summary()."""

import numpy as np

from oak_tpu import oak_model
from oak_tpu.utils import parameter_table, print_summary, summary_string


def _fitted(rng, n=32, d=2):
    X = rng.normal(size=(n, d))
    y = (X[:, 0] + 0.1 * rng.normal(size=n)).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=2)
    oak.fit(X, y, optimise=False)
    return oak


def test_parameter_table_rows(rng):
    oak = _fitted(rng)
    rows = parameter_table(oak.m)
    names = [r[0] for r in rows]
    # kernel lengthscales, per-order variances, likelihood variance all appear
    assert any("lengthscale" in n for n in names)
    assert any("variance" in n for n in names)
    # every row: (name, class, transform, prior, trainable, shape, dtype,
    # value) — the gpflow print_summary column set
    for r in rows:
        assert len(r) == 8
        assert r[1] == "Param"
        assert r[4] in ("True", "False")
    # the order variances carry the reference's Gamma(1, 0.2) sparsity-style
    # prior only when sparsity_prior is set; lengthscales are Sigmoid-bounded
    transforms = {r[0]: r[2] for r in rows}
    assert any(t.startswith("Sigmoid") for t in transforms.values())
    assert any(t.startswith("Softplus") for t in transforms.values())


def test_summary_string_and_print(rng, capsys):
    oak = _fitted(rng)
    s = summary_string(oak.m)
    assert "name" in s and "transform" in s and "trainable" in s
    assert s == oak.summary()
    print_summary(oak.m, fmt="notebook")
    out = capsys.readouterr().out
    assert "lengthscale" in out or "variance" in out


def test_values_are_constrained(rng):
    oak = _fitted(rng)
    rows = parameter_table(oak.m)
    # constrained values: every Softplus/Sigmoid-transformed entry positive
    for name, _cls, transform, _, _, _, _, value in rows:
        if transform.startswith(("Softplus", "Sigmoid")):
            first = float(value.strip("[]").split(",")[0])
            assert first > 0.0, (name, value)


def test_sigmoid_bounds_always_shown(rng):
    """An explicitly-set Sigmoid(low=0, high=h) bound keeps its low in the
    table (ADVICE r2): only Softplus's default low=0.0 is suppressed."""
    oak = _fitted(rng)
    rows = parameter_table(oak.m)
    sigmoids = [r[2] for r in rows if r[2].startswith("Sigmoid")]
    assert sigmoids, "expected Sigmoid-bounded lengthscales"
    for t in sigmoids:
        assert "low=" in t and "high=" in t, t
    softplus = [r[2] for r in rows if r[2].startswith("Softplus")]
    # default Softplus prints bare; non-default floors (e.g. the likelihood
    # variance's low=1e-6) keep their bound
    assert "Softplus" in softplus
    assert all(t == "Softplus" or "low=" in t for t in softplus)
    assert not any("low=0)" in t for t in softplus)


def test_optimise_verbose_prints_tables(rng, capsys):
    X = rng.normal(size=(16, 2))
    y = (X[:, 0]).reshape(-1, 1)
    oak = oak_model(max_interaction_depth=1, optimizer="scipy")
    oak.fit(X, y, optimise=False)
    oak.optimise(max_iters=1, compile=False, verbose=True)
    out = capsys.readouterr().out
    assert "Model prior to optimisation" in out
    assert "Training took" in out
    assert out.count("trainable") >= 2  # table shown before AND after


def test_empty_tree_summary():
    assert summary_string(np.zeros(3)) == "(no parameters)"


def test_compat_print_summary(rng, capsys):
    # reference call sites use gpflow.utilities.print_summary(m, fmt="notebook")
    from oak_tpu import compat

    oak = _fitted(rng)
    compat.print_summary(oak.m, fmt="notebook")
    assert "trainable" in capsys.readouterr().out
