"""Multi-chip (virtual 8-device CPU mesh) data-parallel training tests: the
sharded ELBO step agrees with the single-device step and improves the loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oak_tpu.kernels import OAKKernel
from oak_tpu.models import SVGP, Gaussian
from oak_tpu.parallel import data_parallel_elbo_step, make_mesh, shard_batch
from oak_tpu.params import flatten_trainable


def _setup(rng, n=64, d=3, m=8):
    X = rng.normal(size=(n, d))
    y = (np.sin(X[:, 0]) + X[:, 1]).reshape(-1, 1)
    k = OAKKernel.create(num_dims=d, max_interaction_depth=2,
                         use_sparsity_prior=True)
    model = SVGP.create(k, Gaussian.create(0.1), X[:m].copy(), num_data=n)
    return model, jnp.asarray(X), jnp.asarray(y)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device(rng):
    model, X, Y = _setup(rng)
    mesh = make_mesh(8)
    Xs, Ys = shard_batch(mesh, X, Y)
    step, (vec, opt_state, unflatten) = data_parallel_elbo_step(model, mesh,
                                                               learning_rate=1e-2)
    vec1, _, loss_dp = step(vec, opt_state, Xs, Ys)

    # single-device reference value of the same loss
    vec0, unflatten0 = flatten_trainable(model)
    loss_ref = unflatten0(vec0).training_loss(X, Y)
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-8)


def test_dp_training_improves(rng):
    model, X, Y = _setup(rng)
    mesh = make_mesh(8)
    Xs, Ys = shard_batch(mesh, X, Y)
    step, (vec, opt_state, unflatten) = data_parallel_elbo_step(model, mesh,
                                                               learning_rate=5e-2)
    losses = []
    for _ in range(20):
        vec, opt_state, loss = step(vec, opt_state, Xs, Ys)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dp_works_on_subset_mesh(rng):
    model, X, Y = _setup(rng, n=32)
    mesh = make_mesh(4)
    Xs, Ys = shard_batch(mesh, X, Y)
    step, (vec, opt_state, _) = data_parallel_elbo_step(model, mesh)
    _, _, loss = step(vec, opt_state, Xs, Ys)
    assert np.isfinite(float(loss))
