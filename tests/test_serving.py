"""Serving export (serving.py): the serialized AOT predict artifact
round-trips through bytes/disk, matches the live model's predictions, and
its symbolic batch dimension serves any batch size from one artifact."""

import numpy as np

from oak_tpu.model import oak_model
from oak_tpu.serving import deserialize_predict, serialize_predict


def _fitted(rng, likelihood="gaussian"):
    X = rng.normal(size=(60, 3))
    if likelihood == "bernoulli":
        y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float).reshape(-1, 1)
        oak = oak_model(max_interaction_depth=2, likelihood="bernoulli")
        oak.fit(X, y, optimise=False)
        oak.optimise(max_iters=25)
    else:
        y = (np.sin(X[:, 0]) + 0.3 * X[:, 1]).reshape(-1, 1) \
            + 0.05 * rng.normal(size=(60, 1))
        oak = oak_model(max_interaction_depth=2)
        oak.fit(X, y, optimise=False)
        oak.optimise(max_iters=40)
    return oak, X


def test_serialized_predict_matches_live(rng, tmp_path):
    oak, X = _fitted(rng)
    p = tmp_path / "predict.jaxexp"
    blob = serialize_predict(oak, path=p)
    assert p.read_bytes() == blob

    f = deserialize_predict(blob)
    live = oak.predict(X, clip=True)
    served = np.asarray(f(X.astype(np.float32)))
    # artifact is f32; live path runs the suite's f64 — tolerance accordingly
    np.testing.assert_allclose(served, live, rtol=1e-4, atol=1e-4)

    # same artifact, different batch sizes (symbolic batch dim)
    for n in (1, 7, 33):
        out = np.asarray(f(X[:n].astype(np.float32)))
        np.testing.assert_allclose(out, live[:n], rtol=1e-4, atol=1e-4)


def test_serialized_predict_from_disk(rng, tmp_path):
    oak, X = _fitted(rng)
    p = tmp_path / "predict.jaxexp"
    serialize_predict(oak, path=p)
    f = deserialize_predict(p)
    np.testing.assert_allclose(np.asarray(f(X.astype(np.float32))),
                               oak.predict(X, clip=True), rtol=1e-4, atol=1e-4)


def test_serialized_bernoulli_probs(rng, tmp_path):
    oak, X = _fitted(rng, likelihood="bernoulli")
    f = deserialize_predict(serialize_predict(oak))
    served = np.asarray(f(X.astype(np.float32)))
    live = oak.predict(X, clip=True)
    np.testing.assert_allclose(served, live, rtol=1e-3, atol=1e-3)
    assert served.min() >= 0.0 and served.max() <= 1.0


def test_serialized_predict_with_uncertainty(rng):
    oak, X = _fitted(rng)
    f = deserialize_predict(serialize_predict(oak, include_var=True))
    mean, std = f(X.astype(np.float32))
    mean, std = np.asarray(mean), np.asarray(std)
    np.testing.assert_allclose(mean, oak.predict(X, clip=True),
                               rtol=1e-4, atol=1e-4)
    # std in original units: latent std scaled by the target scaler
    Xs = oak._transform_x(np.clip(X, oak.xmin, oak.xmax))
    _, var = oak.m.predict_f(Xs)
    expect = np.sqrt(np.asarray(var))[:, 0] * oak.scaler_y.scale_[0]
    np.testing.assert_allclose(std, expect, rtol=1e-3, atol=1e-5)
    assert (std > 0).all()


def test_serialized_bernoulli_uncertainty(rng):
    oak, X = _fitted(rng, likelihood="bernoulli")
    f = deserialize_predict(serialize_predict(oak, include_var=True))
    p, std = (np.asarray(a) for a in f(X.astype(np.float32)))
    np.testing.assert_allclose(std, np.sqrt(p * (1 - p)), rtol=1e-3, atol=1e-4)


def test_bernoulli_artifacts_mirror_live_apis(rng):
    # mean-only == predict (plug-in invlink); (mean, std) == predict_proba
    # (posterior predictive) — deliberately different probabilities
    oak, X = _fitted(rng, likelihood="bernoulli")
    Xf = X.astype(np.float32)
    plug = np.asarray(deserialize_predict(serialize_predict(oak))(Xf))
    post, _ = (np.asarray(a) for a in
               deserialize_predict(serialize_predict(oak, include_var=True))(Xf))
    np.testing.assert_allclose(plug, oak.predict(X, clip=True),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(post, oak.predict_proba(X, clip=True),
                               rtol=1e-3, atol=1e-3)


def test_multiplatform_export(rng):
    # one artifact lowered for both cpu and tpu loads on the cpu suite
    oak, X = _fitted(rng)
    blob = serialize_predict(oak, platforms=("cpu", "tpu"))
    f = deserialize_predict(blob)
    np.testing.assert_allclose(np.asarray(f(X.astype(np.float32))),
                               oak.predict(X, clip=True), rtol=1e-4, atol=1e-4)


def test_checkpoint_reload_then_serialize_matches(rng, tmp_path):
    # full deployment chain: train -> save checkpoint -> reload in a "new
    # process" -> serialize artifact -> serve; predictions match the
    # original live model end to end
    from oak_tpu import load_oak_model

    oak, X = _fitted(rng)
    ck = tmp_path / "model.npz"
    oak.save(ck)
    oak2 = load_oak_model(ck)
    f = deserialize_predict(serialize_predict(oak2))
    np.testing.assert_allclose(np.asarray(f(X.astype(np.float32))),
                               oak.predict(X, clip=True), rtol=1e-4, atol=1e-4)


def test_mixed_feature_types_serving(rng):
    # binary + categorical + continuous features through the full serving
    # chain (flows skipped on discrete dims, gathers lowered into the artifact)
    from oak_tpu.model import oak_model

    n = 80
    Xc = rng.normal(size=(n, 2))
    Xb = (rng.random(n) > 0.4).astype(float)
    Xcat = rng.integers(0, 3, size=n).astype(float)
    X = np.column_stack([Xc, Xb, Xcat])
    y = (np.sin(X[:, 0]) + 0.5 * Xb + 0.3 * Xcat).reshape(-1, 1) \
        + 0.05 * rng.normal(size=(n, 1))
    oak = oak_model(max_interaction_depth=2, binary_feature=[2],
                    categorical_feature=[3])
    oak.fit(X, y, optimise=False)
    oak.optimise(max_iters=30)
    f = deserialize_predict(serialize_predict(oak))
    np.testing.assert_allclose(np.asarray(f(X.astype(np.float32))),
                               oak.predict(X, clip=True), rtol=1e-3, atol=1e-3)
