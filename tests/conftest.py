"""Test configuration: CPU backend with 8 virtual devices (for sharding tests)
and float64 enabled (GPflow-parity numerics). Must run before jax imports."""

import os

# Force CPU: the ambient environment presets JAX_PLATFORMS=axon (the tunneled
# TPU), which is single-device and must not be contended by the test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize registers the axon (TPU) platform and rewrites
# jax_platforms to "axon,cpu" — force CPU-only again after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the suite is compile-dominated on CPU.
jax.config.update("jax_compilation_cache_dir", "/tmp/oak_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# --------------------------------------------------------------------------- #
# Test tiers (VERDICT r3 task 7): `pytest -m quick` is the fast iteration
# tier on this 1-core box (measured 3m36s warm-cache, round 5, with a TPU
# job's host side running concurrently); the bare `pytest tests/` full run
# is the gate. Slow = subprocess example/bench CLIs, multistart- and
# mesh-heavy programs, Pallas interpreter runs, f32 re-fit pipelines, and
# individually measured tests >~4-5.5 s (durations from the round-4 full
# run + the round-5 quick-tier run). Everything not slow is auto-marked
# quick, so the two tiers partition the suite.
# --------------------------------------------------------------------------- #
SLOW_FILES = {
    "test_examples.py",      # subprocess CLI runs
    "test_bench_cli.py",     # subprocess bench runs (except the pure-fn gate tests)
    "test_f32_pipeline.py",  # full re-fits under flipped x64
    "test_pallas_gram.py",   # Pallas interpreter-mode kernels
    "test_sharding.py",      # 8-device mesh programs
}
QUICK_EXCEPTIONS = {
    # pure-function tests inside slow files that cost milliseconds
    "test_gate_b2_same_basin_passes",
    "test_gate_b2_basin_mismatch_fails_with_diagnostic",
    "test_gate_b2_nll_tolerance_boundary",
}
SLOW_TESTS = {
    # measured >~4 s on this box (full-suite --durations, round 4)
    "test_known_answer_sobol",
    "test_known_answer_sobol_unshared_variance",
    "test_prediction_components_sum_to_mean",
    "test_sobol_by_order_matches_enumeration",
    "test_ladder_chunked_fallback",
    "test_L_gaussian_matches_monte_carlo",
    "test_routing_boundary_accurate_both_sides_of_switch",
    "test_routing_boundary_justifies_each_branch",
    "test_svgp_bernoulli_elbo_finite_and_differentiable",
    "test_sgpr_bound_below_lml_and_tight_at_Z_eq_X",
    "test_sgpr_posterior_stats_consistent",
    "test_oak_model_samples_bernoulli_probs",
    "test_oak_model_samples_original_units",
    "test_classification_first_class",
    "test_plot_smoke",
    "test_plot_smoke_mixed_types",
    "test_optimise_compile_flag",
    "test_fit_predict_beats_mean",
    "test_minibatch_training_improves",
    "test_latent_effect_mixed_types_excludes_discrete",
    "test_fused_hyper_gradient_matches_direct",
    "test_one_unit_step_recovers_sgpr_bound",
    "test_optimise_minibatch_natgrad",
    "test_oak_model_natgrad_optimizer",
    "test_full_q_model_checkpoint_roundtrip",
    "test_full_q_natgrad_stable_at_scale",
    "test_bernoulli_full_q_natgrad_stable_at_scale",
    "test_serialized_predict_with_uncertainty",
    "test_serialized_predict_matches_live",
    "test_serialized_bernoulli_probs",
    "test_serialized_bernoulli_uncertainty",
    "test_bernoulli_artifacts_mirror_live_apis",
    "test_lbfgs_multistart_checkpoint_resume",
    "test_optimise_restarts_entry_point",
    "test_multistart_mesh_sharded_matches_unsharded",
    "test_optimise_verbose_prints_tables",
    "test_compat_sobol_and_components_roundtrip",
    "test_gaussian_sampled_function_mean_zero",
    "test_config_minibatch_path",
    "test_config_builds_and_trains",
    "test_optimise_minibatch_checkpoint",
    # measured >=5.5 s on this box (quick-tier --durations, round 5) —
    # demoted so the quick tier stays a fast-iteration tier
    "test_natgrad_full_q_step_exact_through_custom_vjps",
    "test_diag_q_natgrad_diverges_at_scale",
    "test_optimise_minibatch_natgrad_checkpoint",
    "test_tri_inv_dispatch_takes_blocked_route_above_crossover",
    "test_optimise_minibatch_natgrad_mesh",
    "test_fused_and_staggered_q_update_identical",
    "test_diag_natgrad_improves",
    "test_lbfgs_checkpoint_resume",
    "test_oak_model_restarts_with_adam_and_natgrad",
    "test_fit_restarts_kwarg",
    "test_svgp_posterior_stats_consistent",
    "test_gpr_training_grad_unchanged_by_custom_vjp",
    "test_gpr_samples_match_posterior",
    "test_minibatch_inherits_model_optimizer",
    "test_export_predict_matches_predict",
    "test_routing_boundary_branch_overlap_window",
    "test_serialized_predict_from_disk",
    "test_optimise_minibatch_mesh_checkpoint",
    "test_mixed_feature_types_serving",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast iteration tier (pytest -m quick, ~3.5 min)")
    config.addinivalue_line(
        "markers", "slow: excluded from the quick tier")


def pytest_collection_modifyitems(config, items):
    import pathlib

    for item in items:
        fname = pathlib.Path(str(item.fspath)).name
        name = getattr(item, "originalname", None) or item.name.split("[")[0]
        slow = ((fname in SLOW_FILES and name not in QUICK_EXCEPTIONS)
                or name in SLOW_TESTS)
        item.add_marker(pytest.mark.slow if slow else pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
