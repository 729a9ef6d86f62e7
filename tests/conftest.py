"""Test environment: 8 virtual CPU devices + float64.

The TPU analogue of the reference's laptop `mpirun -np 1..4` testing
(main.c:2-5 comments): a fake 8-device mesh on the host CPU so the
shard_map distributed path is exercised without hardware, and x64 so
convergence tests can reach the reference's 1e-12..1e-15 tolerances.

Set MBT_TEST_PLATFORM=tpu to run the suite against the real chip
instead (single device — the distributed tests then need the virtual
mesh and will error; run single-device files only). x64 stays on: host
staging uses f64, device arrays are created with explicit dtypes.
"""
import os

_PLATFORM = os.environ.get("MBT_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel) via a
# sitecustomize hook; override after import so tests run on the fake
# 8-device CPU mesh (or the requested platform) regardless.
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("MBT_X64", "1") != "0":
    # MBT_X64=0 is for the on-chip compiled-kernel run (-m chip):
    # Mosaic rejects nonzero lane-shift rolls under x64, so the chip
    # kernel tests need a process with x64 OFF. Everything precision-
    # sensitive is deselected by the marker in that run.
    jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

# ---------------------------------------------------------------------
# Test tiers (round-5 VERDICT #6): the full suite takes ~16 min of CPU
# time (the 8-virtual-device and large-n cases dominate), which no CI
# budget can confirm wholesale. Tests measured >= 2.5 s single-core are
# auto-marked `slow`; `-m "not slow"` is the ~3-minute smoke tier, the
# full (unfiltered) suite remains the bar. Durations source:
# `pytest --durations=0` on the round-5 1-CPU box; re-measure and edit
# this list when tests move across the threshold.
_SLOW_TESTS = frozenset({
    "test_batched.py::test_batched_df32",
    "test_batched.py::test_batched_distributed",
    "test_batched.py::test_batched_fused_matches_vmap",
    "test_batched.py::test_batched_fully_fused_matches_vmap",
    "test_batched.py::test_batched_fully_fused_multichunk_stash",
    "test_batched.py::test_batched_lane_restarts",
    "test_batched.py::test_batched_lane_restarts_distributed",
    "test_batched.py::test_batched_with_precond",
    "test_bench.py::test_tol0_runs_exactly_max_iter_every_method",
    "test_bench.py::test_tol0_shifted_runs_exactly_max_iter",
    "test_bench.py::test_tol0_survives_exact_zero_residual",
    "test_bicgstab_l.py::test_df32_and_batched",
    "test_butterfly.py::test_df32_pallas_pipeline_interpret_matches",
    "test_butterfly.py::test_distributed_butterfly_df32",
    "test_butterfly.py::test_pallas_interpret_matches_matvec",
    "test_cheby.py::test_bounds_are_safe",
    "test_cheby.py::test_cheby_cuts_iterations",
    "test_cheby.py::test_cheby_df32",
    "test_cheby.py::test_cheby_distributed_matches",
    "test_cheby.py::test_fused_chain_covers_unaligned_sizes",
    "test_cheby.py::test_fused_chain_df_matches_xla",
    "test_cheby.py::test_fused_chain_matches_xla",
    "test_checkpoint.py::test_switching_carry_resume_bit_identical",
    "test_cli_flags.py::test_cli_selftest_passes",
    "test_dia.py::test_hybrid_split_and_spmv",
    "test_distributed.py::test_blocked_switching_distributed",
    "test_distributed.py::test_df32_pipe_fused_bodies_distributed",
    "test_distributed.py::test_distributed_solve_ring_halo",
    "test_distributed.py::test_f32_halo_fused_classic_distributed",
    "test_distributed.py::test_f32_halo_fused_pipe_distributed",
    "test_fused_pipe.py::test_ca_df_fused_solver_matches_xla",
    "test_fused_pipe.py::test_classic_df_fused_solver_matches_xla",
    "test_fused_pipe.py::test_classic_df_kernels_match_xla",
    "test_fused_pipe.py::test_classic_fused_wide_band_margins",
    "test_fused_pipe.py::test_df32_full_fused_solver_matches_xla_pipe",
    "test_fused_pipe.py::test_df32_full_phase_a_matches_xla",
    "test_fused_pipe.py::test_df32_full_phase_b_matches_xla",
    "test_fused_pipe.py::test_df32_fused_solver_matches_xla_pipe",
    "test_fused_pipe.py::test_rr_fused_df_solver_matches_xla_and_rr_fires",
    "test_fused_pipe.py::test_rr_fused_solver_matches_xla_and_rr_fires",
    "test_layout_sweep.py::test_auto_layout_spmv_df32",
    "test_layout_sweep.py::test_auto_layout_spmv_f64",
    "test_multihost.py::test_two_process_classic_solve",
    "test_multihost.py::test_two_process_shifted_switching_solve",
    "test_precision.py::test_df32_shifted_distributed",
    "test_precision.py::test_df32_shifted_family",
    "test_refine.py::test_refine_distributed_mesh",
    "test_refine.py::test_solve_then_refine_df32",
    "test_rr_recovery.py::test_rr_fires_and_recovers_at_scale",
    "test_shifted.py::test_seed_true_relres_reported",
    "test_sigma_mesh.py::test_sigma_sharded_blocked_flush",
    "test_sigma_mesh.py::test_sigma_sharded_matches_row_only",
    "test_sigma_mesh.py::test_sigma_sharded_refine_composes",
    "test_sigma_mesh.py::test_sigma_sharded_switching_bitexact",
    "test_sigma_mesh.py::test_sigma_sharded_switching_df32",
    "test_switching.py::test_blocked_matches_per_iteration",
    "test_switching.py::test_blocked_switching_across_switch",
    "test_switching.py::test_shift_relres_matches_nonswitching_estimates",
    "test_window_ell.py::test_df32_solver_on_clustered_matrix",
    "test_window_ell.py::test_distributed_window_df32",
    "test_window_ell.py::test_distributed_window_solve_matches_single_device",
    "test_window_ell.py::test_distributed_window_spmv_exact",
    "test_window_ell.py::test_solver_on_clustered_matrix",
})


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
