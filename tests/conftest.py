"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the multi-device test strategy called for in SURVEY.md §4 — DP/mesh
logic is exercised without TPU hardware via
--xla_force_host_platform_device_count.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# the axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS from the environment; re-assert CPU for tests
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: reruns of the suite skip XLA compilation of the
# unchanged model/step programs (the dominant cost of the slow test files).
from sodt_tpu.utils.general import enable_compile_cache  # noqa: E402

enable_compile_cache()

import pytest  # noqa: E402

# Tests measured >= 5 s single-core with a WARM compile cache (the heavy
# compile/golden programs). `pytest -m fast` (== `-m "not slow"`) is the
# <3 min CI slice; the full suite is ~15-18 min on one core and should be
# run file-by-file when a wall-clock window is tight (README "Tests").
# New tests can also be marked @pytest.mark.slow directly.
SLOW_TESTS = {
    "test_acmix_parity",
    "test_checkpoint_roundtrip",
    "test_eval_step_accepts_uint8",
    "test_eval_step_sharded",
    "test_parity_check_synthetic_smoke",
    "test_rect_train_batches_square_dataset_is_one_shape",
    "test_swin_block_shapes_and_shift",
    "test_bias_cache_matches_gather",
    "test_block_attention_gradients_match_compose",
    "test_block_attention_kernel_matches_compose",
    "test_checkpoint_resume_bit_identical",
    "test_custom_vjp_gradients_match_reference",
    "test_device_bank_matches_streaming",
    "test_device_bank_mixup_and_mosaic_p",
    "test_epoch_scan_matches_per_step",
    "test_epoch_scan_sharded_matches_single_device",
    "test_epoch_scan_with_accumulation",
    "test_flagship_model_builds_and_runs_small",
    "test_flagship_sharded_eval_matches_single_device",
    "test_full_encoder_parity",
    "test_full_model_parity",
    "test_fused_conv_mlp_tail_grad_matches_compose",
    "test_fused_conv_mlp_tail_noln_matches_compose",
    "test_fused_mlp_tail_grad_matches_compose",
    "test_fused_swin_block_int8_close_to_compose",
    "test_global_attention_backward_matches_autodiff",
    "test_global_attention_backward_non256_rows",
    "test_golden_numpy_merge_gate_large_n",
    "test_int8_shifted_pair_close_to_compose",
    "test_ln_grad_analytic_vs_autodiff",
    "test_loss_gradients_finite",
    "test_loss_runs_and_positive",
    "test_loss_scales_with_batch_size",
    "test_make_train_batches_mosaic_flag_not_dead",
    "test_mf_input_mode",
    "test_mono_encoder_parity",
    "test_mosaic_probability_gates_per_sample",
    "test_nhwc_packed_superwindows_backward",
    "test_nhwc_packed_superwindows_forward",
    "test_nhwc_strip_backward_matches_autodiff",
    "test_noln_attention_shift_matches_rolled_compose",
    "test_noln_block_split_matches_xla_block",
    "test_noln_tails_int8_close_to_compose",
    "test_pallas_backward_matches_autodiff",
    "test_pallas_ln_interpret",
    "test_pf_full_model_and_tta_parity",
    "test_plots_smoke",
    "test_pos_embed_interpolated_at_off_config_size",
    "test_rect_eval_end_to_end",
    "test_rect_train_batches_mixed_aspect",
    "test_run_logger_jsonl",
    "test_scale_img_parity",
    "test_sharded_loss_matches_single_device",
    "test_sharded_train_step_matches_single_device",
    "test_shift_folded_pair_grads_match_rolled",
    "test_sr_training_step",
    "test_swin_block_fast384_path_matches_fallback",
    "test_swinv2_full_encoder_parity",
    "test_train_batches_no_mixup_skips_secondary_block",
    "test_tta_forward_shapes",
}


def pytest_collection_modifyitems(config, items):
    # every test not marked slow is fast, so `-m fast` and `-m "not slow"`
    # select the same <3 min slice (slice protocol: README "Tests")
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)
