"""Curriculum schedule math (reference tests/test_smoke.py:146-166)."""

import math

import pytest

from mcaq_yolo_tpu.core.curriculum import CurriculumScheduler


def test_curriculum_schedule():
    s = CurriculumScheduler(
        warmup_epochs=20, transition_epochs=50, total_epochs=300,
        initial_complexity=0.2, initial_temperature=10.0,
    )
    # stage boundaries
    assert s.get_stage(0) == 1
    assert s.get_stage(20) == 1
    assert s.get_stage(21) == 2
    assert s.get_stage(50) == 2
    assert s.get_stage(51) == 3

    # tau_t: linear 0.2 -> 1.0 over warm-up
    assert s.get_complexity_threshold(0) == pytest.approx(0.2)
    assert s.get_complexity_threshold(10) == pytest.approx(0.6)
    assert s.get_complexity_threshold(20) == pytest.approx(1.0)
    assert s.get_complexity_threshold(100) == 1.0

    # alpha_t = 1 + 9 exp(-5t/T)
    assert s.get_temperature(0) == pytest.approx(10.0)
    assert s.get_temperature(300) == pytest.approx(1.0 + 9.0 * math.exp(-5.0), rel=1e-6)
    assert s.get_temperature(150) == pytest.approx(1.0 + 9.0 * math.exp(-2.5), rel=1e-6)

    # target bits: 8 during warm-up, decaying toward 4
    assert s.get_target_bits(0) == 8.0
    assert s.get_target_bits(19) == 8.0
    assert s.get_target_bits(300) == pytest.approx(4.0 + 4.0 * math.exp(-3.0), rel=1e-6)

    # loss weights: lambda1 anneal, lambda2 ramp
    w0 = s.get_loss_weights(0)
    assert w0["bit_budget"] == pytest.approx(0.01)
    assert w0["smoothness"] == 0.0
    w_end = s.get_loss_weights(300)
    assert w_end["bit_budget"] == pytest.approx(0.1)
    assert w_end["smoothness"] == pytest.approx(0.1)
    w_mid = s.get_loss_weights(35)  # halfway through the transition ramp
    assert w_mid["smoothness"] == pytest.approx(0.05)
    assert w0["distillation"] == 0.5 and w0["regularization"] == 1e-4


def test_temperature_variants():
    s = CurriculumScheduler(curriculum_type="linear", total_epochs=100,
                            initial_temperature=10.0)
    assert s.get_temperature(0) == pytest.approx(10.0)
    assert s.get_temperature(100) == pytest.approx(1.0)

    s = CurriculumScheduler(curriculum_type="cosine", total_epochs=100,
                            initial_temperature=10.0)
    assert s.get_temperature(0) == pytest.approx(10.0)
    assert s.get_temperature(100) == pytest.approx(1.0)

    s = CurriculumScheduler(curriculum_type="step", initial_temperature=10.0)
    assert s.get_temperature(0) == 10.0
    assert s.get_temperature(30) == 5.0
    assert s.get_temperature(60) == 2.5
