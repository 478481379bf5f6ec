"""Curriculum schedule math (reference tests/test_smoke.py:146-166)."""

import math

import pytest

from mcaq_yolo_tpu.core.curriculum import CurriculumScheduler


def test_curriculum_schedule():
    # lambda_bit_gate=False: the reference-exact (ungated) lambda1 anneal
    s = CurriculumScheduler(
        warmup_epochs=20, transition_epochs=50, total_epochs=300,
        initial_complexity=0.2, initial_temperature=10.0,
        lambda_bit_gate=False,
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


def test_bit_budget_saturation_gate():
    """lambda1 must be ZERO while alpha_t pins the whole map at max_bits
    (the crush window that collapses the reference-default 'abs' mapper —
    PARITY.md "MLP-mapper degeneracy"), ramp in once the allocation is
    live, and reach full strength by alpha_t <= 1.1."""
    s = CurriculumScheduler(total_epochs=300, initial_temperature=10.0)
    # defaults [2, 8] -> alpha_sat = 8 / 5 = 1.6
    assert s.get_bit_budget_gate(0) == 0.0          # alpha = 10: pinned
    assert s.get_bit_budget_gate(100) == 0.0        # alpha ~ 2.7: pinned
    # alpha(150) = 1 + 9 e^-2.5 ~ 1.739 > 1.6: still pinned
    assert s.get_bit_budget_gate(150) == 0.0
    # alpha(200) = 1 + 9 e^{-10/3} ~ 1.321: mid-ramp, strictly inside (0,1)
    g200 = s.get_bit_budget_gate(200)
    assert 0.0 < g200 < 1.0
    a200 = s.get_temperature(200)
    assert g200 == pytest.approx((1.6 - a200) / 0.5)
    # alpha(280) = 1 + 9 e^{-14/3} ~ 1.085 <= 1.1: full strength
    assert s.get_bit_budget_gate(280) == 1.0
    # monotone non-decreasing over the run
    gates = [s.get_bit_budget_gate(e) for e in range(0, 301, 10)]
    assert all(b >= a for a, b in zip(gates, gates[1:]))

    # the gate multiplies BOTH aux map pressures: lambda1 (bit budget) and
    # lambda2 (smoothness) — ungated lambda2 flattens the complexity MLP
    # through the transition band (the r4 seed-0 640px run: complexity-map
    # spatial std 0.0 with only lambda1 gated)
    w = s.get_loss_weights(100)
    assert w["bit_budget"] == 0.0
    assert w["smoothness"] == 0.0  # epoch 100 > transition: ramp=1, gate=0
    w = s.get_loss_weights(280)
    assert w["bit_budget"] == pytest.approx(0.01 + 0.09 * (280 / 300))
    assert w["smoothness"] == pytest.approx(s.lambda_smooth)

    # disabled -> reference-exact anneal everywhere
    s_ref = CurriculumScheduler(total_epochs=300, lambda_bit_gate=False)
    assert s_ref.get_bit_budget_gate(0) == 1.0
    assert s_ref.get_loss_weights(0)["bit_budget"] == pytest.approx(0.01)

    # degenerate range (min_bits == max_bits): alpha_sat <= 1.1 -> no gate
    s_deg = CurriculumScheduler(min_bits=8.0, max_bits=8.0)
    assert s_deg.get_bit_budget_gate(0) == 1.0


def test_curriculum_target_bits_from_config():
    """The annealed target must follow the configured target_bits (it was
    silently pinned to the 4.0 default before round 4)."""
    s = CurriculumScheduler(total_epochs=100, warmup_epochs=10,
                            target_bits=3.0)
    assert s.get_target_bits(0) == 8.0
    assert s.get_target_bits(100) == pytest.approx(
        3.0 + 5.0 * math.exp(-3.0), rel=1e-6)


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


def test_anneal_horizon_decoupling():
    """anneal_epochs completes the alpha_t + target-bits schedules early
    (VERDICT r4 item 1: at short protocols the full-run anneal left lambda1
    fully gated-on for only the last ~10% of training)."""
    s = CurriculumScheduler(warmup_epochs=8, transition_epochs=25,
                            total_epochs=50, anneal_epochs=25,
                            budget_anneal="exp_exact")
    # alpha anneal completes at epoch 25, not 50
    assert s.get_temperature(25) == pytest.approx(
        1.0 + 9.0 * math.exp(-5.0), rel=1e-9)
    # gate reaches full strength before half-run
    assert s.get_bit_budget_gate(23) == 1.0
    # exp_exact lands ON target at the end of the anneal window and holds
    assert s.get_target_bits(25) == pytest.approx(4.0, abs=1e-9)
    assert s.get_target_bits(50) == pytest.approx(4.0, abs=1e-9)
    # monotone decreasing through the window
    bits = [s.get_target_bits(e) for e in range(8, 26)]
    assert all(a >= b for a, b in zip(bits, bits[1:]))

    # defaults stay reference-exact: anneal over total_epochs, exp plateau
    r = CurriculumScheduler(total_epochs=300, warmup_epochs=20)
    assert r.anneal_epochs == 300
    assert r.get_target_bits(300) == pytest.approx(
        4.0 + 4.0 * math.exp(-3.0), rel=1e-9)
    with pytest.raises(ValueError):
        CurriculumScheduler(budget_anneal="bogus")


def test_budget_controller():
    """Closed-loop budget enforcement: bit_scale trim (primary) + bounded
    lambda1 boost (secondary); off while gated, parked in the deadband,
    scale recovers on undershoot, boost floored at 1."""
    s = CurriculumScheduler(warmup_epochs=8, transition_epochs=25,
                            total_epochs=50, anneal_epochs=25,
                            budget_anneal="exp_exact",
                            budget_controller=True, controller_kp=0.3,
                            controller_scale_kp=0.7)
    # gate not fully open early: controller must not engage
    assert s.get_bit_budget_gate(10) < 1.0
    assert s.update_budget_controller(6.0, 10) == 1.0
    assert s.bit_scale == 1.0 and s.lambda1_boost == 1.0
    # post-anneal overshoot: scale trims down, boost grows (capped at 8)
    sc1 = s.update_budget_controller(5.5, 30)
    assert sc1 == pytest.approx((4.0 / 5.5) ** 0.7)
    assert s.lambda1_boost == pytest.approx(math.exp(0.3 * 1.5))
    assert s.get_effective_temperature(30) == pytest.approx(
        s.get_temperature(30) * sc1)
    assert s.get_loss_weights(32)["bit_budget"] == pytest.approx(
        (0.01 + 0.09 * 32 / 50) * s.lambda1_boost)
    for _ in range(20):
        s.update_budget_controller(8.0, 31)
    assert s.lambda1_boost == 8.0       # boost cap
    assert s.bit_scale == 0.5           # scale floor
    # inside the deadband: parked
    b, sc = s.lambda1_boost, s.bit_scale
    assert s.update_budget_controller(4.05, 33) == sc
    assert s.lambda1_boost == b
    # undershoot: scale recovers toward (and past) 1 up to the 1.3 cap,
    # boost decays to its floor of 1
    for _ in range(40):
        s.update_budget_controller(2.0, 34)
    assert s.bit_scale == 1.3
    assert s.lambda1_boost == 1.0
    # disabled: permanent no-op
    ref = CurriculumScheduler()
    assert ref.update_budget_controller(8.0, 299) == 1.0
    assert ref.get_effective_temperature(299) == ref.get_temperature(299)
    assert ref.get_loss_weights(299)["bit_budget"] == pytest.approx(
        0.01 + 0.09 * 299 / 300)
