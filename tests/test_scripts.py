"""Unit tests for the analysis scripts' pure helpers."""

import os
from pathlib import Path

import jax
import numpy as np

from mcaq_yolo_tpu.scripts.m3_permutation import permute_bit_map
from mcaq_yolo_tpu.scripts.m4_variation_gain import bootstrap_ci
import pytest

# script-level e2e drives on the session-shared trained checkpoint - excluded from the CI fast gate
pytestmark = pytest.mark.slow


def test_permute_preserves_histogram():
    rng = np.random.default_rng(0)
    m = rng.integers(2, 9, (8, 8)).astype(np.float32)
    for mode in ("mcaq", "permuted", "inverted"):
        out = permute_bit_map(m, mode, seed=1)
        assert sorted(out.reshape(-1)) == sorted(m.reshape(-1)), mode
    np.testing.assert_array_equal(permute_bit_map(m, "mcaq", 0), m)


def test_inverted_is_rank_inversion():
    m = np.array([[2.0, 8.0], [4.0, 6.0]], np.float32)
    inv = permute_bit_map(m, "inverted", 0)
    # highest-bit tile gets the lowest bits
    assert inv[np.unravel_index(np.argmax(m), m.shape)] == 2.0
    assert inv[np.unravel_index(np.argmin(m), m.shape)] == 8.0


def test_permuted_is_seeded():
    rng = np.random.default_rng(3)
    m = rng.integers(2, 9, (6, 6)).astype(np.float32)
    a = permute_bit_map(m, "permuted", seed=42)
    b = permute_bit_map(m, "permuted", seed=42)
    np.testing.assert_array_equal(a, b)


def test_bootstrap_ci():
    vals = np.ones(50)
    lo, hi = bootstrap_ci(vals, reps=100)
    assert lo == hi == 1.0
    lo, hi = bootstrap_ci(np.array([]), reps=10)
    assert np.isnan(lo) and np.isnan(hi)


# ---------------------------------------------------------------------------
# e2e invocations of the analysis scripts' run() paths on the session's
# tiny trained checkpoint (VERDICT r1 item 9): assert output schema +
# finite numbers, so regressions in the script plumbing are caught in CI.
# ---------------------------------------------------------------------------


def test_backend_agreement_run_e2e():
    from mcaq_yolo_tpu.scripts.backend_agreement import run

    res = run(num_images=3, img_size=96)
    assert np.isfinite(res["fused"]["pearson"])
    for name in ("fractal", "texture", "gradient", "edge", "contour"):
        assert "pearson" in res[name], name  # nan allowed (constant metric)


def test_m3_permutation_run_e2e(trained):
    from pathlib import Path

    from mcaq_yolo_tpu.scripts.m3_permutation import run

    trainer, _, config = trained
    summary = run(
        model_path=str(Path(config["output_dir"]) / "last.ckpt"),
        data_yaml=config["data"]["yaml_path"],
        img_size=96, num_classes=4, batch_size=4, seed=0,
    )
    for arm in ("mcaq", "permuted", "inverted"):
        assert np.isfinite(summary[arm]["map50"]), arm
    assert np.isfinite(summary["placement_gain_vs_permuted"])


def test_m4_variation_gain_run_e2e(trained):
    from pathlib import Path

    from mcaq_yolo_tpu.scripts.m4_variation_gain import run

    trainer, _, config = trained
    summary = run(
        model_path=str(Path(config["output_dir"]) / "last.ckpt"),
        data_yaml=config["data"]["yaml_path"],
        img_size=96, num_classes=4, batch_size=4, reps=50,
    )
    assert summary["num_images"] > 0
    assert np.isfinite(summary["mean_gain"])
    assert set(summary["quartiles"]) == {"Q1", "Q2", "Q3", "Q4"}


def test_quality_evidence_run_e2e(tmp_path):
    """Tiny-scale e2e of the THREE-ARM quality protocol (96px, 3+2 epochs,
    dataset v2): FP-trained, MCAQ-trained, post-hoc-quantized arms all
    evaluated, KD stage exports the FP teacher and trains, deployed bit-map
    stats present, table schema complete and finite where expected."""
    from mcaq_yolo_tpu.scripts.quality_evidence import run

    table = run(img_size=96, epochs=3, n_images=8, n_val=4,
                batch_size=4, root=str(tmp_path / "qe"), kd_epochs=2)
    assert np.isfinite(table["fp_trained_arm"]["map50_95"])
    assert np.isfinite(table["mcaq_trained_arm"]["map50_95"])
    assert np.isfinite(table["posthoc_quant_arm"]["map50_95"])
    assert 2.0 <= table["mcaq_trained_arm"]["avg_bits"] <= 32.0
    assert 2.0 <= table["posthoc_quant_arm"]["avg_bits"] <= 8.0
    assert table["fp_trained_arm"]["avg_bits"] == 32.0
    assert "rounded_map_spatial_std_mean" in table["mcaq_trained_arm"]
    assert sum(table["mcaq_trained_arm"]["bit_histogram"].values()) > 0
    assert np.isfinite(table["raw_map_divergence"]["mean_divergence"])
    assert (tmp_path / "qe" / "teacher.ckpt").exists()
    assert np.isfinite(table["kd_arm"]["map50_95"])


def test_profile_morphology_run():
    """Sub-stage morphology profiler: every pipeline operator reports a
    finite positive millisecond figure and phi_full covers the stage."""
    from mcaq_yolo_tpu.scripts.profile_morphology import run

    res = run(batch=2, hw=16, tile=4, iters=1)
    for key in ("pack_tiles", "gaussian_blur5", "sobel", "otsu",
                "canny_nms", "hysteresis_x8", "canny_full",
                "adaptive_binarize", "lbp_entropy", "fractal", "euler",
                "contour_incl_euler", "phi_full"):
        assert key in res and np.isfinite(res[key]) and res[key] > 0, key


def test_probe_devices_fast_path():
    """probe_devices returns promptly when the backend is healthy (CPU
    here) and matches jax.devices()."""
    from mcaq_yolo_tpu.utils.sync import probe_devices

    devs = probe_devices(timeout_s=30.0)
    assert list(devs) == list(jax.devices())


def test_roofline_run_smoke():
    """Per-stage roofline (scripts/roofline.py): every stage reports a
    finite time and a flops/bytes bound, and the e2e program is timed.
    Tiny shapes on CPU — only the plumbing and schema are under test; the
    ceilings are the TPU's and meaningless here."""
    from mcaq_yolo_tpu.scripts.roofline import run

    res = run(variant="yolov8n", batch=2, img=64, iters=1)
    stages = {r["stage"] for r in res["stages"]}
    assert stages == {"backbone", "morphology", "bitmap_quantize",
                      "neck_head", "decode_nms"}
    for r in res["stages"]:
        assert np.isfinite(r["ms"]), r
        assert np.isfinite(r["bound_ms"]) and r["bound_ms"] >= 0.0, r
        assert r["bound_by"] in ("flops", "bytes"), r
    # no relative-timing assertion (e2e >= full): with iters=1 on a
    # contended single CPU core the two independent timed() calls can
    # invert by scheduling noise — only positivity/schema are CPU-testable
    assert res["e2e_ms"] > 0.0 and res["full_ms"] > 0.0
    assert res["e2e_img_per_s"] > 0.0


def test_downsample_fidelity_run_e2e(trained):
    """Deploy-time downsample fidelity (scripts/downsample_fidelity.py):
    schema complete, and at 96px geometry (C3 tile 4 < 8) the 2x request
    AUTO-DEGRADES everywhere, so both settings must be EXACTLY identical —
    the lever's small-geometry safety contract (compute_phi_tiles docs).
    The discriminative >=512px run happens in the evidence protocol."""
    from pathlib import Path

    from mcaq_yolo_tpu.scripts.downsample_fidelity import run

    trainer, _, config = trained
    res = run(
        ckpt=str(Path(config["output_dir"]) / "last.ckpt"),
        data_yaml=config["data"]["yaml_path"],
        img_size=96, num_classes=4, batch_size=4,
        bit_mapping="linear", normalize_complexity=False,
    )
    assert np.isfinite(res["downsample_1"]["map50_95"])
    assert np.isfinite(res["downsample_2"]["map50_95"])
    # auto-degraded => bitwise-identical estimates at this geometry
    assert res["delta_map50_95"] == 0.0
    assert res["delta_avg_bits"] == 0.0
    for row in res["per_scale_fidelity"]:
        assert row["rounded_bit_changed_frac"] == 0.0, row
        assert row["complexity_pearson_r"] == 1.0, row


def test_bench_nms_run_smoke():
    """Decode+NMS breakdown (scripts/bench_nms.py): schema complete and
    every stage reports a positive finite time at tiny CPU geometry (top-k
    sizes clamp to the anchor count; only plumbing is under test — the
    exact-vs-approx A/B is meaningful only on the real TPU)."""
    from mcaq_yolo_tpu.scripts.bench_nms import run

    res = run(batch=2, img=64, iters=1)
    for key in ("decode_only_ms", "forward_ms", "e2e_ms",
                "decode_nms_gap_ms", "e2e_imgs_per_sec"):
        assert np.isfinite(res[key]), key
    for k in (1024, 512, 256):
        assert res[f"select_exact_topk{k}_ms"] > 0.0
        assert res[f"select_approx_topk{k}_ms"] > 0.0
        assert res[f"nms_from_decoded_topk{k}_ms"] > 0.0


def test_pretopk_equivalence_run_e2e(trained):
    """Pool-size equivalence contract (scripts/pretopk_equivalence.py): on
    the tiny trained ckpt the deployed gate passes few candidates, both
    pools produce identical detections, and the schema is complete."""
    from pathlib import Path

    from mcaq_yolo_tpu.scripts.pretopk_equivalence import run

    trainer, _, config = trained
    out = Path(config["output_dir"])
    ckpt = out / ("best.ckpt" if (out / "best.ckpt").exists() else "last.ckpt")
    res = run(str(ckpt), config["data"]["yaml_path"], batch_size=4,
              pools=(32, 128), max_det=16)
    for g in ("deployed", "eval"):
        assert res[f"gated_candidates_{g}"]["max"] >= 0
        for p in (32, 128):
            assert np.isfinite(res[f"map_{g}_pool{p}"]["map50_95"])
    # at the deployed 0.25 gate the candidate set fits the small pool, so
    # the truncation must be invisible
    if res["gated_candidates_deployed"]["max"] <= 32:
        assert res["images_with_any_detection_diff_deployed"] == 0


def test_quality_assemble_sample_std(tmp_path):
    """_mean_std reports the SAMPLE std (ddof=1) and null for n=1 —
    population std understates the replication spread the table claims."""
    from mcaq_yolo_tpu.scripts.quality_assemble import _mean_std

    r = _mean_std([0.10, 0.15, 0.20])
    assert r["n"] == 3 and abs(r["std"] - 0.05) < 1e-9
    assert _mean_std([0.5])["std"] is None
    assert _mean_std([None, None]) is None


def test_quality_assemble_full_table(tmp_path):
    """assemble() aggregates per-seed main + KD files into the replicated
    table: mean/std/per-seed for every arm, deltas, per-seed bit
    histograms, and the KD block keyed off mcaq/kd arms."""
    import json

    from mcaq_yolo_tpu.scripts.quality_assemble import assemble

    def main_file(seed, fp, mcaq, posthoc):
        d = {
            "config": {"seed": seed, "img_size": 640, "epochs": 50},
            "fp_trained_arm": {"map50": 0.99, "map50_95": fp,
                               "avg_bits": 32.0},
            "mcaq_trained_arm": {"map50": 0.98, "map50_95": mcaq,
                                 "avg_bits": 5.0, "compression": 6.0,
                                 "rounded_map_spatial_std_mean": 0.8,
                                 "rounded_map_spatial_std_max": 1.4,
                                 "bit_histogram": {"5": 7000, "8": 200}},
            "posthoc_quant_arm": {"map50": 0.99, "map50_95": posthoc,
                                  "avg_bits": 8.0},
            "delta_mcaq_vs_fp_map50_95": round(mcaq - fp, 4),
        }
        p = tmp_path / f"main{seed}.json"
        p.write_text(json.dumps(d))
        return str(p)

    def kd_file(seed, no_kd, kd):
        d = {
            "config": {"seed": seed, "img_size": 256, "epochs": 12},
            "mcaq_trained_arm": {"map50_95": no_kd, "avg_bits": 3.0},
            "kd_arm": {"map50_95": kd, "avg_bits": 3.0},
            "delta_kd_vs_mcaq_map50_95": round(kd - no_kd, 4),
        }
        p = tmp_path / f"kd{seed}.json"
        p.write_text(json.dumps(d))
        return str(p)

    mains = [main_file(0, 0.85, 0.90, 0.85), main_file(1, 0.81, 0.93, 0.81)]
    kds = [kd_file(0, 0.36, 0.51), kd_file(1, 0.34, 0.37)]
    out = assemble(mains, kds)

    assert out["protocol"]["seeds"] == [0, 1]
    assert out["mcaq_trained_arm"]["map50_95"]["per_seed"] == [0.90, 0.93]
    assert out["mcaq_trained_arm"]["map50_95"]["n"] == 2
    assert out["fp_trained_arm"]["avg_bits"]["mean"] == 32.0
    d = out["delta_mcaq_vs_fp_map50_95"]
    assert d["per_seed"] == [0.05, 0.12] and abs(d["mean"] - 0.085) < 1e-9
    assert out["mcaq_bit_histograms_per_seed"]["0"]["5"] == 7000
    assert out["kd_protocol"]["seeds"] == [0, 1]
    assert out["kd_delta_kd_minus_no_kd_map50_95"]["per_seed"] == [0.15, 0.03]
    assert out["kd_bits"]["kd"]["mean"] == 3.0

    # a seed file missing the FP arm (donor workflow) must not break the
    # other arms' aggregation and must simply shrink the FP sample
    partial = json.loads((tmp_path / "main0.json").read_text())
    del partial["fp_trained_arm"]
    del partial["delta_mcaq_vs_fp_map50_95"]
    p = tmp_path / "main2.json"
    partial["config"]["seed"] = 2
    p.write_text(json.dumps(partial))
    out2 = assemble([str(p), mains[1]])
    assert out2["fp_trained_arm"]["map50_95"]["n"] == 1
    assert out2["mcaq_trained_arm"]["map50_95"]["n"] == 2
    assert out2["delta_mcaq_vs_fp_map50_95"]["n"] == 1


def test_bench_retry_wrapper(tmp_path, monkeypatch):
    """bench.py's parent wrapper must stream child lines live, retry ONCE
    on the tunnel-stall failure class, and pass through genuine results
    and genuine (non-stall) errors without retrying."""
    import subprocess
    import sys

    bench = str(Path(__file__).resolve().parents[1] / "bench.py")

    def run_with_child(child_code, extra_env=None):
        child = tmp_path / f"child_{abs(hash(child_code)) % 99999}.py"
        child.write_text(child_code)
        env = dict(os.environ, BENCH_SELF=str(child),
                   BENCH_RETRY_COOLDOWN_S="0", BENCH_TIME_BUDGET_S="30",
                   **(extra_env or {}))
        env.pop("BENCH_CHILD", None)
        return subprocess.run([sys.executable, bench], env=env,
                              capture_output=True, text=True, timeout=120)

    # 1. success: no retry, child line passed through, rc 0
    ok = '{"metric": "images_per_sec", "value": 42.0}'
    r = run_with_child(f"print('{ok}')")
    assert r.returncode == 0
    assert r.stdout.count('"value": 42.0') == 1

    # 2. stall-class failure: retried exactly once; both attempts visible
    stall = ('{"metric": "images_per_sec", "value": 0.0, '
             '"error": "headline arm did not complete within budget"}')
    r = run_with_child(f"import sys; print('{stall}'); sys.exit(2)")
    assert r.returncode == 2
    assert r.stdout.count("did not complete") == 2

    # 3. genuine (non-stall) error: NOT retried
    err = ('{"metric": "images_per_sec", "value": 0.0, '
           '"error": "some assertion failed"}')
    r = run_with_child(f"import sys; print('{err}'); sys.exit(2)")
    assert r.returncode == 2
    assert r.stdout.count("assertion failed") == 1


def test_external_bit_maps_identity_matches_normal_forward():
    """apply_external_bit_maps with the model's OWN bit maps must reproduce
    the standard quantized forward exactly — pins input normalization and
    quantizer plumbing (a missing normalize_image once zeroed every M3/M4
    arm on uint8 batches while the schema-level tests stayed green)."""
    import jax
    import jax.numpy as jnp

    from mcaq_yolo_tpu.models import MCAQYOLO
    from mcaq_yolo_tpu.scripts.m3_permutation import apply_external_bit_maps

    model = MCAQYOLO(variant="yolov8n", num_classes=4, bit_mapping="linear")
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8))
    variables = model.init(jax.random.PRNGKey(0), images.astype(jnp.float32),
                           training=False)

    raw_normal, aux = model.apply(variables, images, temperature=1.0,
                                  quantize=True, training=False)
    raw_ext = apply_external_bit_maps(model, variables, images,
                                      aux["bit_map"])
    for a, b in zip(raw_normal, raw_ext):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
