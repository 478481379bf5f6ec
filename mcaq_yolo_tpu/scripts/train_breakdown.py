"""Train-step stage breakdown + roofline for the BASELINE config #5 arm
(yolov8m bs=32 640px MCAQ training — VERDICT r4 item 4: the train rate has
been flat at ~170 img/s since round 2 with no profile).

Times jitted sub-programs of the exact bench.py train arm and derives
per-stage deltas:

  fwd_train       train-mode MCAQ forward (mutable batch/quant stats)
  backbone        train-mode backbone only
  morphology      + complexity maps                     (delta)
  loss_only       forward + full Eq.20 loss, no grad    (delta = TAL+loss)
  grad            value_and_grad of the same            (delta = backward)
  update          full step minus grad                  (AdamW + Eq.18)
  teacher_fwd     FP32 teacher forward (the KD increment, timed separately)

Each sub-program also gets XLA cost-model FLOPs and the fusion-aware HBM
floor (utils.profiling.kernel_floor_bytes), so the step's roofline bound
and MFU are stated against a SOUND model.

Usage (real TPU):
    python -m mcaq_yolo_tpu.scripts.train_breakdown [--variant yolov8m]
        [--batch 32] [--img 640] [--iters 10] [--out FILE]
"""

from __future__ import annotations

import argparse
import json


def run(variant="yolov8m", batch=32, img=640, iters=10,
        peak_tflops=125.0, peak_gbps=411.0, kd=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..core.bit_allocation import enforce_monotonic_params
    from ..models import MCAQYOLO, YOLOv8
    from ..models.losses import MCAQYOLOLoss
    from ..train import TrainState, make_train_step
    from ..utils.profiling import _cost_analysis, kernel_floor_bytes, timed

    model = MCAQYOLO(variant=variant, num_classes=80, bit_mapping="mlp",
                     dtype=jnp.bfloat16)
    loss_obj = MCAQYOLOLoss(num_classes=80)
    rng = np.random.default_rng(0)
    M = 16
    batch_d = {
        "image": jax.random.uniform(jax.random.PRNGKey(1),
                                    (batch, img, img, 3), jnp.float32),
        "gt_boxes": jnp.asarray(
            np.sort(rng.uniform(0, img, (batch, M, 2, 2)), axis=2)
            .reshape(batch, M, 4).astype(np.float32)),
        "gt_classes": jnp.asarray(rng.integers(0, 80, (batch, M)), jnp.int32),
        "gt_mask": jnp.asarray(rng.random((batch, M)) < 0.5),
    }
    variables = jax.jit(
        lambda k, x: model.init(k, x, training=False)
    )(jax.random.PRNGKey(0), batch_d["image"][:1])
    params = variables["params"]
    if "bit_mapper" in params:
        params["bit_mapper"] = enforce_monotonic_params(params["bit_mapper"])
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.adamw(1e-3, weight_decay=0.05),
        batch_stats=variables.get("batch_stats", {}),
        quant_stats=variables.get("quant_stats", {}),
        buffers=variables.get("buffers", {}),
    )
    one = jnp.float32(1.0)
    w = dict(temperature=one, target_bits=jnp.float32(4.0),
             lw_bit=jnp.float32(0.1), lw_smooth=jnp.float32(0.1),
             lw_kd=jnp.float32(0.5), lw_reg=jnp.float32(1e-4))

    def vars_of(state):
        return {"params": state.params, "batch_stats": state.batch_stats,
                "quant_stats": state.quant_stats, "buffers": state.buffers}

    # ---- sub-programs ---------------------------------------------------
    @jax.jit
    def backbone_train(state, images):
        def fn(mdl, x):
            from ..models.yolo import normalize_image
            return mdl.backbone(normalize_image(x), True)
        return model.apply(vars_of(state), images, method=fn,
                           mutable=["batch_stats"])

    @jax.jit
    def morph_train(state, images):
        def fn(mdl, x):
            from ..models.yolo import normalize_image
            feats = mdl.backbone(normalize_image(x), True)
            return [mdl.complexity_analyzer(f) for f in feats]
        return model.apply(vars_of(state), images, method=fn,
                           mutable=["batch_stats"])

    @jax.jit
    def fwd_train(state, images):
        return model.apply(vars_of(state), images, temperature=one,
                           quantize=True, training=True,
                           mutable=["batch_stats", "quant_stats"])

    def loss_value(params, state, batch):
        out, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "quant_stats": state.quant_stats, "buffers": state.buffers},
            batch["image"], temperature=w["temperature"], quantize=True,
            training=True, mutable=["batch_stats", "quant_stats"])
        raw_maps, aux = out
        total, _ = loss_obj(
            raw_maps, batch, aux, teacher_maps=None,
            mapper_params=params.get("bit_mapper"),
            loss_weights={"detection": jnp.float32(1.0),
                          "bit_budget": w["lw_bit"],
                          "smoothness": w["lw_smooth"],
                          "distillation": w["lw_kd"],
                          "regularization": w["lw_reg"]},
            target_bits=w["target_bits"])
        return total

    @jax.jit
    def loss_only(state, batch):
        return loss_value(state.params, state, batch)

    @jax.jit
    def grad_only(state, batch):
        return jax.grad(loss_value)(state.params, state, batch)

    step = make_train_step(model, loss_obj)

    def full_step(state, batch):
        new_state, m = step(state, batch, None, w["temperature"],
                            w["target_bits"], w["lw_bit"], w["lw_smooth"],
                            w["lw_kd"], w["lw_reg"], quantize=True,
                            use_kd=False)
        return new_state, m

    # donate_argnums on the real step: keep a reusable state for timing by
    # threading it through (timed() calls fn(*args) repeatedly; we close
    # over a mutable holder instead)
    holder = {"state": state}

    def step_thread():
        holder["state"], m = full_step(holder["state"], batch_d)
        return m["avg_bits"]

    t = {}
    t["backbone_ms"] = timed(backbone_train, state, batch_d["image"],
                             iters=iters) * 1e3
    t["morph_cum_ms"] = timed(morph_train, state, batch_d["image"],
                              iters=iters) * 1e3
    t["fwd_train_ms"] = timed(fwd_train, state, batch_d["image"],
                              iters=iters) * 1e3
    t["loss_only_ms"] = timed(loss_only, state, batch_d, iters=iters) * 1e3
    t["grad_ms"] = timed(grad_only, state, batch_d, iters=iters) * 1e3
    t["full_step_ms"] = timed(step_thread, iters=iters) * 1e3

    if kd:
        teacher = YOLOv8(variant, 80)
        tvars = jax.jit(lambda k, x: teacher.init(k, x))(
            jax.random.PRNGKey(2), batch_d["image"][:1])

        @jax.jit
        def teacher_fwd(tvars, images):
            return teacher.apply(tvars, images)

        t["teacher_fwd_ms"] = timed(teacher_fwd, tvars, batch_d["image"],
                                    iters=iters) * 1e3

    # ---- derived stages -------------------------------------------------
    stages = {
        "backbone_fwd": t["backbone_ms"],
        "morphology": t["morph_cum_ms"] - t["backbone_ms"],
        "quantize_neck_head_fwd": t["fwd_train_ms"] - t["morph_cum_ms"],
        "tal_loss": t["loss_only_ms"] - t["fwd_train_ms"],
        "backward": t["grad_ms"] - t["loss_only_ms"],
        "optimizer_projection": t["full_step_ms"] - t["grad_ms"],
    }
    if kd:
        stages["teacher_fwd_kd_increment"] = t["teacher_fwd_ms"]

    # ---- roofline of the full step --------------------------------------
    ca = _cost_analysis(jax.jit(lambda s, b: full_step(s, b)[1]["avg_bits"]),
                        holder["state"], batch_d)
    kf = kernel_floor_bytes(lambda s, b: full_step(s, b)[1]["avg_bits"],
                            holder["state"], batch_d)
    gflops = ca["flops"] / 1e9
    gb_floor = kf["floor_bytes"] / 1e9
    t_flops = gflops / peak_tflops
    t_bytes = gb_floor / peak_gbps * 1e3
    bound = max(t_flops, t_bytes)

    return {
        "config": {"variant": variant, "batch": batch, "img": img,
                   "iters": iters, "peak_tflops": peak_tflops,
                   "peak_gbps": peak_gbps, "kd": kd},
        "raw_ms": {k: round(v, 2) for k, v in t.items()},
        "stages_ms": {k: round(v, 2) for k, v in stages.items()},
        "stages_pct": {k: round(100 * v / t["full_step_ms"], 1)
                       for k, v in stages.items()},
        "imgs_per_sec": round(batch / t["full_step_ms"] * 1e3, 1),
        "step_gflops": round(gflops, 1),
        "step_gb_floor": round(gb_floor, 2),
        "step_bound_ms": round(bound, 2),
        "bound_by": "flops" if t_flops >= t_bytes else "bytes",
        "pct_of_bound": round(100 * bound / t["full_step_ms"], 1),
        "achieved_tflops": round(gflops / t["full_step_ms"], 2),
        "mfu_pct_bf16_peak": round(
            gflops / t["full_step_ms"] / peak_tflops * 100 / 1.0, 2),
    }


def main(argv=None):
    from ..utils.sync import acquire_backend

    acquire_backend()
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="yolov8m")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--peak-tflops", type=float, default=125.0)
    p.add_argument("--peak-gbps", type=float, default=411.0)
    p.add_argument("--kd", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    res = run(args.variant, args.batch, args.img, args.iters,
              args.peak_tflops, args.peak_gbps, kd=args.kd)
    s = json.dumps(res, indent=2)
    print(s)
    if args.out:
        with open(args.out, "w") as f:
            f.write(s + "\n")


if __name__ == "__main__":
    main()
