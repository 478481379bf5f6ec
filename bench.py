"""
MCAQ-YOLO-TPU benchmark — prints ONE JSON line per completed stage, the
LAST line being the most complete result:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric (BASELINE.json north star): 640px images/sec/chip for the
DEPLOYED yolov8n MCAQ program — quantized forward + box decode + NMS, the
same device program Predictor/eval run (reference inference.py:194-243).

STRUCTURE (VERDICT r3 item 1 — the round-3 bench timed out under the
driver with zero output, rc=124):
  1. The single best-known deployable configuration is measured FIRST and
     its complete JSON line printed IMMEDIATELY.
  2. Extra arms run afterwards, each gated on the remaining wall-clock
     budget (BENCH_TIME_BUDGET_S, default 330 s); after each arm an
     UPDATED complete JSON line is printed, so whatever the driver's tail
     parse finds is a full record.
  3. A daemon watchdog enforces a hard deadline (budget + 45 s grace):
     a mid-run tunnel hang can no longer swallow the headline — the
     process exits 0 with the already-printed lines on stdout (or exits 2
     with a diagnosable error JSON if not even the headline landed).

Extra arms (BASELINE config #5 coverage), budget permitting:
  * e2e bs128 + the reference-faithful full-res-morphology (ds1) arm
  * forward-only bs256 + MFU vs the chip's bf16 peak (roofline context)
  * an explicit Pallas-backend inference arm (backend='pallas')
  * yolov8m MCAQ TRAIN step images/sec/chip (full loss, quantize on)
  * a measured torch-CPU reference-fallback rate (BASELINE.md's actual
    contract baseline: the reference's pure-PyTorch path — VERDICT r3
    item 8), run on the host CPU via the vendored Ultralytics-topology
    fixture + the reference's own quantizer/analyzer modules

vs_baseline: the reference repo publishes no measured numbers
(BASELINE.md — "no trained weights, no paper-table configs/results");
its only latency anchor is the paper's 151 FPS claim
(reference README.md:375-379), so vs_baseline = images_per_sec / 151.0.
The measured torch-CPU fallback rate in `extra` anchors it to something
actually measured on this host.

Set BENCH_QUICK=1 to print only the headline (skips the extra arms).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PAPER_FPS_BASELINE = 151.0  # arXiv:2511.12976 latency claim (reference README)

# forward GFLOPs/img at 640 (Ultralytics model table; MAC*2 convention) and
# v5e bf16 peak — used only for the roofline context line
GFLOPS_640 = {"yolov8n": 8.7, "yolov8s": 28.6, "yolov8m": 78.9}
V5E_BF16_PEAK_TFLOPS = 197.0


def _sync(out):
    """Shared host-fetch barrier (jax.block_until_ready is a NO-OP on the
    tunneled 'axon' TPU platform — see mcaq_yolo_tpu/utils/sync.py)."""
    from mcaq_yolo_tpu.utils.sync import sync

    sync(out)


def _throughput(fn, args, batch, iters, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return batch * iters / (time.perf_counter() - t0)


def _infer_imgs_per_sec(variant, batch, img, iters, dtype, backend="auto",
                        e2e=False, morph_ds=1):
    """images/sec for the MCAQ inference forward.

    e2e=False: raw quantized forward (roofline-comparable).
    e2e=True:  the DEPLOYED program — forward + box decode + NMS — i.e. the
    same device program the Predictor and Trainer.eval run (reference
    inference.py:194-243; VERDICT r2 item 2: the headline must cover the
    deployable configuration, not just the forward)."""
    import jax
    import jax.numpy as jnp

    from mcaq_yolo_tpu.models import MCAQYOLO

    ckpt = os.environ.get("BENCH_CKPT", "")
    nc, bit_mapping = 80, "mlp"
    if ckpt and os.path.exists(ckpt + ".json"):
        import json as _json
        meta = _json.loads(open(ckpt + ".json").read())
        nc = int(meta.get("num_classes", nc))
        qcfg = meta.get("config", {}).get("quantization", {})
        bit_mapping = qcfg.get("bit_mapping", bit_mapping)
    model = MCAQYOLO(variant=variant, num_classes=nc, bit_mapping=bit_mapping,
                     dtype=dtype, quant_backend=backend,
                     morph_downsample=morph_ds)
    # generate inputs ON-DEVICE and JIT the init: host-side numpy RNG for a
    # bs=256 640px batch (1.2 GB) costs ~90 s on this 1-core host plus
    # ~70 s of transfer over the tunnel, and flax's eager init dispatches
    # the whole model op-by-op over the tunnel (~277 s measured) — these
    # three dominated the round-3 bench timeout, not the compiles
    # (measured stage breakdown: evidence/r4/bench_stage_timing.md)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, img, img, 3), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init(k, x, training=False)
    )(jax.random.PRNGKey(0), images[:1])
    if ckpt and os.path.exists(ckpt):
        # bench a TRAINED checkpoint (frozen EMA calibration, trained bit
        # mapper — the deployed quant-path branches) instead of random init
        from flax import serialization

        payload = serialization.msgpack_restore(open(ckpt, "rb").read())
        variables = {
            k: payload.get(k, variables.get(k, {}))
            for k in ("params", "batch_stats", "quant_stats", "buffers")
        }
        # commit to device once — numpy leaves would otherwise be
        # re-transferred on EVERY jitted call (10x slowdown on the tunnel)
        variables = jax.device_put(variables)

    if e2e:
        from mcaq_yolo_tpu.inference import auto_pre_topk
        from mcaq_yolo_tpu.models.yolo import decode_and_nms

        # the measured-safe serving pool (VERDICT r3 item 4): 256 at the
        # deployed conf=0.25 gate — equivalence + >=10x headroom certified
        # on a trained checkpoint (evidence/r3/pretopk_equivalence.json),
        # saturation guarded at runtime by Predictor's gated-count check
        pool = auto_pre_topk(300, conf_threshold=0.25)

        @jax.jit
        def forward(variables, images):
            raw_maps, aux = model.apply(
                variables, images, temperature=1.0, quantize=True,
                training=False,
            )
            # the fused deployed program (Predictor/eval_step): class-max
            # over logits inside decode, no (B, A, nc) score tensor
            det = decode_and_nms(raw_maps, nc, conf_threshold=0.25,
                                 iou_threshold=0.45, max_det=300,
                                 pre_topk=pool)
            return det + (aux["avg_bits"],)
    else:
        @jax.jit
        def forward(variables, images):
            raw_maps, aux = model.apply(
                variables, images, temperature=1.0, quantize=True,
                training=False
            )
            return raw_maps, aux["avg_bits"]

    return _throughput(forward, (variables, images), batch, iters)


def _train_imgs_per_sec(variant, batch, img, iters):
    """Jitted MCAQ train step (detection + bit + smooth losses, quantize on,
    fractional-bit STE, AdamW, Eq.18 projection) on a synthetic batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mcaq_yolo_tpu.models import MCAQYOLO
    from mcaq_yolo_tpu.models.losses import MCAQYOLOLoss
    from mcaq_yolo_tpu.train import TrainState, make_train_step
    from mcaq_yolo_tpu.core.bit_allocation import enforce_monotonic_params

    model = MCAQYOLO(variant=variant, num_classes=80, bit_mapping="mlp",
                     dtype=jnp.bfloat16)
    loss_obj = MCAQYOLOLoss(num_classes=80)
    rng = np.random.default_rng(0)
    M = 16
    batch_d = {
        # images on-device (see _infer_imgs_per_sec: host RNG + tunnel
        # transfer dwarf the measurement); labels are tiny, host is fine
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
    step = make_train_step(model, loss_obj)
    one = jnp.float32(1.0)

    def run(state):
        new_state, metrics = step(
            state, batch_d, None, one, jnp.float32(4.0),
            jnp.float32(0.05), jnp.float32(0.1), jnp.float32(0.0),
            jnp.float32(1e-4), quantize=True, use_kd=False,
        )
        return new_state, metrics

    # donate_argnums=(0,) in make_train_step: thread the state
    new_state, m = run(state)
    _sync(m["avg_bits"])
    t0 = time.perf_counter()
    for _ in range(iters):
        new_state, m = run(new_state)
    _sync(m["avg_bits"])
    return batch * iters / (time.perf_counter() - t0)


def _torch_cpu_fallback_imgs_per_sec(img=640, iters=2):
    """BASELINE.md's practical contract baseline, actually measured: the
    reference's pure-PyTorch fallback semantics on the host CPU — the
    vendored Ultralytics-topology yolov8n fixture with the REFERENCE's own
    analyzer -> bit-mapper -> SpatialAdaptiveQuantization modules running
    per-forward at C3/C4/C5 (the reference's hook points,
    reference models/mcaq_yolo.py:402-473).  bs=1, eval mode — the
    reference has no batched serving path."""
    import types

    # the reference's core pulls in skimage at import for its cv2 backend;
    # only the torch surrogate path runs here, so stub the one symbol
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        feat = types.ModuleType("skimage.feature")
        feat.local_binary_pattern = lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("skimage stub"))
        sk.feature = feat
        sys.modules["skimage"] = sk
        sys.modules["skimage.feature"] = feat
    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    tests_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests")
    if tests_dir not in sys.path:
        sys.path.append(tests_dir)

    import torch
    from torch_yolo_fixture import TYOLOv8n

    from mcaq_yolo.core.bit_allocation import ComplexityToBitMappingNetwork
    from mcaq_yolo.core.morphology import MorphologicalComplexityAnalyzer
    from mcaq_yolo.core.quantization import SpatialAdaptiveQuantization

    torch.manual_seed(0)
    torch.set_num_threads(max(1, os.cpu_count() or 1))
    tmodel = TYOLOv8n(nc=80).eval()
    analyzer = MorphologicalComplexityAnalyzer(
        device="cpu", metric_backend="gpu").eval()
    mapper = ComplexityToBitMappingNetwork().eval()
    quants = [SpatialAdaptiveQuantization(per_channel=True).eval()
              for _ in range(3)]

    def quant_fn(feat, i):
        with torch.no_grad():
            c = analyzer(feat)
            bits = mapper(c, temperature=1.0)
            quants[i].update_running_stats(feat)
            return quants[i](feat, bits, training=False)

    x = torch.rand(1, 3, img, img)
    with torch.no_grad():
        tmodel(x, quant_fn=quant_fn)  # warmup (also calibrates EMA stats)
        t0 = time.perf_counter()
        for _ in range(iters):
            tmodel(x, quant_fn=quant_fn)
        dt = time.perf_counter() - t0
    return iters / dt


def _ensure_backend():
    """The host sitecustomize bakes JAX_PLATFORMS=axon into jax.config, but
    the TPU plugin may register under a different platform name ('tpu')
    depending on plugin version — fall back to auto-selection if the pinned
    platform fails to initialize.  A DOWN tunnel endpoint makes backend
    init hang forever (not raise), so the probe runs under a watchdog and
    the bench emits a diagnosable one-line JSON error instead of freezing
    the driver."""
    import jax

    import mcaq_yolo_tpu
    from mcaq_yolo_tpu.utils.sync import probe_devices

    def _die(msg):
        print(json.dumps({
            "metric": "images_per_sec", "value": 0.0, "unit": "img/s",
            "vs_baseline": 0.0, "error": msg,
        }))
        # os._exit, not sys.exit: interpreter teardown can hang on a
        # probe thread still blocked inside the C connect (observed), and
        # buffered stdout would never flush.
        sys.stdout.flush()
        os._exit(2)

    if getattr(mcaq_yolo_tpu, "BACKEND_PROBE_TIMED_OUT", False):
        # the hung import-probe thread holds jax's global backend lock;
        # any further device query would block forever
        _die("tpu unreachable: backend init hung at package import")
    try:
        probe_devices(timeout_s=120.0)
    except TimeoutError as e:
        _die(f"tpu unreachable: {e}")
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()
    if jax.default_backend() == "cpu" and os.environ.get(
            "BENCH_ALLOW_CPU", "0") != "1":
        _die("backend fell back to cpu — refusing to bench the host CPU "
             "(set BENCH_ALLOW_CPU=1 to override)")


def main():
    import jax
    import jax.numpy as jnp

    t_start = time.monotonic()
    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "330"))
    state = {"emitted": False, "result": None}

    def remaining():
        return budget - (time.monotonic() - t_start)

    def _watchdog():
        # hard deadline: budget + grace.  Anything still running past it
        # (a hung tunnel mid-arm) is abandoned; the already-printed JSON
        # lines ARE the result.  os._exit because a thread blocked inside
        # the tunnel's C connect wedges normal interpreter teardown.
        time.sleep(budget + 45.0)
        if state["emitted"]:
            sys.stdout.flush()
            os._exit(0)
        print(json.dumps({
            "metric": "images_per_sec", "value": 0.0, "unit": "img/s",
            "vs_baseline": 0.0,
            "error": "headline arm did not complete within "
                     f"BENCH_TIME_BUDGET_S={budget:.0f}s + 45s grace",
        }))
        sys.stdout.flush()
        os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    _ensure_backend()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    img = int(os.environ.get("BENCH_IMG", "640"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    variant = os.environ.get("BENCH_VARIANT", "yolov8n")
    quick = os.environ.get("BENCH_QUICK", "0") == "1"

    extra = {}
    skipped = []

    def persist(result):
        # builder-side evidence copy, written ATOMICALLY (tmp + os.replace)
        # so the watchdog's os._exit can never leave a truncated file —
        # the reader always sees either the previous or the new complete
        # record (ADVICE r4 item 1)
        try:
            ev_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "evidence")
            os.makedirs(ev_dir, exist_ok=True)
            tmp = os.path.join(ev_dir, ".bench_last.json.tmp")
            with open(tmp, "w") as f:
                f.write(json.dumps(result, indent=2) + "\n")
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(ev_dir, "bench_last.json"))
        except OSError:
            pass

    def snapshot(headline):
        return {
            "metric": f"{variant}_mcaq_e2e_infer_640_images_per_sec_per_chip",
            "value": round(headline, 2),
            "unit": "images/sec",
            "vs_baseline": round(headline / PAPER_FPS_BASELINE, 3),
            "extra": dict(extra, skipped_arms=list(skipped),
                          wall_s=round(time.monotonic() - t_start, 1)),
        }

    def emit(headline):
        result = snapshot(headline)
        print(json.dumps(result))
        sys.stdout.flush()
        state["emitted"] = True
        state["result"] = result
        # persist on EVERY emit: the watchdog exits via os._exit, so an
        # end-of-main write would be lost whenever a slow extra arm (cold
        # yolov8m train compile) outlives the budget
        persist(result)

    # ---- HEADLINE FIRST (VERDICT r3 item 1) -----------------------------
    # the best-known deployable config: bs=256 e2e, half-res morphology
    # estimator (quality-certified: delta mAP@50-95 -0.0001 on a
    # spatially-varying 640px checkpoint, PARITY.md), pool=256 NMS
    hb = int(os.environ.get("BENCH_HEADLINE_BATCH", "256"))
    try:
        headline = _infer_imgs_per_sec(variant, hb, img, max(4, iters // 4),
                                       dtype, e2e=True, morph_ds=2)
    except BaseException as e:  # noqa: BLE001 — the contract is: a JSON
        # line ALWAYS lands on stdout.  The watchdog covers hangs; this
        # covers exceptions (tunnel refusal, OOM, missing backend) — the
        # other half of the round-3 rc=124/no-output failure space.
        print(json.dumps({
            "metric": "images_per_sec", "value": 0.0, "unit": "img/s",
            "vs_baseline": 0.0,
            "error": f"headline arm raised {type(e).__name__}: {e}",
        }))
        sys.stdout.flush()
        os._exit(2)
    e2e_sweep = {f"bs{hb}_ds2": round(headline, 1)}
    extra["e2e_decode_nms_sweep_imgs_per_sec"] = e2e_sweep
    # the headline is PINNED to this certified deployable config; other
    # sweep configs are reported in the sweep dict but never promoted to
    # the headline value (ADVICE r4 item 3: the metric name and the value
    # must describe the same config)
    extra["headline_config"] = f"bs{hb}_ds2"
    emit(headline)
    if quick:
        return state["result"]

    # ---- extra arms, budget-gated, cheapest-information-first -----------
    # each closure returns an updated headline (or None to keep it)
    def arm_e2e(b, ds):
        v = _infer_imgs_per_sec(variant, b, img, max(4, iters // 4), dtype,
                                e2e=True, morph_ds=ds)
        e2e_sweep[f"bs{b}_ds{ds}"] = round(v, 1)
        return None  # sweep-only: headline stays pinned to headline_config

    def arm_fwd(b, ds):
        v = _infer_imgs_per_sec(variant, b, img, max(4, iters // 4), dtype,
                                morph_ds=ds)
        extra.setdefault("fwd_only_imgs_per_sec", {})[f"bs{b}_ds{ds}"] = \
            round(v, 1)
        gflops = GFLOPS_640.get(variant)
        if gflops and img == 640:
            extra["fwd_mfu_pct_bf16_peak"] = round(
                v * gflops / 1e3 / V5E_BF16_PEAK_TFLOPS * 100, 2)
            extra["e2e_mfu_pct_bf16_peak"] = round(
                headline * gflops / 1e3 / V5E_BF16_PEAK_TFLOPS * 100, 2)
        return None

    def arm_pallas():
        extra["infer_pallas_backend_imgs_per_sec"] = round(
            _infer_imgs_per_sec(variant, 32, img, max(4, iters // 2),
                                dtype, backend="pallas"), 1)
        return None

    def arm_train():
        # >=10 timed steps: at ~170 ms/step the arm costs ~2 s warm, and
        # 4-5-step samples showed +/-5% run-to-run spread (168-190 img/s
        # for the same program across this round's runs)
        extra["train_yolov8m_bs32_imgs_per_sec_per_chip"] = round(
            _train_imgs_per_sec("yolov8m", 32, img, max(10, iters // 2)), 1)
        return None

    def arm_torch_cpu():
        extra["torch_cpu_fallback_imgs_per_sec"] = round(
            _torch_cpu_fallback_imgs_per_sec(img=img), 3)
        if extra["torch_cpu_fallback_imgs_per_sec"] > 0:
            extra["vs_torch_cpu_fallback"] = round(
                headline / extra["torch_cpu_fallback_imgs_per_sec"], 1)
        return None

    # (name, est seconds WARM-cache, fn) — est guards the budget gate; a
    # cold compile overshoots but the watchdog bounds the damage and the
    # persistent .jax_cache makes driver runs warm in practice
    arms = [
        ("e2e_bs128_ds2", 40, lambda: arm_e2e(128, 2)),
        ("e2e_bs256_ds1", 40, lambda: arm_e2e(256, 1)),
        ("fwd_bs256_ds2", 40, lambda: arm_fwd(256, 2)),
        ("torch_cpu_fallback", 45, arm_torch_cpu),
        ("pallas_bs32", 35, arm_pallas),
        ("train_yolov8m_bs32", 60, arm_train),
    ]
    for name, est, fn in arms:
        if remaining() < est + 20:
            skipped.append(name)
            continue
        # mark the arm in-flight in the persisted snapshot BEFORE running
        # it, so a watchdog-abandoned arm is distinguishable from a
        # never-attempted one in the evidence (ADVICE r4 item 2)
        extra["in_flight_arm"] = name
        persist(snapshot(headline))
        try:
            new_headline = fn()
        except Exception as e:  # an arm must never kill the record
            extra.setdefault("arm_errors", {})[name] = repr(e)[:200]
            extra.pop("in_flight_arm", None)
            continue
        extra.pop("in_flight_arm", None)
        if new_headline is not None:
            headline = new_headline
        emit(headline)

    emit(headline)
    return state["result"]


def _stall_class(last_line: str) -> bool:
    """True when the failure is the tunnel-session stall/admission class
    (retryable after a cool-down) rather than a genuine benchmark error."""
    return ("did not complete" in last_line) or ("unreachable" in last_line)


def _main_with_retry():
    """Run the bench in a CHILD process and retry ONCE after a cool-down on
    the tunnel-stall failure class.  Measured pathology (PARITY.md
    "Device-resident data pipeline" / memory notes): a process whose first
    device RPC lands shortly after the previous tunnel holder exited can
    stall forever; the child's watchdog turns that into a bounded exit 2,
    and a ~3 min gap reliably clears the condition.  The child's stdout is
    re-printed verbatim and immediately, so a driver that kills this
    wrapper mid-retry still sees attempt 1's complete JSON lines — the
    retry can only improve the final line, never lose it."""
    import subprocess

    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "330"))
    env = dict(os.environ, BENCH_CHILD="1")
    # BENCH_SELF: test seam — lets the wrapper's retry/streaming logic be
    # exercised against a scripted child without touching the device
    child = os.environ.get("BENCH_SELF", os.path.abspath(__file__))
    for attempt in (1, 2):
        proc = subprocess.Popen(
            [sys.executable, "-u", child],
            env=env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
        )
        # stream the child's lines LIVE — a driver that kills this wrapper
        # mid-run must still see everything the child printed so far.  The
        # child self-terminates via its watchdog at budget+45 s; the timer
        # is a backstop (readline blocks, so an inline deadline check
        # could starve).
        killer = threading.Timer(budget + 120.0, proc.kill)
        killer.daemon = True
        killer.start()
        lines = []
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            if line.strip():
                lines.append(line.strip())
        rc = proc.wait()
        killer.cancel()
        last_line = lines[-1] if lines else ""
        if rc == 0 or attempt == 2 or not (
                _stall_class(last_line) or not lines):
            sys.exit(rc)
        time.sleep(float(os.environ.get("BENCH_RETRY_COOLDOWN_S", "200")))
    sys.exit(2)


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD", "0") == "1":
        main()
    else:
        _main_with_retry()
