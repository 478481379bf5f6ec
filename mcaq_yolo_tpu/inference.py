"""
Predictor + `mcaq-yolo-infer` CLI (reference inference.py, TPU-native).

Loads a trained checkpoint, letterboxes inputs to the model size, runs the
jitted MCAQ forward (temperature 1.0, quantization active — the deployed
configuration), decodes with DFL + fixed-shape NMS, and inverts the
letterbox.  Returns the reference's result contract
(reference inference.py:276-295): detections, inference_time_ms, avg_bits,
and the P3-scale complexity/bit maps.
"""

from __future__ import annotations

import argparse
import json
import time
import warnings
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.dataset import IMG_EXTS, letterbox, unletterbox_boxes
from .models import MCAQYOLO
from .models.yolo import decode_and_nms


def auto_pre_topk(max_det: int, conf_threshold: float = 0.25) -> int:
    """Serving NMS candidate-pool size: the greedy core's cost is linear
    in the pool (evidence/r3/nms_breakdown_bs256.json: 15.2/8.3/5.2 ms at
    1024/512/256, bs=256), and the pool only has to cover the ABOVE-GATE
    candidate set — not max_det: gated candidates are what fill it, and a
    trained model passes 23/image max at the deployed conf=0.25 gate and
    146/image max even at the eval conf=0.001 gate
    (evidence/r3/pretopk_equivalence.json, bitwise-identical detections at
    pools 512 and 1024).  So: the equivalence-certified minimum of 256
    (two 128-lane suppression blocks, >=10x deployed headroom) for
    deployed gates, 512 (>=3.5x headroom) for low-confidence eval gates.
    The headroom contract is asserted at RUNTIME: `decode_and_nms(...,
    with_pool_stats=True)` reports the per-image gated count and
    `Predictor.predict*` warns loudly if it ever saturates the pool."""
    del max_det  # output slots are padded; gate count is what fills a pool
    return 256 if conf_threshold >= 0.25 else 512


class Predictor:
    """Single-image / batch MCAQ-YOLO inference."""

    def __init__(
        self,
        model_path: str,
        num_classes: int = 80,
        variant: str = "yolov8n",
        img_size: Optional[int] = None,
        conf_threshold: float = 0.25,
        iou_threshold: float = 0.45,
        max_det: int = 1000,
        pre_topk: Optional[int] = None,
        class_names: Optional[Dict[int, str]] = None,
        bit_mapping: str = "mlp",
        grid_size: int = 8,
        warmup: bool = True,
        data_parallel: bool = False,
        min_bits: Optional[int] = None,
        max_bits: Optional[int] = None,
        monotone_param: Optional[str] = None,
        normalize_complexity: Optional[bool] = None,
        morph_downsample: Optional[int] = None,
        morph_tile_engine: Optional[str] = None,
    ):
        # EVERY model-defining training-config key must be mirrored here,
        # or the deployed model silently diverges from the trained one
        # (e.g. a softplus-monotone or bits-capped checkpoint restored into
        # an abs/2..8 template produces wrong bit maps with no error).
        # Meta (written by Trainer.save_checkpoint) fills them; explicit
        # kwargs win over meta (None = auto) so deploy-time levers like
        # morph_downsample stay overridable.
        meta = {}
        meta_path = Path(str(model_path) + ".json")
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            variant = meta.get("variant", variant)
            num_classes = int(meta.get("num_classes", num_classes))
            qcfg = meta.get("config", {}).get("quantization", {})
            bit_mapping = qcfg.get("bit_mapping", bit_mapping)
            grid_size = int(qcfg.get("grid_size", grid_size))
        # deploy-time resolution override: an EXPLICIT img_size kwarg wins
        # (YOLO deploys at other resolutions than it trained at); None =
        # the checkpoint's trained resolution, falling back to 640
        if img_size is None:
            img_size = int(meta.get("img_size", 640))
        qcfg = meta.get("config", {}).get("quantization", {})
        morph = meta.get("config", {}).get("morphology", {})

        def auto(explicit, meta_val, default, cast):
            if explicit is not None:
                return cast(explicit)
            return cast(meta_val) if meta_val is not None else default

        min_bits = auto(min_bits, qcfg.get("min_bits"), 2, int)
        max_bits = auto(max_bits, qcfg.get("max_bits"), 8, int)
        target_bits = float(qcfg.get("target_bits", 4.0))
        # meta-less checkpoints predate the r4 softplus default and were
        # trained with the |W|-projected mapper, so the LOAD-time fallback
        # stays 'abs' (new checkpoints always carry the key in meta).
        monotone_param = auto(
            monotone_param, qcfg.get("monotone_param"), "abs", str)
        normalize_complexity = auto(
            normalize_complexity, qcfg.get("normalize_complexity"),
            False, bool)
        morph_downsample = auto(
            morph_downsample, morph.get("downsample"), 1, int)
        morph_tile_engine = auto(
            morph_tile_engine, morph.get("tile_engine"), "lanes", str)
        # budget-controller trim (train.py save_checkpoint meta): a model
        # trained under bit_scale=s deploys its bit maps at temperature s;
        # 1.0 for controller-off and legacy checkpoints
        self.deploy_temperature = float(meta.get("deploy_temperature", 1.0))

        self.img_size = img_size
        self.num_classes = num_classes
        self.conf_threshold = conf_threshold
        self.iou_threshold = iou_threshold
        self.max_det = max_det
        self.pre_topk = (int(pre_topk) if pre_topk is not None
                         else auto_pre_topk(max_det, conf_threshold))
        self.pool_saturations = 0  # headroom-contract violations seen
        self.class_names = class_names or meta.get("names") or {
            i: f"class{i}" for i in range(num_classes)
        }

        self.model = MCAQYOLO(
            variant=variant, num_classes=num_classes,
            bit_mapping=bit_mapping, grid_size=grid_size,
            min_bits=min_bits, max_bits=max_bits, target_bits=target_bits,
            monotone_param=monotone_param,
            normalize_complexity=normalize_complexity,
            morph_downsample=morph_downsample,
            morph_tile_engine=morph_tile_engine,
        )
        self.variables = self._load_model(model_path)

        self._predict_jit = jax.jit(self._predict_device)
        # Opt-in multi-chip serving: batch split along the 'data' mesh axis,
        # weights replicated — the same DP recipe as training
        # (parallel/mesh.py), applied to the deployed forward+decode+NMS
        # program.  Single-image predict() stays on the unsharded program;
        # predict_batch() rounds its chunk size up to a mesh multiple.
        self.mesh = None
        if data_parallel and len(jax.devices()) > 1:
            from .parallel.mesh import (
                batch_sharding,
                make_mesh,
                replicate,
                replicate_sharding,
            )

            self.mesh = make_mesh()
            self.variables = replicate(self.mesh, self.variables)
            self._predict_jit_dp = jax.jit(
                self._predict_device,
                in_shardings=(replicate_sharding(self.mesh),
                              batch_sharding(self.mesh)),
            )
        if warmup:
            self._warmup()

    # ------------------------------------------------------------------

    def _load_model(self, model_path: str):
        """Checkpoint load with template-relaxation fallback
        (the JAX analogue of the reference's strict -> strict=False fallback,
        inference.py:101-116): keys absent from the checkpoint keep their
        freshly initialized values, with a warning."""
        dummy = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(0), dummy, training=False)
        # structure-free restore (checkpoints carry optimizer state the
        # predictor cannot template), then a tolerant overlay: keys absent
        # from the checkpoint keep their initialized values with a warning —
        # the JAX analogue of the reference's strict -> strict=False
        # fallback (reference inference.py:101-116).
        from .utils.model_utils import tolerant_restore

        return tolerant_restore(variables, model_path)

    def _warmup(self, iters: int = 3):
        # uint8 input: preprocess() ships uint8 batches, so warming with
        # float32 would compile a program predict() never runs and the
        # first real image would pay the full XLA compile.
        x = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.uint8)
        for _ in range(iters):
            jax.block_until_ready(self._predict_jit(self.variables, x))
        if self.mesh is not None:
            # warm the data-parallel program at its minimum batch (one per
            # device); other predict_batch sizes still compile on first use.
            n_dev = self.mesh.devices.size
            xd = jnp.zeros(
                (n_dev, self.img_size, self.img_size, 3), jnp.uint8)
            jax.block_until_ready(self._predict_jit_dp(self.variables, xd))

    # ------------------------------------------------------------------

    def _predict_device(self, variables, images):
        """Jitted device program: forward + decode + NMS."""
        raw, aux = self.model.apply(
            variables, images, temperature=self.deploy_temperature,
            quantize=True, training=False
        )
        *det, gated_count = decode_and_nms(
            raw, self.num_classes,
            conf_threshold=self.conf_threshold,
            iou_threshold=self.iou_threshold,
            max_det=self.max_det,
            pre_topk=self.pre_topk,
            with_pool_stats=True,
        )
        return tuple(det) + (aux["avg_bits"], aux["complexity_map"][0],
                             aux["bit_map"][0], gated_count)

    def _check_pool_headroom(self, gated_count) -> None:
        """Runtime side of the auto_pre_topk headroom contract: the pool is
        sized to the MEASURED above-gate candidate count, so saturating it
        means equivalence to a full-pool NMS is no longer certified.

        Every saturation is surfaced (simplefilter('always') — Python's
        default 'default' filter would print only the first occurrence per
        call site, hiding repeat violations across a long predict_batch
        run) and counted in `self.pool_saturations` so callers can check
        the contract programmatically after a batch run."""
        worst = int(np.max(gated_count))
        if worst >= self.pre_topk:
            self.pool_saturations += 1
            with warnings.catch_warnings():
                warnings.simplefilter("always", RuntimeWarning)
                warnings.warn(
                    f"NMS candidate pool saturated ({self.pool_saturations}"
                    f" time(s) this Predictor): {worst} above-gate "
                    f"candidates hit pre_topk={self.pre_topk}; detections "
                    "may have been cut before suppression. Re-run with a "
                    "larger pre_topk (e.g. 1024) for this data "
                    "distribution.",
                    RuntimeWarning, stacklevel=3,
                )

    def preprocess(self, image: np.ndarray):
        """Letterbox, keeping uint8 — /255 runs on-device (model-side
        normalize guard), so host->device transfer is 4x smaller."""
        lb, scale, pad = letterbox(image, self.img_size)
        return np.ascontiguousarray(lb, np.uint8), scale, pad

    def predict(self, image: np.ndarray, visualize: bool = False,
                output_dir: Optional[str] = None) -> Dict:
        """image: HxWx3 uint8 RGB.  Returns the reference result contract."""
        orig_hw = image.shape[:2]
        img, scale, pad = self.preprocess(image)

        t0 = time.perf_counter()
        out = self._predict_jit(self.variables, jnp.asarray(img[None]))
        # time around the host fetch, not block_until_ready: the latter is a
        # no-op on some tunneled platforms (see bench.py) and the fetched
        # outputs are small (max_det boxes + tile maps)
        (boxes, scores, classes, valid, avg_bits, cmap, bmap,
         gated_count) = jax.device_get(out)
        dt_ms = (time.perf_counter() - t0) * 1000.0
        self._check_pool_headroom(gated_count)

        v = valid[0].astype(bool)
        det_boxes = unletterbox_boxes(boxes[0][v], scale, pad, orig_hw)
        detections = [
            {
                "bbox": det_boxes[i].tolist(),
                "confidence": float(scores[0][v][i]),
                "class_id": int(classes[0][v][i]),
                "class_name": self.class_names.get(
                    int(classes[0][v][i]), str(int(classes[0][v][i]))
                ),
            }
            for i in range(int(v.sum()))
        ]
        results = {
            "detections": detections,
            "inference_time_ms": dt_ms,
            "avg_bits": float(avg_bits),
            "complexity_map": np.asarray(cmap[0]),
            "bit_map": np.asarray(bmap[0]),
        }
        if visualize and output_dir:
            from .utils import visualization as viz

            Path(output_dir).mkdir(parents=True, exist_ok=True)
            viz.visualize_complexity_map(
                image, results["complexity_map"],
                str(Path(output_dir) / "complexity.png"),
            )
            viz.visualize_bit_allocation(
                image, results["bit_map"], str(Path(output_dir) / "bits.png")
            )
        return results

    def predict_batch(
        self, images: Sequence, batch_size: int = 16
    ) -> List[Dict]:
        """Directory/batch mode (reference inference.py:383-455) as TRUE
        batched forwards: images are letterboxed host-side, stacked into
        fixed-size chunks (the ragged tail is padded by repeating the last
        image, so the jit sees ONE batch shape and compiles once), and the
        whole forward + decode + NMS runs on-device per chunk.

        Elements may be decoded HxWx3 uint8 arrays OR file paths: paths are
        decoded lazily per chunk, so a 10k-image directory holds O(batch)
        images in host RAM, not O(dataset)."""
        n = len(images)
        if n == 0:
            return []
        batch_size = min(batch_size, n)
        predict_jit = self._predict_jit
        if self.mesh is not None:
            # round the compiled chunk shape up to a mesh multiple so the
            # leading axis splits evenly across the 'data' axis (the tail
            # pad below then covers ragged chunks too)
            n_dev = self.mesh.devices.size
            batch_size = -(-batch_size // n_dev) * n_dev
            predict_jit = self._predict_jit_dp

        results: List[Dict] = []
        for i in range(0, n, batch_size):
            raw = [
                im if isinstance(im, np.ndarray) else _read_image_rgb(str(im))
                for im in images[i:i + batch_size]
            ]
            chunk = [self.preprocess(im) for im in raw]
            k = len(chunk)
            stack = np.stack([c[0] for c in chunk])
            if k < batch_size:  # pad tail to the compiled shape
                stack = np.concatenate(
                    [stack, np.repeat(stack[-1:], batch_size - k, axis=0)]
                )
            t0 = time.perf_counter()
            out = predict_jit(self.variables, jnp.asarray(stack))
            (boxes, scores, classes, valid, avg_bits, cmap, bmap,
             gated_count) = jax.device_get(out)
            dt_ms = (time.perf_counter() - t0) * 1000.0 / k
            self._check_pool_headroom(gated_count[:k])

            for j in range(k):
                _, scale, pad = chunk[j]
                orig_hw = raw[j].shape[:2]
                v = valid[j].astype(bool)
                det_boxes = unletterbox_boxes(boxes[j][v], scale, pad, orig_hw)
                results.append({
                    "detections": [
                        {
                            "bbox": det_boxes[m].tolist(),
                            "confidence": float(scores[j][v][m]),
                            "class_id": int(classes[j][v][m]),
                            "class_name": self.class_names.get(
                                int(classes[j][v][m]),
                                str(int(classes[j][v][m])),
                            ),
                        }
                        for m in range(int(v.sum()))
                    ],
                    "inference_time_ms": dt_ms,
                    "avg_bits": float(avg_bits),
                    "complexity_map": np.asarray(cmap[j]),
                    "bit_map": np.asarray(bmap[j]),
                })
        return results


# ---------------------------------------------------------------------------
# CLI (reference inference.py:458-563)
# ---------------------------------------------------------------------------


def _read_image_rgb(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise IOError(path)
        return img[..., ::-1].copy()
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


def main(argv=None):
    parser = argparse.ArgumentParser(description="MCAQ-YOLO-TPU inference")
    parser.add_argument("--model", required=True, help="checkpoint path (.ckpt)")
    parser.add_argument("--source", required=True, help="image file or directory")
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--iou", type=float, default=0.45)
    parser.add_argument("--max-det", type=int, default=1000)
    parser.add_argument("--pre-topk", type=int, default=None,
                        help="NMS candidate-pool size (default: auto from max-det)")
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--num-classes", type=int, default=80)
    parser.add_argument("--variant", default="yolov8n")
    parser.add_argument("--output", default=None, help="JSON dump path")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--output-dir", default="outputs/infer")
    args = parser.parse_args(argv)

    predictor = Predictor(
        args.model, num_classes=args.num_classes, variant=args.variant,
        img_size=args.img_size, conf_threshold=args.conf,
        iou_threshold=args.iou, max_det=args.max_det,
        pre_topk=args.pre_topk,
    )

    src = Path(args.source)
    if src.is_dir():
        files = sorted(
            str(p) for p in src.rglob("*") if p.suffix.lower() in IMG_EXTS
        )
        # pass paths: predict_batch decodes lazily per chunk (O(batch) RAM)
        batch_results = predictor.predict_batch(files)
        all_results = {}
        for f, r in zip(files, batch_results):
            all_results[f] = {
                "num_detections": len(r["detections"]),
                "inference_time_ms": r["inference_time_ms"],
                "avg_bits": r["avg_bits"],
            }
            print(f"{f}: {len(r['detections'])} dets, "
                  f"{r['inference_time_ms']:.1f} ms, {r['avg_bits']:.2f} bits")
        summary = {
            "num_images": len(files),
            "mean_time_ms": float(
                np.mean([r["inference_time_ms"] for r in all_results.values()])
            ) if all_results else 0.0,
            "results": all_results,
        }
        if args.output:
            Path(args.output).write_text(json.dumps(summary, indent=2))
        print(json.dumps({k: v for k, v in summary.items() if k != "results"}))
    else:
        r = predictor.predict(
            _read_image_rgb(str(src)), visualize=args.visualize,
            output_dir=args.output_dir,
        )
        dump = {
            "detections": r["detections"],
            "inference_time_ms": r["inference_time_ms"],
            "avg_bits": r["avg_bits"],
        }
        if args.output:
            Path(args.output).write_text(json.dumps(dump, indent=2))
        print(json.dumps(dump, indent=2))


if __name__ == "__main__":
    main()
