"""Experiment runner CLI — the replacement for the reference's notebooks
(SURVEY.md C33: each notebook's cell-0 "main" wired datasets, weights,
model, loss, AdamW, accumulation and called start()/start_prompt()).

Usage:
  python -m image_segmentation_tpu.run --config unet_noaug \
      --data-root /data/pet --save-dir runs/ [--epochs N] [--batch-size N]
  python -m image_segmentation_tpu.run --config clipunet --synthetic 32
      # smoke run on synthetic data (no dataset required)

Data layout ({root}/{split}/{color,label}/, class-id PNG labels with the
255 boundary sentinel — the reference's Train/color + Train/label layout
from the augmentation notebook).
"""
from __future__ import annotations

import argparse
import os
import sys


def _synthetic_items(n: int, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        h = int(rng.integers(120, 260))
        w = int(rng.integers(120, 260))
        img = rng.uniform(0, 0.3, (h, w, 3)).astype(np.float32)
        label = np.zeros((h, w), np.int32)
        cls = 1 + (i % 2)
        label[h // 4 : 3 * h // 4, w // 2 :] = cls
        img[h // 4 : 3 * h // 4, w // 2 :, cls - 1] += 0.6
        label[:, w // 2 - 1 : w // 2 + 1] = 255
        items.append((img, label))
    return items


def synthetic_materialized(n: int, target_size: int, seed: int = 0,
                           keep_orig_labels: bool = False):
    """Synthetic items, boundary-remapped and materialised — the shared
    helper for benchmarks (bench.py --fit, benchmarks/robustness.py) and
    smoke drivers."""
    from image_segmentation_tpu.data.dataset import ArrayDataset
    from image_segmentation_tpu.data.labels import target_remap
    from image_segmentation_tpu.data.loader import materialize

    items = [
        (img, target_remap(lab)) for img, lab in _synthetic_items(n, seed)
    ]
    return materialize(ArrayDataset(items), target_size,
                       keep_orig_labels=keep_orig_labels)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--data-root", default=None)
    p.add_argument("--save-dir", default="runs")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic images instead of real data")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--target-size", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--tensorboard", default=None, metavar="DIR",
                   help="write per-epoch TensorBoard scalars to "
                        "DIR/<config-name> (needs tensorboardX)")
    p.add_argument("--nan-checks", action="store_true")
    p.add_argument("--pretrained-encoder", default=None,
                   help="recon AE checkpoint for encoder transfer")
    p.add_argument("--clip-weights", default=None,
                   help="converted CLIP ViT params (.npz)")
    p.add_argument("--clipunet-checkpoint", default=None,
                   help="trained ClipUNet checkpoint for the prompt model")
    p.add_argument("--init-weights", default=None,
                   help="initialize params (+ BN stats) from a "
                        "weights-only artifact — e.g. a reference torch "
                        "checkpoint converted by "
                        "scripts/convert_unet_weights.py — then train "
                        "(fine-tune) from there")
    p.add_argument("--smoke-vit", action="store_true",
                   help="tiny ViT matched to --target-size (smoke tests "
                        "of the clip/prompt wiring without the 86M encoder)")
    p.add_argument("--max-devices", type=int, default=0,
                   help="cap the data-parallel device count (0 = all). "
                        "Use 1 to force single-device, e.g. on fake-CPU "
                        "meshes where XLA's in-process all-reduce hits "
                        "its 40 s rendezvous deadline on large models")
    p.add_argument("--augment", default=None, choices=["on", "off"],
                   help="override the config's augmentation flag (the "
                        "reference ran each model with and without "
                        "augmentation — README rows 'Augmented'/'No Aug')")
    p.add_argument("--offline-aug", action="store_true",
                   help="with augmentation on: materialise the augmented "
                        "dataset offline (reference utils/augmentation."
                        "ipynb C29) instead of online device augmentation")
    p.add_argument("--lr-schedule", default=None,
                   choices=["constant", "cosine"],
                   help="LR schedule (default: the config's, usually "
                        "constant — the reference always ran "
                        "scheduler=None); cosine = linear warmup over "
                        "--warmup-steps then cosine decay to 0")
    p.add_argument("--warmup-steps", type=int, default=None)
    p.add_argument("--early-stop-patience", type=int, default=None,
                   metavar="N",
                   help="stop when val mIoU has not improved for N "
                        "epochs (best-mIoU checkpointing unchanged — "
                        "same best artifact as the reference's fixed "
                        "100-epoch schedule without paying for the "
                        "plateau)")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="'_last' preemption-checkpoint cadence in epochs "
                        "(best-metric epochs always checkpoint); raise "
                        "when the state is large relative to the device "
                        "link so saves don't pace training")
    p.add_argument("--eval-protocol", default="device",
                   choices=["device", "host"],
                   help="original-resolution eval implementation: 'device' "
                        "(static-canvas inverse + confusion on device, fast) "
                        "or 'host' (float64 per-image host path, the "
                        "exactness reference)")
    p.add_argument("--cache-features", action="store_true",
                   help="frozen-CLIP optimisation: precompute encoder "
                        "features once, train only the decoder (identical "
                        "trajectory; incompatible with online augmentation)")
    p.add_argument("--evaluate", default=None, metavar="CKPT",
                   help="evaluate a trained checkpoint (full checkpoint "
                        "dir or weights-only MO_ artifact) on --split "
                        "instead of training — the reference notebooks' "
                        "final test-set eval (eval_loop on the Test "
                        "dataloader, original-resolution protocol)")
    p.add_argument("--split", default="Test",
                   help="data split for --evaluate (Train/Val/Test; "
                        "default Test). With --synthetic, 'Val' is the "
                        "same synthetic set fit() validated on; anything "
                        "else is a held-out synthetic set")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                        "repeat runs of the same program skip their "
                        "first-compile (20-40 s on TPU) entirely")
    p.add_argument("--platform", default=None,
                   help="force the JAX platform (e.g. 'cpu') before "
                        "backend init — env-var selection alone is "
                        "overridden by some platform plugins")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process training: bring up the process "
                        "group and run train.multihost_loop.fit_multihost "
                        "over the global mesh. Launch one identical "
                        "invocation per host; on TPU pods the coordinator "
                        "autodetects from the environment, elsewhere pass "
                        "--coordinator/--num-processes/--process-id")
    p.add_argument("--coordinator", default=None,
                   help="multihost coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=0)
    p.add_argument("--process-id", type=int, default=-1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        from image_segmentation_tpu.utils import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)
    if args.multihost:
        from image_segmentation_tpu.parallel.multihost import (
            initialize_multihost,
        )

        if args.coordinator:
            initialize_multihost(args.coordinator, args.num_processes,
                                 args.process_id)
        else:
            jax.distributed.initialize()  # TPU-pod environment autodetect
        print(f"[run] multihost: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} global devices")

    from image_segmentation_tpu import config as C
    from image_segmentation_tpu.data.dataset import ArrayDataset, SegmentationDataset
    from image_segmentation_tpu.data.labels import target_remap
    from image_segmentation_tpu.data.loader import materialize
    from image_segmentation_tpu.data.augment import generate_augmented_dataset
    from image_segmentation_tpu.data.prompts import generate_prompt_dataset
    from image_segmentation_tpu.losses.host import (
        dice_ce_loss_np,
        dice_nll_loss_np,
    )
    from image_segmentation_tpu.parallel.mesh import get_mesh
    from image_segmentation_tpu.train import create_train_state
    from image_segmentation_tpu.train import checkpoint as ckpt
    from image_segmentation_tpu.train.loop import fit
    from image_segmentation_tpu.train.state import subtree_mask
    from image_segmentation_tpu.utils import enable_nan_checks, trace_context

    if args.config not in C.CONFIGS:
        sys.exit(f"unknown config {args.config!r}; have {sorted(C.CONFIGS)}")
    cfg = C.CONFIGS[args.config]
    overrides = {}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.target_size is not None:
        overrides["target_size"] = args.target_size
    if args.lr_schedule is not None:
        overrides["lr_schedule"] = args.lr_schedule
    if args.warmup_steps is not None:
        overrides["warmup_steps"] = args.warmup_steps
    if args.augment is not None:
        overrides["augment"] = args.augment == "on"
    if args.offline_aug:
        overrides["augment_online"] = False
    cfg = C.override(cfg, **overrides)

    if args.nan_checks:
        enable_nan_checks()

    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"[run] config={cfg.name} platform={jax.devices()[0].platform} "
          f"devices={jax.device_count()}")

    # ---- data ----
    eval_only = args.evaluate is not None
    if jax.process_count() > 1 and (eval_only or cfg.model == "recon"):
        # both paths are single-controller (host device_puts /
        # fit_reconstruction uploads assume fully-addressable arrays)
        raise SystemExit(
            "[run] --evaluate and recon configs are single-process; "
            "drop --multihost (multi-process covers the fit pipelines)"
        )
    if args.synthetic:
        n_val = max(4, args.synthetic // 4)
        if eval_only:
            # 'Val' reproduces the set fit() validated on (so evaluate on
            # the best checkpoint must reproduce best-val metrics); any
            # other split name is a held-out synthetic test set
            seed = cfg.seed + (1 if args.split == "Val" else 2)
            train_raw = None
            val_raw = ArrayDataset(_synthetic_items(n_val, seed=seed))
        else:
            train_raw = ArrayDataset(
                _synthetic_items(args.synthetic, seed=cfg.seed)
            )
            val_raw = ArrayDataset(_synthetic_items(n_val, seed=cfg.seed + 1))
    else:
        if not args.data_root:
            sys.exit("--data-root or --synthetic required")
        mk = lambda split: SegmentationDataset(
            os.path.join(args.data_root, split, "color"),
            os.path.join(args.data_root, split, "label"),
        )
        if eval_only:
            train_raw, val_raw = None, mk(args.split)
        else:
            train_raw, val_raw = mk("Train"), mk("Val")

    if cfg.augment and not cfg.augment_online and not eval_only:
        print("[run] materialising offline augmentation …")
        train_raw = generate_augmented_dataset(train_raw, seed=cfg.seed,
                                               size=cfg.target_size)

    def remap_ds(ds):
        # File-backed datasets keep the remap as a target_transform so
        # materialize() can take the native C++ decode+staging fast path
        # (data/native_pipeline.py); in-memory datasets remap eagerly —
        # IN PLACE for ArrayDatasets (a full-scale offline-augmented set
        # is ~23k samples; a remapped copy doubles host memory, and
        # going through __getitem__ would also dequantize U8ArrayDataset
        # images back to float storage).
        if isinstance(ds, SegmentationDataset):
            ds.target_transform = target_remap
            return ds
        if isinstance(ds, ArrayDataset):
            return ds.map_labels(target_remap)
        return ArrayDataset(
            [(ds[i][0], target_remap(np.asarray(ds[i][1]))) for i in range(len(ds))]
        )

    if cfg.model == "prompt":
        if not eval_only:
            train_raw = generate_prompt_dataset(train_raw, seed=cfg.seed)
        val_raw = generate_prompt_dataset(val_raw, seed=cfg.seed + 1)
    else:
        if not eval_only:
            train_raw = remap_ds(train_raw)
        val_raw = remap_ds(val_raw)

    n_train = 0 if eval_only else len(train_raw)
    print(f"[run] materialising {n_train} train / {len(val_raw)} "
          f"{'eval' if eval_only else 'val'} items at {cfg.target_size}px …")
    if not eval_only:
        train_data = materialize(train_raw, cfg.target_size)
    val_data = materialize(val_raw, cfg.target_size, keep_orig_labels=True)

    # ---- stage-1 reconstruction pretraining (autoencoder.ipynb cell 0) ----
    if cfg.model == "recon":
        from image_segmentation_tpu.train.loop import fit_reconstruction
        from image_segmentation_tpu.train.state import make_adamw
        from image_segmentation_tpu.train import create_train_state

        model = C.build_model(cfg, on_tpu=on_tpu)
        # reference stage 1 uses Adam (no weight decay), lr 1e-3
        tx = make_adamw(learning_rate=cfg.learning_rate, weight_decay=0.0)
        state = create_train_state(
            model, jax.random.PRNGKey(cfg.seed),
            jnp.zeros((1, cfg.target_size, cfg.target_size, 3)), tx,
        )
        originals = [np.asarray(val_raw[i][0]) for i in range(len(val_raw))]
        if eval_only:
            from image_segmentation_tpu.train.loop import (
                evaluate_reconstruction,
            )

            loaded = ckpt.load_variables_only(args.evaluate)
            state = state.replace(
                params=loaded["params"],
                batch_stats=loaded.get("batch_stats", state.batch_stats),
            )
            print(f"[run] evaluating {args.evaluate} on {args.split} "
                  f"({len(val_raw)} images) …")
            mse = evaluate_reconstruction(
                state, val_data, originals=originals,
                batch_size=cfg.batch_size,
            )
            print(f"[run] {args.split} eval: mse={mse:.6f}")
            return {"loss": mse}
        accum = max(1, min(cfg.accum_steps, len(train_data) // cfg.batch_size))
        tb = _make_tb_logger(args, cfg)
        try:
            result = fit_reconstruction(
                state, train_data, val_data,
                originals=originals,
                epochs=cfg.epochs,
                batch_size=cfg.batch_size * accum,
                accum_steps=accum,
                save_dir=args.save_dir,
                name=cfg.name,
                resume=args.resume,
                seed=cfg.seed,
                metrics_logger=tb,
            )
        finally:
            if tb is not None:
                tb.close()
        print(f"[run] done: best {result.best}")
        return result

    # ---- model / loss / optimizer ----
    if args.smoke_vit and cfg.model in ("clipunet", "clipunet_noskips", "prompt"):
        from image_segmentation_tpu.models.clip_unet import (
            ClipUNet,
            ClipUNetNoSkips,
        )
        from image_segmentation_tpu.models.clip_vit import ClipViTConfig
        from image_segmentation_tpu.models.prompt import PromptModel

        vit = ClipViTConfig(
            image_size=cfg.target_size, patch_size=16, hidden_size=64,
            num_layers=4, num_heads=4, mlp_dim=128,
        )
        # enough up-blocks to climb from the ViT grid back to target_size
        import math

        n_up = int(math.log2(16))  # patch 16 -> 4 doublings
        chans = tuple(max(8, 64 >> i) for i in range(n_up + 1))
        common = dict(num_classes=cfg.num_classes, vit=vit)
        if cfg.model == "clipunet":
            model = ClipUNet(skip_indices=(1, 2, 3, 4),
                             decoder_channels=chans, **common)
        elif cfg.model == "clipunet_noskips":
            model = ClipUNetNoSkips(decoder_channels=chans, **common)
        else:
            model = PromptModel(
                freeze_clip=cfg.freeze_encoder, vit=vit,
                skip_indices=(1, 2, 3, 4), decoder_channels=chans,
                unet_base=8,
            )
    else:
        model = C.build_model(cfg, on_tpu=on_tpu)
    loss_fn = C.build_loss(cfg)

    # The reference evaluates with a SEPARATE val loss: ignore_index =
    # EVAL_IGNORE_INDEX (3) and the default smooth (notebooks cell 0:
    # val_loss_fn = WeightedDice*Loss(ignore_index=EVAL_IGNORE_INDEX, ...)).
    import dataclasses as _dc2

    val_loss_fn = _dc2.replace(
        loss_fn, ignore_index=cfg.eval_ignore_index, smooth_dice=1e-5
    )
    if cfg.model == "prompt":
        host_loss = lambda lg, lb: dice_nll_loss_np(lg, lb, val_loss_fn)
    else:
        host_loss = lambda lg, lb: dice_ce_loss_np(lg, lb, val_loss_fn)

    def _init_variables():
        sample = [jnp.zeros((1, cfg.target_size, cfg.target_size, 3))]
        if cfg.model == "prompt":
            sample.append(jnp.zeros((1, cfg.target_size, cfg.target_size, 1)))
        return model.init(jax.random.PRNGKey(cfg.seed), *sample, train=False)

    if eval_only:
        # --evaluate: the reference notebooks' final test-set eval
        # (eval_loop on the Test dataloader at original resolution,
        # e.g. unet.ipynb last cell) — no training, no optimizer. The
        # checkpoint supplies params (+ BN stats: MO_ artifacts and full
        # checkpoints both carry them); random init runs only as the
        # fallback for pre-batch_stats artifacts.
        from image_segmentation_tpu.train.loop import evaluate
        from image_segmentation_tpu.train.state import TrainState as TS

        loaded = ckpt.load_variables_only(args.evaluate)
        batch_stats = loaded.get("batch_stats")
        if batch_stats is None:
            print("[run] note: artifact has no batch_stats; BN runs with "
                  "init statistics")
            batch_stats = _init_variables().get("batch_stats", {})
        state = TS(
            step=0,
            params=loaded["params"],
            batch_stats=batch_stats,
            opt_state=None,
            apply_fn=model.apply,
            tx=None,
        )
        print(f"[run] evaluating {args.evaluate} on {args.split} "
              f"({len(val_raw)} images, protocol={args.eval_protocol}) …")
        if args.eval_protocol == "device":
            # multi-device platforms score distributed: batch rows
            # sharded along 'data' (train/fast_eval.py pre-batched path)
            n_dev = min(args.max_devices or jax.device_count(),
                        jax.device_count())
            eval_mesh = None
            if n_dev > 1:
                from image_segmentation_tpu.parallel.mesh import replicate

                eval_mesh = get_mesh(jax.devices()[:n_dev])
                state = replicate(state, eval_mesh)
            res = evaluate(
                state, val_data, num_classes=cfg.num_classes,
                eval_ignore_index=cfg.eval_ignore_index,
                batch_size=cfg.batch_size, protocol="device",
                loss_cfg=val_loss_fn, mesh=eval_mesh,
            )
        else:
            res = evaluate(
                state, val_data, host_loss_fn=host_loss,
                num_classes=cfg.num_classes,
                eval_ignore_index=cfg.eval_ignore_index,
                batch_size=cfg.batch_size, protocol="host",
            )
        print(f"[run] {args.split} eval: loss={res['loss']:.4f} "
              f"acc={res['acc']:.4f} dice={res['dice']:.4f} "
              f"miou={res['iou']:.4f}")
        return res

    variables = _init_variables()

    params = variables["params"]
    if args.init_weights:
        from image_segmentation_tpu.train.checkpoint import (
            load_variables_only,
        )

        loaded = load_variables_only(args.init_weights)
        params = loaded["params"]
        if "batch_stats" in loaded:
            variables = {**variables, "batch_stats": loaded["batch_stats"]}
        print(f"[run] initialized weights from {args.init_weights}")
    if cfg.model == "autoencoder" and args.pretrained_encoder:
        v2 = ckpt.load_subtree_variables(
            args.pretrained_encoder, {**variables, "params": params},
            src_prefix="encoder", dst_prefix="encoder",
        )
        params = v2["params"]
        if "batch_stats" in v2:
            variables = {**variables, "batch_stats": v2["batch_stats"]}
        print("[run] loaded pretrained AE encoder (params + BN stats)")
    if cfg.model in ("clipunet", "clipunet_noskips", "prompt") and args.clip_weights:
        from image_segmentation_tpu.models.clip_vit import load_pretrained_clip_params

        clip_params = load_pretrained_clip_params(cache_path=args.clip_weights)
        dst = "clip/encoder" if cfg.model == "prompt" else "encoder"
        import flax

        flat = flax.traverse_util.flatten_dict(params, sep="/")
        cflat = flax.traverse_util.flatten_dict(clip_params, sep="/")
        for k, v in cflat.items():
            flat[f"{dst}/{k}"] = jnp.asarray(v)
        params = flax.traverse_util.unflatten_dict(flat, sep="/")
        print("[run] loaded pretrained CLIP ViT weights")
    if cfg.model == "prompt" and args.clipunet_checkpoint:
        v2 = ckpt.load_subtree_variables(
            args.clipunet_checkpoint, {**variables, "params": params},
            src_prefix="", dst_prefix="clip",
        )
        params = v2["params"]
        if "batch_stats" in v2:
            variables = {**variables, "batch_stats": v2["batch_stats"]}
        print("[run] injected trained ClipUNet into the prompt model "
              "(params + BN stats)")

    frozen = []
    if cfg.model == "autoencoder" and cfg.freeze_encoder and args.pretrained_encoder:
        frozen.append("encoder")
    if cfg.model in ("clipunet", "clipunet_noskips") and cfg.freeze_encoder:
        # stop_gradient zeroes the grads but AdamW weight decay would still
        # shrink the pretrained ViT every step — mask it out of the optimizer
        frozen.append("encoder")
    if cfg.model == "prompt" and cfg.freeze_encoder:
        frozen.append("clip")
    if cfg.model == "prompt" and not cfg.freeze_encoder:
        # fine-tuned variant: the clip DECODER + mask U-Net train, but
        # the inner ViT stays frozen (reference clip/clipunet.py:28-30
        # default, never unfrozen) — mask it so AdamW weight decay
        # can't shrink the stop-gradient'ed encoder
        frozen.append("clip/encoder")
    mask = subtree_mask(params, tuple(frozen)) if frozen else None
    # decay horizon in optimizer steps (one per effective batch)
    total_steps = cfg.epochs * max(
        1, len(train_data) // (cfg.batch_size * cfg.accum_steps)
    )
    tx = C.build_optimizer(cfg, trainable_mask=mask, total_steps=total_steps)

    from image_segmentation_tpu.train.state import TrainState

    state = TrainState(
        step=0,
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )

    mesh = None  # built below once the step batch size is known

    augment_fn = None
    if cfg.augment and cfg.augment_online and cfg.model != "prompt":
        from image_segmentation_tpu.ops.augment import random_augment_batch

        augment_fn = random_augment_batch
        print("[run] online on-device augmentation enabled")

    eval_state_fn = None
    if args.cache_features and jax.process_count() > 1:
        # refuse BEFORE the expensive feature precompute below
        raise SystemExit(
            "[run] not supported with --multihost: --cache-features"
        )
    if (
        args.cache_features
        and cfg.model == "clipunet"
        and cfg.freeze_encoder
        and augment_fn is None
    ):
        import dataclasses as _dc

        from image_segmentation_tpu.models.clip_unet import ClipUNetDecoderOnly
        from image_segmentation_tpu.train import feature_cache as FC
        from image_segmentation_tpu.train.state import TrainState as TS

        vit_cfg = model.vit
        skips = tuple(sorted(model.skip_indices))
        print("[run] caching frozen-CLIP features for the train set …")
        feats = FC.encode_clip_features(
            params["encoder"], train_data.images, vit_cfg,
            skip_indices=skips, batch_size=cfg.batch_size,
            dtype=model.dtype, use_pallas=model.use_pallas_attention,
            verbose=True,
        )
        encoder_params = params["encoder"]
        full_model = model
        dec_model = ClipUNetDecoderOnly(
            num_classes=cfg.num_classes,
            decoder_channels=tuple(model.decoder_channels),
            num_skips=len(skips),
            dtype=model.dtype,
        )
        params = FC.decoder_params_from_clipunet(params)
        model = dec_model
        train_data = _dc.replace(train_data, images=feats)
        tx = C.build_optimizer(cfg, trainable_mask=None,
                               total_steps=total_steps)
        # rebuild the training state around the decoder-only model
        state = TS(
            step=0,
            params=params,
            batch_stats=state.batch_stats,
            opt_state=tx.init(params),
            apply_fn=model.apply,
            tx=tx,
        )

        def eval_state_fn(state):
            return TS(
                step=state.step,
                params=FC.clipunet_params_from_decoder(
                    state.params, encoder_params
                ),
                batch_stats=state.batch_stats,
                opt_state=None,
                apply_fn=full_model.apply,
                tx=state.tx,
            )

        print("[run] training decoder-only on cached features")

    # fit() takes the TOTAL per-step batch (the reference's effective batch
    # of 64, utils/training.py:49-56) and splits it into accum_steps
    # microbatches of cfg.batch_size inside the jitted step. Clamp for tiny
    # datasets so at least one full step exists per epoch.
    micro = min(cfg.batch_size, len(train_data))
    if micro < cfg.batch_size:
        print(f"[run] dataset smaller than batch size; using batch {micro}")
    accum = max(1, min(cfg.accum_steps, len(train_data) // micro))
    step_batch = micro * accum
    device_cap = args.max_devices or jax.device_count()
    if min(jax.device_count(), device_cap) > 1 and jax.process_count() == 1:
        # single-controller DP mesh; multi-process runs build their own
        # global mesh inside fit_multihost (branch below)
        # shard over the largest device count that divides the MICRObatch
        # (not the accumulated step batch): the step body reshapes the
        # sharded batch into accum microbatches of `micro`, so a mesh
        # that only divides micro*accum forces GSPMD resharding on every
        # scan step
        n_dev = max(
            k
            for k in range(1, min(jax.device_count(), device_cap) + 1)
            if micro % k == 0
        )
        if n_dev > 1:
            mesh = get_mesh(jax.devices()[:n_dev])
            print(f"[run] data-parallel over {n_dev} devices")
        else:
            print("[run] microbatch not divisible by any device count; "
                  "running single-device")
    if jax.process_count() > 1:
        # Multi-process training: the collective fit_multihost loop
        # (train/multihost_loop.py). Same batch schedule and eval
        # protocol as fit(); single-controller-only features are
        # refused loudly rather than silently skipped.
        from image_segmentation_tpu.train.multihost_loop import fit_multihost

        blockers = []
        if eval_state_fn is not None:
            blockers.append("--cache-features")
        if args.eval_protocol != "device":
            blockers.append("--eval-protocol host")
        if blockers:
            raise SystemExit(
                "[run] not supported with --multihost: "
                + "; ".join(blockers)
            )
        tb = _make_tb_logger(args, cfg) if jax.process_index() == 0 else None
        try:
            with trace_context(args.profile_dir
                               if jax.process_index() == 0 else None):
                result = fit_multihost(
                    state,
                    train_data,
                    val_data,
                    loss_fn=loss_fn,
                    epochs=cfg.epochs,
                    batch_size=step_batch,
                    accum_steps=accum,
                    save_dir=args.save_dir,
                    name=cfg.name,
                    num_classes=cfg.num_classes,
                    eval_ignore_index=cfg.eval_ignore_index,
                    eval_batch_size=cfg.batch_size,
                    eval_loss_cfg=val_loss_fn,
                    seed=cfg.seed,
                    resume=args.resume,
                    augment_fn=augment_fn,
                    metrics_logger=tb,
                    checkpoint_every=args.ckpt_every,
                )
        finally:
            if tb is not None:
                tb.close()
        if jax.process_index() == 0:
            print(f"[run] done: best {result.best}")
        return result

    tb = _make_tb_logger(args, cfg)
    try:
        with trace_context(args.profile_dir):
            result = fit(
                state,
                train_data,
                val_data,
                loss_fn=loss_fn,
                epochs=cfg.epochs,
                batch_size=step_batch,
                accum_steps=accum,
                save_dir=args.save_dir,
                name=cfg.name,
                host_loss_fn=host_loss,
                num_classes=cfg.num_classes,
                eval_ignore_index=cfg.eval_ignore_index,
                eval_batch_size=cfg.batch_size,
                mesh=mesh,
                resume=args.resume,
                seed=cfg.seed,
                augment_fn=augment_fn,
                eval_state_fn=eval_state_fn,
                eval_protocol=args.eval_protocol,
                eval_loss_cfg=val_loss_fn,
                checkpoint_every=args.ckpt_every,
                metrics_logger=tb,
                early_stop_patience=args.early_stop_patience,
            )
    finally:
        if tb is not None:
            tb.close()
    print(f"[run] done: best {result.best}")
    return result


def _make_tb_logger(args, cfg):
    """--tensorboard DIR -> TensorBoardLogger(DIR/<config-name>), None
    when the flag is absent."""
    if not getattr(args, "tensorboard", None):
        return None
    import os

    from image_segmentation_tpu.utils.tb import TensorBoardLogger

    return TensorBoardLogger(os.path.join(args.tensorboard, cfg.name))


if __name__ == "__main__":
    main()
