"""ImageNet training CLI — the production counterpart of eval_imagenet.py.

The reference's entire training story is one optax step inside a test
(reference tests/test_grads.py:32-66) plus the host-side torchvision
recipe in its Transfer_Learning tutorial (reference
docs/getting_started/Transfer_Learning.ipynb). This CLI composes the
framework's TPU-native pieces into a full training run:

- host threads decode JPEGs to uint8 canvases (data.ImageFolderLoader),
  batches ship as uint8 (3x less PCIe/DCN traffic than f32);
- RandomResizedCrop / flip / AutoAugment-family / mixup / cutmix run ON
  DEVICE inside the jitted step (ops.augment), so augmentation fuses
  with the forward and the host stays decode-only;
- mixed-precision bf16 compute with f32 master params and per-block
  rematerialization (parallel.train.make_train_step);
- dp x tp device mesh: batch sharded over 'data', Megatron-style
  qkv/mlp sharding over 'model' (parallel.mesh);
- EMA shadow params (parallel.ema, timm-style warmup), used for eval;
- orbax checkpoint/resume of (model, BN state, opt_state, EMA, step)
  with shardings preserved (weights.orbax_io);
- warmup-cosine schedule, decoupled weight decay masked off norm/bias
  leaves, label smoothing — the standard torchvision/timm recipe knobs.

Smoke-test (no dataset needed; also the pattern tests/test_train_cli.py
runs on the 8-device CPU mesh):

  python scripts/train_imagenet.py --model resnet18 --synthetic 8 \
      --batch-size 16 --canvas 80 --crop 64 --num-classes 10 --epochs 2

Real run:

  python scripts/train_imagenet.py --model resnet50 \
      --data-dir /data/imagenet/train --eval-dir /data/imagenet/val \
      --epochs 90 --batch-size 1024 --opt sgd --lr 0.4 --bf16 \
      --ckpt-dir /ckpt/r50 --resume
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--data-dir", default=None, help="ImageFolder train root")
    ap.add_argument("--eval-dir", default=None, help="ImageFolder val root")
    ap.add_argument("--synthetic", type=int, default=0, metavar="STEPS",
                    help="train on STEPS random uint8 batches per epoch "
                         "(no dataset needed; smoke tests / input-free perf)")
    ap.add_argument("--epochs", type=int, default=90)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--canvas", type=int, default=256,
                    help="host decode canvas side (uint8, pre-crop)")
    ap.add_argument("--crop", type=int, default=224)
    # optimization
    ap.add_argument("--opt", choices=["sgd", "adamw"], default="sgd")
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--weight-decay", type=float, default=2e-5)
    ap.add_argument("--warmup-epochs", type=float, default=5.0)
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 forward/backward, f32 master params")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the forward (larger batches)")
    ap.add_argument("--ema", type=float, default=0.0, metavar="DECAY",
                    help="EMA of params (e.g. 0.9999); eval uses the EMA")
    # augmentation (all on device)
    ap.add_argument("--aa", default=None,
                    choices=["autoaugment", "randaugment",
                             "trivialaugmentwide", "augmix"],
                    help="auto-augmentation policy after crop+flip")
    ap.add_argument("--mixup", type=float, default=0.0, metavar="ALPHA")
    ap.add_argument("--cutmix", type=float, default=0.0, metavar="ALPHA")
    # parallelism
    ap.add_argument("--mesh-model", type=int, default=1,
                    help="tensor-parallel axis size (devices = data*model)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize + "
                         "per-process data shards")
    # checkpointing / logging
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=0, metavar="STEPS",
                    help="also checkpoint every N steps (0: per epoch only)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    return ap


def synthetic_batches(steps, batch_size, side, num_classes, seed):
    """Deterministic random uint8 canvases + labels (no dataset)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    for _ in range(steps):
        x = rng.randint(0, 256, (batch_size, side, side, 3), np.uint8)
        y = rng.randint(0, num_classes, (batch_size,), np.int32)
        yield x, y


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if not (args.data_dir or args.synthetic):
        raise SystemExit("pass --data-dir or --synthetic STEPS")

    if args.distributed:
        from eqxvision_tpu.parallel.multihost import initialize

        initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eqxvision_tpu.core import tree_inference
    from eqxvision_tpu.models import create_model
    from eqxvision_tpu.ops import augment as aug
    from eqxvision_tpu.ops.preprocessing import imagenet_eval_pipeline
    from eqxvision_tpu.parallel import make_train_step, make_eval_step
    from eqxvision_tpu.parallel.ema import ema_init, ema_params, ema_update
    from eqxvision_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_params_tp

    mesh = make_mesh(model=args.mesh_model)
    is_main = jax.process_index() == 0

    def log(**kv):
        if is_main:
            print(json.dumps(kv), flush=True)

    # ---- data -------------------------------------------------------
    if args.synthetic:
        steps_per_epoch = args.synthetic

        def epoch_batches(epoch):
            return synthetic_batches(steps_per_epoch, args.batch_size,
                                     args.canvas, args.num_classes,
                                     args.seed + epoch)
    else:
        from eqxvision_tpu.data import ImageFolderLoader

        loader = ImageFolderLoader(
            args.data_dir, batch_size=args.batch_size, side=args.canvas,
            shuffle=True, seed=args.seed, num_workers=args.workers,
            process_shard=args.distributed,
        )
        steps_per_epoch = len(loader)

        def epoch_batches(epoch):
            loader.seed = args.seed + epoch  # fresh shuffle per epoch
            return iter(loader)

    total_steps = steps_per_epoch * args.epochs

    # ---- model / optimizer -----------------------------------------
    model, state = create_model(args.model, num_classes=args.num_classes)
    model = shard_params_tp(model, mesh)
    state = replicate(state, mesh)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr,
        warmup_steps=max(1, int(args.warmup_epochs * steps_per_epoch)),
        decay_steps=max(2, total_steps),
    )
    # decay only matrix/conv weights: norm scales and biases are 1-D
    # (the torchvision/timm "no weight decay on norm+bias" convention)
    decay_mask = jax.tree_util.tree_map(lambda p: hasattr(p, "ndim") and p.ndim > 1, model)
    if args.opt == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(args.weight_decay, mask=decay_mask),
            optax.sgd(schedule, momentum=0.9),
        )
    else:
        tx = optax.adamw(schedule, weight_decay=args.weight_decay, mask=decay_mask)
    opt_state = tx.init(jax.tree_util.tree_map(lambda p: p, model))
    opt_state = replicate(opt_state, mesh)

    ema = ema_init(model) if args.ema else None

    # ---- on-device augmentation (runs inside the jitted step) ------
    def augment_fn(key, x, y):
        k_pipe, k_mix, k_which = jax.random.split(key, 3)
        x = aug.imagenet_train_pipeline(
            k_pipe, x, size=args.crop, auto_augment_policy=args.aa)
        y = aug.smooth_labels(y, args.num_classes, args.label_smoothing)
        if args.mixup or args.cutmix:
            xs, ys = [], []
            if args.mixup:
                xm, ym = aug.mixup(k_mix, x, y, args.mixup)
                xs.append(xm), ys.append(ym)
            if args.cutmix:
                xc, yc = aug.cutmix(k_mix, x, y, args.cutmix)
                xs.append(xc), ys.append(yc)
            if len(xs) == 2:  # 50/50 switch, timm RandomChoice-style
                pick = jax.random.bernoulli(k_which)
                x = jnp.where(pick, xs[0], xs[1])
                y = jnp.where(pick, ys[0], ys[1])
            else:
                x, y = xs[0], ys[0]
        return x, y

    step = make_train_step(
        tx,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        remat=args.remat,
        augment_fn=augment_fn,
    )
    jit_ema_update = jax.jit(ema_update) if args.ema else None

    # ---- checkpoint / resume ---------------------------------------
    # one orbax tree: (model, BN state, (opt_state, ema)); a JSON
    # sidecar records the step so resume re-enters mid-schedule.
    start_step = 0
    if args.ckpt_dir:
        from eqxvision_tpu.weights.orbax_io import load_checkpoint, save_checkpoint

        latest = os.path.join(args.ckpt_dir, "latest.json")
        if args.resume and os.path.exists(latest):
            with open(latest) as f:
                meta = json.load(f)
            path = os.path.join(args.ckpt_dir, f"step_{meta['step']}")
            model, state, (opt_state, ema) = load_checkpoint(
                path, model, state, (opt_state, ema))
            start_step = int(meta["step"])
            log(event="resume", step=start_step, path=path)

        def checkpoint(step_no):
            if not is_main:
                return
            path = os.path.join(args.ckpt_dir, f"step_{step_no}")
            save_checkpoint(path, model, state, (opt_state, ema))
            with open(latest, "w") as f:
                json.dump({"step": step_no}, f)
            log(event="checkpoint", step=step_no, path=path)
    else:
        def checkpoint(step_no):
            pass

    # ---- eval -------------------------------------------------------
    eval_step = make_eval_step()

    def run_eval(epoch, step_no):
        if not args.eval_dir:
            return
        from eqxvision_tpu.data import ImageFolderLoader

        ev = ImageFolderLoader(args.eval_dir, batch_size=args.batch_size,
                               side=args.canvas, num_workers=args.workers,
                               process_shard=args.distributed)
        m = ema_params(ema, model) if args.ema else model
        m = tree_inference(m, True)
        c1 = c5 = n = 0
        for x_u8, y in ev:
            x = imagenet_eval_pipeline(shard_batch(jnp.asarray(x_u8), mesh),
                                       resize_size=args.canvas, crop_size=args.crop)
            t1, t5, bn = eval_step(m, state, x, shard_batch(jnp.asarray(y), mesh))
            c1, c5, n = c1 + int(t1), c5 + int(t5), n + int(bn)
        log(event="eval", epoch=epoch, step=step_no,
            top1=c1 / max(n, 1), top5=c5 / max(n, 1), n=n)

    # ---- train loop -------------------------------------------------
    key = jax.random.PRNGKey(args.seed)
    step_no = start_step
    start_epoch = start_step // steps_per_epoch
    log(event="start", model=args.model, devices=jax.device_count(),
        mesh=dict(data=mesh.shape["data"], model=mesh.shape["model"]),
        steps_per_epoch=steps_per_epoch, total_steps=total_steps,
        start_step=start_step)
    for epoch in range(start_epoch, args.epochs):
        t_log = time.time()
        imgs_since = 0
        for x_u8, y in epoch_batches(epoch):
            if step_no >= (epoch + 1) * steps_per_epoch:
                # resume is step-accurate for the schedule/optimizer; a
                # mid-epoch resume consumes the epoch's remaining step
                # budget from the loader's start (sample order is not
                # replayed — same convention as timm's --resume)
                break
            key, k_step = jax.random.split(key)
            x = shard_batch(jnp.asarray(x_u8), mesh)
            yb = shard_batch(jnp.asarray(y), mesh)
            model, state, opt_state, loss = step(model, state, opt_state, x, yb, k_step)
            if args.ema:
                ema = jit_ema_update(ema, model, args.ema, jnp.asarray(step_no))
            step_no += 1
            imgs_since += args.batch_size
            if step_no % args.log_every == 0 or step_no == total_steps:
                loss_f = float(loss)  # blocks: one host sync per log interval
                dt = time.time() - t_log
                log(event="train", epoch=epoch, step=step_no, loss=loss_f,
                    lr=float(schedule(step_no)),
                    images_per_sec=round(imgs_since / max(dt, 1e-9), 1))
                t_log, imgs_since = time.time(), 0
                if not math.isfinite(loss_f):
                    raise SystemExit(f"non-finite loss at step {step_no}")
            if args.ckpt_every and step_no % args.ckpt_every == 0:
                checkpoint(step_no)
        checkpoint(step_no)
        run_eval(epoch, step_no)
    log(event="done", step=step_no)
    return step_no


if __name__ == "__main__":
    main()
