"""Host input-pipeline benchmark (VERDICT r3 next #4): can the loader
feed the chip?

Builds a synthetic on-disk JPEG shard shaped like ImageNet train files
(default 500x375, quality 85, folder-per-class), then measures:

  decode     raw native libjpeg decode throughput (data/native_jpeg.py),
             1 thread and N threads;
  loader     the full production path — ILSVRC2012Dataset + the ViT
             train transforms (RandomResizedCrop / flip / RandAugment /
             normalize / erasing) + ClassificationCollater through
             data/loader.py's threaded prefetch DataLoader — in img/s;
  e2e        (--e2e, needs the TPU) a ViT-B/16 bs256 train step consuming
             loader batches: steady-state img/s through the WHOLE stack.

The numbers scale with host cores: the per-sample work (libjpeg, cv2,
PIL) releases the GIL, so img/s ~ cores x per-core rate. This sandbox
exposes ONE core (`nproc`=1) while real v5e hosts expose 100+; the bench
therefore also reports per-core rate so the device-demand comparison
(ViT-B train needs ~1,230 img/s) can be made for a production host.

Usage: python tools/perf/loader_bench.py [--n 4096] [--e2e]
Import surface for bench.py: build_shard(), bench_decode(), bench_loader().
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

SHARD_DIR = "/tmp/saicv_loader_bench"


def build_shard(n=4096, classes=64, hw=(375, 500), quality=85,
                root=SHARD_DIR):
    """Synthetic ImageNet-like JPEG shard; returns the dataset root."""
    import cv2
    train = os.path.join(root, "train")
    marker = os.path.join(root, f"done_{n}_{hw[0]}x{hw[1]}")
    if os.path.exists(marker):
        return root
    rs = np.random.RandomState(0)
    # low-frequency content so files land near real-photo sizes (~40 KB)
    base = rs.rand(hw[0] // 8, hw[1] // 8, 3).astype(np.float32)
    base = cv2.resize(base, (hw[1], hw[0]))
    for i in range(n):
        cls = f"n{i % classes:08d}"
        os.makedirs(os.path.join(train, cls), exist_ok=True)
        jitter = rs.rand(hw[0] // 16, hw[1] // 16, 3).astype(np.float32)
        img = np.clip(base * 0.7 + cv2.resize(jitter,
                                              (hw[1], hw[0])) * 0.3, 0, 1)
        cv2.imwrite(os.path.join(train, cls, f"img_{i:06d}.JPEG"),
                    (img * 255).astype(np.uint8),
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
    open(marker, "w").close()
    return root


def _dataset(root, input_size=224):
    from simpleaicv_pytorch_training_examples_tpu.classification.auto_rand_augment import (
        RandAugment)
    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        Opencv2PIL, RandomErasing, TorchMeanStdNormalize,
        TorchRandomHorizontalFlip, TorchRandomResizedCrop)
    from simpleaicv_pytorch_training_examples_tpu.classification.datasets.ilsvrc2012dataset import (
        ILSVRC2012Dataset)
    from simpleaicv_pytorch_training_examples_tpu.data import Compose
    return ILSVRC2012Dataset(
        root_dir=root, set_name="train",
        transform=Compose([
            Opencv2PIL(),
            TorchRandomResizedCrop(resize=input_size),
            TorchRandomHorizontalFlip(prob=0.5),
            RandAugment(N=2, M=9),
            TorchMeanStdNormalize(mean=[0.485, 0.456, 0.406],
                                  std=[0.229, 0.224, 0.225]),
            RandomErasing(prob=0.25),
        ]))


def bench_decode(root, n=512, threads=8):
    """(img/s 1-thread, img/s n-threads) for the native JPEG decode."""
    from simpleaicv_pytorch_training_examples_tpu.data.native_jpeg import (
        decode_jpeg_batch)
    paths = []
    train = os.path.join(root, "train")
    for cls in sorted(os.listdir(train)):
        for f in sorted(os.listdir(os.path.join(train, cls))):
            paths.append(os.path.join(train, cls, f))
        if len(paths) >= n:
            break
    blobs = [open(p, "rb").read() for p in paths[:n]]
    out = []
    for nt in (1, threads):
        # best-of-3: the first full-batch pass pays one-time costs (page
        # cache, allocator arenas) and this microVM sees bursty CPU steal;
        # steady-state capability is the tracked quantity
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            imgs = decode_jpeg_batch(blobs, max_side=0, n_threads=nt)
            dt = time.perf_counter() - t0
            assert all(im is not None for im in imgs)
            best = max(best, len(blobs) / dt)
        out.append(best)
    return tuple(out)


def bench_loader(root, batch_size=256, num_workers=8, batches=8,
                 input_size=224):
    """img/s through dataset+transforms+collater+threaded prefetch."""
    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        ClassificationCollater)
    from simpleaicv_pytorch_training_examples_tpu.data.loader import (
        DataLoader)
    ds = _dataset(root, input_size)
    loader = DataLoader(ds, batch_size, ClassificationCollater(),
                        shuffle=True, num_workers=num_workers)

    def batches_forever():
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            yield from loader
            epoch += 1

    it = batches_forever()
    next(it)  # warm the thread pool + page cache
    # best-of-3 windows: steady-state capability, robust to microVM CPU
    # steal bursts (observed 2x swings on otherwise-identical windows)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        n = 0
        for _ in range(batches):
            n += next(it)["image"].shape[0]
        best = max(best, n / (time.perf_counter() - t0))
    return best


def bench_e2e(root, batch_size=256, steps=6):
    """ViT-B/16 train step fed by the loader (TPU): steady img/s."""
    import jax
    import jax.numpy as jnp

    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones, losses)
    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        ClassificationCollater)
    from simpleaicv_pytorch_training_examples_tpu.data.loader import (
        DataLoader)
    from simpleaicv_pytorch_training_examples_tpu.engine import (
        TrainState, init_model, make_train_step)
    from simpleaicv_pytorch_training_examples_tpu.utils.optimizers import (
        build_optimizer)

    model = backbones.vit_base_patch16(num_classes=1000,
                                       dtype=jnp.bfloat16,
                                       softmax_dtype=jnp.bfloat16,
                                       use_fused_attention=True)
    params, variables = init_model(model, (2, 224, 224, 3),
                                   jax.random.PRNGKey(0))

    class cfg:
        optimizer = ("AdamW", {"lr": 1e-3, "global_weight_decay": False,
                               "weight_decay": 0.05,
                               "no_weight_decay_layer_name_list": []})
        scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 0.0})
        epochs = 100

    tx, _ = build_optimizer(cfg, params, steps_per_epoch=100)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       variables=variables, opt_state=tx.init(params),
                       ema_params=None)
    train_step = make_train_step(model, losses.CELoss(), tx,
                                 compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(1)

    ds = _dataset(root)
    loader = DataLoader(ds, batch_size, ClassificationCollater(),
                        shuffle=True, num_workers=8)

    def batches_forever():
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            yield from loader
            epoch += 1

    it = batches_forever()
    batch = next(it)
    jb = {"image": jnp.asarray(batch["image"]),
          "label": jnp.asarray(batch["label"])}
    state, metrics = train_step(state, jb, rng)  # compile
    float(metrics["loss"])
    t0 = time.perf_counter()
    n = 0
    for _ in range(steps):
        batch = next(it)
        jb = {"image": jnp.asarray(batch["image"]),
              "label": jnp.asarray(batch["label"])}
        state, metrics = train_step(state, jb, rng)
        n += batch["image"].shape[0]
    float(metrics["loss"])
    return n / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--e2e", action="store_true")
    args = p.parse_args()
    cores = os.cpu_count()
    root = build_shard(n=args.n)
    print(f"shard: {args.n} jpegs at {root} (host cores: {cores})",
          flush=True)
    d1, dn = bench_decode(root)
    print(f"native decode: {d1:.0f} img/s 1-thread, {dn:.0f} img/s "
          f"8-thread", flush=True)
    lips = bench_loader(root)
    print(f"loader (decode+transforms+collate, 8 workers): {lips:.0f} "
          f"img/s  (~{lips / max(cores, 1):.0f} img/s/core)", flush=True)
    if args.e2e:
        eips = bench_e2e(root)
        print(f"e2e ViT-B train through loader: {eips:.0f} img/s "
              f"(device-only demand ~1,230 img/s)", flush=True)


if __name__ == "__main__":
    main()
