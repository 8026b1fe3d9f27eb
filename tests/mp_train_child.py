"""Child process for tests/test_multiprocess_rendezvous.py: run a tiny
dp-N training through the production runner (engine/runner.py), either as
one process of a multi-process `jax.distributed` rendezvous (the
reference's torchrun --nnodes/--node_rank capability,
/root/reference/13.interactive_segmentation_training/13.0.encoder_distill_training/dinov3_vit_large_encoder_distill_to_dinov3_vit_small/train.sh:18-40)
or single-process with N virtual CPU devices (the parity baseline).

Prints `FINAL_METRIC <float>` (the epoch avg-loss metric, psum'd so it is
identical on every process) — the parent asserts cross-run parity.
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--port", type=int, default=29541)
    p.add_argument("--devices", type=int, default=2,
                   help="total devices across all processes")
    p.add_argument("--work-dir", required=True)
    args = p.parse_args()

    # force the CPU platform BEFORE backend init (the image sitecustomize
    # pins JAX_PLATFORMS=axon); each process exposes devices/num_processes
    # virtual CPU devices
    local_devices = args.devices // args.num_processes
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
    if args.num_processes > 1:
        # exercised path: engine/runner.py::run_training ->
        # parallel.mesh::distributed_init reads these
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
        os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
        os.environ["JAX_PROCESS_ID"] = str(args.process_id)
    else:
        os.environ.pop("JAX_COORDINATOR_ADDRESS", None)

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    from simpleaicv_pytorch_training_examples_tpu.classification import (
        backbones, losses)
    from simpleaicv_pytorch_training_examples_tpu.classification.common import (
        ClassificationCollater)
    from simpleaicv_pytorch_training_examples_tpu.engine.runner import (
        run_training)

    class SynthDS:
        """Deterministic-by-index samples: identical global content no
        matter which process loads which slice."""

        def __init__(self, n=48, num_classes=4, size=32):
            self.n, self.num_classes, self.size = n, num_classes, size

        def __len__(self):
            return self.n

        def __getitem__(self, idx):
            rs = np.random.RandomState(1000 + idx)
            label = idx % self.num_classes
            img = (rs.randn(self.size, self.size, 3).astype(np.float32)
                   * 0.1 + label / self.num_classes)
            return {"image": img, "label": label}

    class config:
        seed = 0
        batch_size = 16
        epochs = 1
        model = backbones.resnet18cifar(num_classes=4)
        train_criterion = losses.CELoss()
        train_dataset = SynthDS()
        train_collater = ClassificationCollater()
        test_dataset = None
        input_image_size = 32
        optimizer = ("SGD", {"lr": 0.1, "momentum": 0.9,
                             "global_weight_decay": False,
                             "weight_decay": 5e-4,
                             "no_weight_decay_layer_name_list": []})
        scheduler = ("MultiStepLR", {"warm_up_epochs": 0, "gamma": 0.2,
                                     "milestones": [60]})
        use_amp = False
        num_workers = 2
        print_interval = 1

    best_metric, _ = run_training(config, args.work_dir)
    assert os.path.exists(os.path.join(args.work_dir, "checkpoints",
                                       "latest")), "latest ckpt missing"
    print(f"FINAL_METRIC {best_metric:.8f}", flush=True)


if __name__ == "__main__":
    main()
