"""Model export: StableHLO (the TPU-native analogue of ONNX export).

Parity with /root/reference/tools/convert_torch2onnx.py /
convert_torch2jit.py: serializes a jitted forward to portable StableHLO
MLIR plus a numerical parity check against the eager forward — the
deployable artifact for XLA-based serving runtimes (the reference exports
ONNX + TorchScript; StableHLO is the XLA ecosystem's interchange format).

Usage:
  python tools/convert_jax2stablehlo.py --work-dir <exp> \
      --save-path model.stablehlo.mlir [--input-size 224]
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(description="export model to StableHLO")
    parser.add_argument("--work-dir", type=str, required=True)
    parser.add_argument("--save-path", type=str, required=True)
    parser.add_argument("--batch-size", type=int, default=1)
    return parser.parse_args()


def export_stablehlo(model, params, variables, input_shape, save_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    def forward(x):
        return model.apply({"params": params, **variables}, x, train=False)

    dummy = jnp.zeros(input_shape, jnp.float32)
    lowered = jax.jit(forward).lower(dummy)
    mlir = lowered.as_text(dialect="stablehlo")
    with open(save_path, "w") as f:
        f.write(mlir)

    # numerical parity check: compiled vs eager on random input
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*input_shape).astype(np.float32))
    compiled = lowered.compile()
    out_compiled = compiled(x)
    out_eager = forward(x)
    err = float(jnp.max(jnp.abs(
        jnp.asarray(out_compiled) - jnp.asarray(out_eager))))
    return err


def main():
    args = parse_args()
    import jax

    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained, init_model)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "test_config")
    s = getattr(config, "input_image_size", 224)
    hw = (s, s) if isinstance(s, int) else tuple(s)
    shape = (args.batch_size, hw[0], hw[1], 3)
    params, variables = init_model(config.model, (2, hw[0], hw[1], 3),
                                   jax.random.PRNGKey(0))
    params = apply_pretrained(config.model, params)
    err = export_stablehlo(config.model, params, variables, shape,
                           args.save_path)
    print(f"exported {args.save_path}; compiled-vs-eager max err {err:.2e}")


if __name__ == "__main__":
    main()
