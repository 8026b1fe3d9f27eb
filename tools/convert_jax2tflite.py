"""Model export: TF SavedModel / TFLite via jax2tf.

Second deployable-artifact path beside tools/convert_jax2stablehlo.py
(parity with the reference's tools/convert_torch2onnx.py — ONNX's role of
"take the model to a non-torch serving stack" maps to SavedModel/TFLite in
the XLA ecosystem). Includes the same numerical parity check the
reference's ONNX exporter performs with onnxruntime.

Usage:
  python tools/convert_jax2tflite.py --work-dir <exp> \
      --save-path model.tflite [--saved-model-dir dir] [--batch-size 1]
"""

import argparse
import os
import sys

BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(BASE_DIR)


def parse_args():
    parser = argparse.ArgumentParser(
        description="export model to TFLite / SavedModel")
    parser.add_argument("--work-dir", type=str, required=True)
    parser.add_argument("--save-path", type=str, required=True)
    parser.add_argument("--saved-model-dir", type=str, default="")
    parser.add_argument("--batch-size", type=int, default=1)
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import numpy as np

    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except ImportError:
        print("tensorflow / jax2tf not available in this environment; "
              "use tools/convert_jax2stablehlo.py instead.")
        return

    from simpleaicv_pytorch_training_examples_tpu.engine import (
        apply_pretrained, init_model)
    from simpleaicv_pytorch_training_examples_tpu.utils import (
        load_config_from_work_dir)

    config = load_config_from_work_dir(args.work_dir, "test_config")
    model = config.model
    s = getattr(config, "input_image_size", 224)
    h, w = (s, s) if isinstance(s, int) else tuple(s)
    params, variables = init_model(model, (1, h, w, 3),
                                   jax.random.PRNGKey(0))
    params = apply_pretrained(model, params)

    def forward(images):
        return model.apply({"params": params, **variables}, images,
                           train=False)

    b = args.batch_size
    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False),
        input_signature=[tf.TensorSpec((b, h, w, 3), tf.float32)],
        autograph=False)

    x = np.random.RandomState(0).rand(b, h, w, 3).astype(np.float32)
    ref = np.asarray(forward(x))
    got = tf_fn(tf.constant(x)).numpy()
    err = float(np.abs(ref - got).max())
    print(f"jax vs tf parity max err: {err:.2e}")
    assert err < 1e-3, "jax2tf conversion diverged"

    if args.saved_model_dir:
        module = tf.Module()
        module.f = tf_fn
        tf.saved_model.save(module, args.saved_model_dir)
        print(f"saved SavedModel to {args.saved_model_dir}")

    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()])
    converter.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    tflite_model = converter.convert()
    with open(args.save_path, "wb") as f:
        f.write(tflite_model)
    print(f"saved TFLite model to {args.save_path} "
          f"({len(tflite_model) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
