"""Device-trace the SAM-B full train step (round-4 headline config:
bs4, flash kernels, NO block remat) and dump an xplane for
analyze_xplane.py — the attribution behind the MFU push.

Usage: python tools/perf/sam_trace.py [--bs 4] [--out /tmp/trace_sam]
then: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/perf/analyze_xplane.py /tmp/trace_sam/**/*.xplane.pb
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

from lab import warmup  # noqa: E402  (same dir)
from sam_lab import build  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--out", default="/tmp/trace_sam")
    args = p.parse_args()

    warmup()
    import jax

    model, criterion, variables, images, gt, prompts = build(
        bs=args.bs, use_flash=True, remat=False)

    @jax.jit
    def step(v, x):
        def f(v):
            m, i = model.apply(v, x, prompts)
            return sum(criterion(([m], [i]), gt).values())
        return jax.value_and_grad(f)(v)

    loss, grads = step(variables, images)
    float(loss)  # compile + first run
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            loss, grads = step(variables, images)
        float(loss)
    files = glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                      recursive=True)
    print("trace:", files, flush=True)


if __name__ == "__main__":
    main()
